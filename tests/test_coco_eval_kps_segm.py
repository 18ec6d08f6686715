"""Keypoint-OKS and instance-mask AP oracles (data/coco_eval.py
additions — COCOEvaluator tasks "keypoints"/"segm",
detectron2 evaluation/coco_evaluation.py:69,89-152)."""
import numpy as np
import pytest

from spacecraft_pose_estimation_tpu.data import coco_eval as ce

pytestmark = pytest.mark.smoke


class TestOks:
    def test_perfect_match_is_one(self):
        rng = np.random.default_rng(0)
        J = 6
        kps = np.zeros((1, J, 3))
        kps[0, :, :2] = rng.uniform(10, 90, (J, 2))
        kps[0, :, 2] = 2.0
        gt_boxes = np.array([[10.0, 10.0, 80.0, 80.0]])
        oks = ce.compute_oks(kps, kps, np.array([6400.0]), gt_boxes, np.full(J, 0.05))
        np.testing.assert_allclose(oks, [[1.0]], atol=1e-12)

    def test_single_keypoint_formula(self):
        """OKS of one visible keypoint at distance d equals
        exp(-d^2 / (2 * area * sigma^2)) exactly."""
        J, sigma, area, d = 4, 0.07, 2500.0, 6.0
        gt = np.zeros((1, J, 3))
        gt[0, 0] = [50.0, 50.0, 2.0]  # only keypoint 0 labeled
        det = np.zeros((1, J, 3))
        det[0, 0] = [50.0 + d, 50.0, 0.9]
        det[0, 1:] = [500.0, 500.0, 0.1]  # ignored: vg == 0 there
        boxes = np.array([[0.0, 0.0, 50.0, 50.0]])
        oks = ce.compute_oks(det, gt, np.array([area]), boxes, np.full(J, sigma))
        var = (2 * sigma) ** 2
        expect = np.exp(-(d**2) / var / (area + np.spacing(1)) / 2)
        np.testing.assert_allclose(oks[0, 0], expect, rtol=1e-12)

    def test_unlabeled_gt_uses_box_fallback(self):
        """k1 == 0: distances measured to the 2x-expanded gt box; points
        inside it contribute exp(0)."""
        J = 3
        gt = np.zeros((1, J, 3))  # all vis 0
        det = np.zeros((1, J, 3))
        det[0, :, :2] = [55.0, 55.0]  # inside the expanded box
        boxes = np.array([[50.0, 50.0, 20.0, 20.0]])  # expanded: [30,90]
        oks = ce.compute_oks(det, gt, np.array([400.0]), boxes, np.full(J, 0.05))
        np.testing.assert_allclose(oks, [[1.0]], atol=1e-12)


class TestKeypointAP:
    def _scene(self, noise, rng, n=4, J=8):
        dets, gts = [], []
        for _ in range(n):
            kps = np.zeros((2, J, 3))
            kps[:, :, :2] = rng.uniform(40, 160, (2, J, 2))
            kps[:, :, 2] = 2.0
            boxes = np.stack([
                np.concatenate([kps[i, :, 0].min(None, keepdims=True) - 5,
                                kps[i, :, 1].min(None, keepdims=True) - 5,
                                [np.ptp(kps[i, :, 0]) + 10],
                                [np.ptp(kps[i, :, 1]) + 10]])
                for i in range(2)
            ])
            det_kps = kps.copy()
            det_kps[:, :, :2] += rng.normal(0, noise, (2, J, 2))
            det_kps[:, :, 2] = 0.9
            dets.append({"keypoints": det_kps, "scores": np.array([0.9, 0.8])})
            gts.append({"keypoints": kps, "boxes": boxes})
        return dets, gts

    def test_perfect_predictions_ap100(self):
        dets, gts = self._scene(0.0, np.random.default_rng(1))
        res = ce.evaluate_keypoints(dets, gts)
        assert res["AP"] == pytest.approx(100.0)
        assert res["AP50"] == pytest.approx(100.0)

    def test_noisy_worse_than_clean(self):
        rng = np.random.default_rng(2)
        clean = ce.evaluate_keypoints(*self._scene(0.0, rng))
        noisy = ce.evaluate_keypoints(*self._scene(12.0, np.random.default_rng(2)))
        assert noisy["AP"] < clean["AP"]

    def test_unlabeled_gts_ignored(self):
        """A gt with zero labeled keypoints must not count as a miss."""
        rng = np.random.default_rng(3)
        dets, gts = self._scene(0.0, rng, n=2)
        for gt in gts:
            empty = np.zeros((1, gt["keypoints"].shape[1], 3))
            gt["keypoints"] = np.concatenate([gt["keypoints"], empty])
            gt["boxes"] = np.concatenate([gt["boxes"], [[0.0, 0.0, 30.0, 30.0]]])
        res = ce.evaluate_keypoints(dets, gts)
        assert res["AP"] == pytest.approx(100.0)

    def test_far_predictions_zero(self):
        rng = np.random.default_rng(4)
        dets, gts = self._scene(0.0, rng, n=2)
        for d in dets:
            d["keypoints"][:, :, :2] += 500.0
        res = ce.evaluate_keypoints(dets, gts)
        assert res["AP"] == pytest.approx(0.0)


class TestInstanceSegmentation:
    @staticmethod
    def _rect_mask(h, w, box):
        m = np.zeros((h, w), bool)
        x0, y0, x1, y1 = [int(v) for v in box]
        m[y0:y1, x0:x1] = True
        return m

    def test_rect_masks_equal_box_ap(self):
        """Axis-aligned rectangle masks carry exactly the box geometry:
        segm AP must equal bbox AP on the same scene — a cross-oracle
        between the two evaluators."""
        rng = np.random.default_rng(5)
        H = W = 160
        det_b, gt_b, det_m, gt_m = [], [], [], []
        for _ in range(5):
            n_gt = rng.integers(1, 4)
            boxes = []
            for _ in range(n_gt):
                x0, y0 = rng.integers(0, 90, 2)
                w, h = rng.integers(20, 60, 2)
                boxes.append([x0, y0, min(x0 + w, W), min(y0 + h, H)])
            boxes = np.array(boxes, np.float64)
            # jitter dets; drop one gt's det half the time; add a spurious det
            dets = boxes + rng.integers(-6, 7, boxes.shape)
            dets = np.clip(dets, 0, W)
            dets[:, 2:] = np.maximum(dets[:, 2:], dets[:, :2] + 1)
            if rng.random() < 0.5 and len(dets) > 1:
                dets = dets[:-1]
            spurious = np.array([[5.0, 5.0, 40.0, 40.0]])
            dets = np.concatenate([dets, spurious])
            scores = rng.uniform(0.5, 1.0, len(dets))
            det_b.append({"boxes": dets, "scores": scores})
            gt_b.append({"boxes": boxes})
            det_m.append({
                "masks": np.stack([self._rect_mask(H, W, b) for b in dets]),
                "scores": scores,
            })
            gt_m.append({"masks": np.stack([self._rect_mask(H, W, b) for b in boxes])})
        res_box = ce.evaluate_detections(det_b, gt_b, backend="python")
        res_mask = ce.evaluate_instance_segmentation(det_m, gt_m)
        for k in ("AP", "AP50", "AP75", "AR"):
            assert res_mask[k] == pytest.approx(res_box[k], abs=1e-9), k

    def test_empty_images_handled(self):
        res = ce.evaluate_instance_segmentation(
            [{"masks": np.zeros((0, 8, 8), bool), "scores": np.zeros(0)}],
            [{"masks": np.zeros((0, 8, 8), bool)}],
        )
        assert np.isnan(res["AP"])
