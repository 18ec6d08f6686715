"""COCO AP evaluator tests against hand-computable cases."""

import numpy as np
import pytest

from spacecraft_pose_estimation_tpu.data.coco_eval import (
    box_iou_xyxy,
    evaluate_detections,
    padded_detections_to_list,
)


def det(boxes, scores):
    return {"boxes": np.asarray(boxes, np.float64), "scores": np.asarray(scores, np.float64)}


def gt(boxes):
    return {"boxes": np.asarray(boxes, np.float64)}


class TestPerfect:
    def test_exact_detections_ap_100(self):
        boxes = [[10, 10, 50, 60], [100, 100, 180, 190]]
        res = evaluate_detections([det(boxes, [0.9, 0.8])], [gt(boxes)])
        assert res["AP"] == pytest.approx(100.0, abs=1.0)
        assert res["AP50"] == pytest.approx(100.0, abs=1.0)

    def test_no_detections_ap_0(self):
        res = evaluate_detections([det(np.zeros((0, 4)), np.zeros(0))], [gt([[0, 0, 10, 10]])])
        assert res["AP"] == pytest.approx(0.0)

    def test_no_gt_is_nan(self):
        res = evaluate_detections(
            [det([[0, 0, 10, 10]], [0.9])], [gt(np.zeros((0, 4)))]
        )
        assert np.isnan(res["AP"])


class TestPartial:
    def test_half_recall(self):
        # 1 of 2 GT found -> AP ~ 50 at all thresholds
        res = evaluate_detections(
            [det([[10, 10, 50, 60]], [0.9])],
            [gt([[10, 10, 50, 60], [100, 100, 180, 190]])],
        )
        assert res["AP"] == pytest.approx(50.0, abs=2.0)

    def test_localization_quality_matters(self):
        # detection with IoU ~0.6: counts at 0.5/0.55/0.6 but not above
        g = [[0, 0, 100, 100]]
        d = [[0, 0, 100, 60]]  # IoU 0.6
        res = evaluate_detections([det(d, [0.9])], [gt(g)])
        assert res["AP50"] == pytest.approx(100.0, abs=1.0)
        assert res["AP75"] == pytest.approx(0.0, abs=1.0)
        assert 20.0 < res["AP"] < 40.0  # 3/10 thresholds pass

    def test_false_positive_lowers_precision(self):
        g = [[0, 0, 100, 100]]
        res_clean = evaluate_detections([det([[0, 0, 100, 100]], [0.9])], [gt(g)])
        res_fp = evaluate_detections(
            [det([[0, 0, 100, 100], [300, 300, 400, 400]], [0.5, 0.9])], [gt(g)]
        )
        assert res_fp["AP"] < res_clean["AP"]

    def test_higher_scored_poor_duplicate_is_fp(self):
        # A loose (IoU~0.6) duplicate scored ABOVE the accurate detection
        # precedes it in matching order: at strict thresholds it is an FP
        # before the true positive, halving precision at full recall.
        g = [[0, 0, 100, 100]]
        res = evaluate_detections(
            [det([[0, 0, 100, 100], [0, 0, 100, 60]], [0.8, 0.9])], [gt(g)]
        )
        clean = evaluate_detections([det([[0, 0, 100, 100]], [0.8])], [gt(g)])
        assert res["AP75"] < clean["AP75"]


class TestAreasAndMaxDets:
    def test_area_split(self):
        small_box = [[0, 0, 10, 10]]  # area 100 < 32^2
        large_box = [[0, 0, 200, 200]]
        res = evaluate_detections(
            [det(small_box, [0.9]), det(large_box, [0.9])],
            [gt(small_box), gt(large_box)],
        )
        assert res["APs"] == pytest.approx(100.0, abs=1.0)
        assert res["APl"] == pytest.approx(100.0, abs=1.0)

    def test_max_dets_1(self):
        g = [[0, 0, 100, 100], [200, 200, 300, 300]]
        d = [[0, 0, 100, 100], [200, 200, 300, 300]]
        res1 = evaluate_detections([det(d, [0.9, 0.8])], [gt(g)], max_dets=1)
        res2 = evaluate_detections([det(d, [0.9, 0.8])], [gt(g)], max_dets=2)
        assert res2["AP"] > res1["AP"]


class TestNativeBackend:
    def test_native_matches_numpy(self):
        import os
        import subprocess

        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        subprocess.run(["make", "-C", os.path.join(root, "native")], check=True,
                       capture_output=True)
        rng = np.random.default_rng(7)
        dets, gts = [], []
        for _ in range(8):
            ng = rng.integers(1, 4)
            g = np.concatenate([rng.uniform(0, 200, (ng, 2)), rng.uniform(20, 120, (ng, 2))], 1)
            g[:, 2:] += g[:, :2]
            d = np.concatenate([g + rng.normal(0, 5, g.shape),
                                rng.uniform(0, 300, (2, 4))])
            d[:, 2:] = np.maximum(d[:, 2:], d[:, :2] + 1)
            dets.append({"boxes": d, "scores": rng.uniform(0, 1, len(d))})
            gts.append({"boxes": g})
        r_np = evaluate_detections(dets, gts, backend="numpy")
        r_cc = evaluate_detections(dets, gts, backend="native")
        for k in r_np:
            if np.isnan(r_np[k]):
                assert np.isnan(r_cc[k])
            else:
                assert abs(r_np[k] - r_cc[k]) < 1e-9, k


class TestHelpers:
    def test_iou(self):
        a = np.array([[0, 0, 10, 10]], np.float64)
        b = np.array([[5, 0, 15, 10]], np.float64)
        assert box_iou_xyxy(a, b)[0, 0] == pytest.approx(50 / 150)

    def test_padded_conversion(self):
        dets = {
            "boxes": np.zeros((2, 3, 4)),
            "scores": np.array([[0.9, 0.1, 0.0], [0.5, 0.0, 0.0]]),
            "valid": np.array([[True, True, False], [True, False, False]]),
        }
        lst = padded_detections_to_list(dets)
        assert len(lst[0]["scores"]) == 2 and len(lst[1]["scores"]) == 1


class TestRotatedEvaluator:
    """Rotated-box AP (rotated_coco_evaluation.py semantics): perfect
    predictions -> AP 100; axis-aligned rotated boxes must reproduce the
    axis-aligned evaluator exactly; rotation changes the matching."""

    def _gt(self):
        rng = np.random.default_rng(0)
        gts = []
        for _ in range(4):
            n = rng.integers(1, 4)
            cx = rng.uniform(50, 200, n)
            cy = rng.uniform(50, 200, n)
            w = rng.uniform(20, 60, n)
            h = rng.uniform(20, 60, n)
            a = rng.uniform(-45, 45, n)
            gts.append({"boxes": np.stack([cx, cy, w, h, a], axis=1)})
        return gts

    def test_perfect_predictions(self):
        from spacecraft_pose_estimation_tpu.data.coco_eval import (
            evaluate_rotated_detections,
        )

        gts = self._gt()
        dets = [
            {"boxes": g["boxes"].copy(),
             "scores": np.linspace(0.9, 0.5, len(g["boxes"]))}
            for g in gts
        ]
        res = evaluate_rotated_detections(dets, gts)
        assert res["AP"] == pytest.approx(100.0, abs=1e-6)
        assert res["AP50"] == pytest.approx(100.0, abs=1e-6)

    def test_axis_aligned_matches_plain_evaluator(self):
        from spacecraft_pose_estimation_tpu.data.coco_eval import (
            evaluate_detections,
            evaluate_rotated_detections,
        )

        rng = np.random.default_rng(3)
        gts_r, gts_x, dets_r, dets_x = [], [], [], []
        for _ in range(3):
            n = 3
            cx = rng.uniform(60, 180, n)
            cy = rng.uniform(60, 180, n)
            w = rng.uniform(20, 50, n)
            h = rng.uniform(20, 50, n)
            gts_r.append({"boxes": np.stack([cx, cy, w, h, np.zeros(n)], axis=1)})
            gts_x.append({"boxes": np.stack(
                [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=1)})
            # jittered predictions
            jx = cx + rng.normal(0, 4, n)
            jy = cy + rng.normal(0, 4, n)
            s = rng.uniform(0.3, 0.95, n)
            dets_r.append({"boxes": np.stack([jx, jy, w, h, np.zeros(n)], axis=1),
                           "scores": s})
            dets_x.append({"boxes": np.stack(
                [jx - w / 2, jy - h / 2, jx + w / 2, jy + h / 2], axis=1),
                "scores": s})
        r_rot = evaluate_rotated_detections(dets_r, gts_r)
        r_ax = evaluate_detections(dets_x, gts_x, backend="numpy")
        assert r_rot["AP"] == pytest.approx(r_ax["AP"], abs=0.2)
        assert r_rot["AP50"] == pytest.approx(r_ax["AP50"], abs=0.2)

    def test_rotation_matters(self):
        from spacecraft_pose_estimation_tpu.data.coco_eval import (
            evaluate_rotated_detections,
        )

        gt = [{"boxes": np.array([[100.0, 100.0, 60.0, 14.0, 0.0]])}]
        aligned = [{"boxes": np.array([[100.0, 100.0, 60.0, 14.0, 0.0]]),
                    "scores": np.array([0.9])}]
        crossed = [{"boxes": np.array([[100.0, 100.0, 60.0, 14.0, 90.0]]),
                    "scores": np.array([0.9])}]
        assert evaluate_rotated_detections(aligned, gt)["AP"] > 99.0
        # a thin box rotated 90 deg overlaps its GT far below 0.5 IoU
        assert evaluate_rotated_detections(crossed, gt)["AP50"] == 0.0


class TestSemSegEvaluator:
    def test_perfect_prediction(self):
        from spacecraft_pose_estimation_tpu.data.coco_eval import (
            evaluate_semantic_segmentation,
        )

        rng = np.random.default_rng(0)
        gts = [rng.integers(0, 4, (16, 16)) for _ in range(3)]
        res = evaluate_semantic_segmentation(gts, gts, num_classes=4)
        assert res["mIoU"] == pytest.approx(100.0)
        assert res["pACC"] == pytest.approx(100.0)

    def test_known_confusion(self):
        from spacecraft_pose_estimation_tpu.data.coco_eval import (
            evaluate_semantic_segmentation,
        )

        gt = np.zeros((4, 4), np.int64)
        gt[2:] = 1
        pred = gt.copy()
        pred[0, 0] = 1  # one class-0 pixel mislabeled
        res = evaluate_semantic_segmentation([pred], [gt], num_classes=2)
        # class0: tp=7 union=8 -> 0.875 ; class1: tp=8 union=9 -> 8/9
        expect = (7 / 8 + 8 / 9) / 2 * 100
        assert res["mIoU"] == pytest.approx(expect, abs=1e-6)
        assert res["pACC"] == pytest.approx(15 / 16 * 100, abs=1e-6)

    def test_ignore_label(self):
        from spacecraft_pose_estimation_tpu.data.coco_eval import (
            evaluate_semantic_segmentation,
        )

        gt = np.zeros((4, 4), np.int64)
        gt[0] = 255  # ignored row
        pred = np.zeros((4, 4), np.int64)
        pred[0] = 1  # wrong but ignored
        res = evaluate_semantic_segmentation([pred], [gt], num_classes=2)
        assert res["pACC"] == pytest.approx(100.0)
