"""NMS / ROIAlign / box-transform ops vs straightforward NumPy oracles.

(torchvision is not in this image; oracles are direct loop
implementations of the documented CUDA-kernel semantics.)
"""

import numpy as np
import pytest

import jax.numpy as jnp

from spacecraft_pose_estimation_tpu.ops import boxes as B
from spacecraft_pose_estimation_tpu.ops import nms as N
from spacecraft_pose_estimation_tpu.ops import roi_align as RA


def random_boxes(rng, n, size=200.0):
    xy = rng.uniform(0, size, size=(n, 2))
    wh = rng.uniform(1, size / 2, size=(n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def iou_oracle(a, b):
    out = np.zeros((len(a), len(b)))
    for i, bi in enumerate(a):
        for j, bj in enumerate(b):
            ix = max(0, min(bi[2], bj[2]) - max(bi[0], bj[0]))
            iy = max(0, min(bi[3], bj[3]) - max(bi[1], bj[1]))
            inter = ix * iy
            ua = (bi[2] - bi[0]) * (bi[3] - bi[1]) + (bj[2] - bj[0]) * (bj[3] - bj[1]) - inter
            out[i, j] = inter / ua if ua > 0 else 0.0
    return out


def nms_oracle(boxes, scores, thr):
    """Greedy NMS, descending score, torchvision semantics (IoU > thr)."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    iou = iou_oracle(boxes, boxes)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if j != i and iou[i, j] > thr:
                suppressed[j] = True
    return np.array(sorted(keep))


def roi_align_oracle(feat_hwc, boxes, p, scale, sr, aligned):
    """Direct loop ROIAlign (aligned semantics of the detectron2 kernel)."""
    h, w, c = feat_hwc.shape

    def bilinear(y, x):
        if y < -1.0 or y > h or x < -1.0 or x > w:
            return np.zeros(c)
        y = min(max(y, 0.0), h - 1)
        x = min(max(x, 0.0), w - 1)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
        fy, fx = y - y0, x - x0
        return (
            feat_hwc[y0, x0] * (1 - fy) * (1 - fx)
            + feat_hwc[y0, x1] * (1 - fy) * fx
            + feat_hwc[y1, x0] * fy * (1 - fx)
            + feat_hwc[y1, x1] * fy * fx
        )

    off = 0.5 if aligned else 0.0
    out = np.zeros((len(boxes), p, p, c))
    for r, box in enumerate(boxes):
        x0, y0 = box[0] * scale - off, box[1] * scale - off
        x1, y1 = box[2] * scale - off, box[3] * scale - off
        bw, bh = x1 - x0, y1 - y0
        if not aligned:
            bw, bh = max(bw, 1.0), max(bh, 1.0)
        binw, binh = bw / p, bh / p
        for i in range(p):
            for j in range(p):
                acc = np.zeros(c)
                for ky in range(sr):
                    for kx in range(sr):
                        y = y0 + (i + (ky + 0.5) / sr) * binh
                        x = x0 + (j + (kx + 0.5) / sr) * binw
                        acc += bilinear(y, x)
                out[r, i, j] = acc / (sr * sr)
    return out


class TestIoU:
    def test_matches_oracle(self):
        rng = np.random.default_rng(0)
        a, b = random_boxes(rng, 13), random_boxes(rng, 7)
        got = B.pairwise_iou(jnp.asarray(a), jnp.asarray(b))
        np.testing.assert_allclose(np.asarray(got), iou_oracle(a, b), atol=1e-5)


class TestDeltas:
    def test_roundtrip(self):
        rng = np.random.default_rng(1)
        src = random_boxes(rng, 20)
        tgt = random_boxes(rng, 20)
        deltas = B.get_deltas(jnp.asarray(src), jnp.asarray(tgt))
        rec = B.apply_deltas(deltas, jnp.asarray(src))
        np.testing.assert_allclose(np.asarray(rec), tgt, atol=1e-2)

    def test_weights(self):
        rng = np.random.default_rng(2)
        src, tgt = random_boxes(rng, 5), random_boxes(rng, 5)
        w = (10.0, 10.0, 5.0, 5.0)
        deltas = B.get_deltas(jnp.asarray(src), jnp.asarray(tgt), w)
        rec = B.apply_deltas(deltas, jnp.asarray(src), w)
        np.testing.assert_allclose(np.asarray(rec), tgt, atol=1e-2)

    def test_scale_clamp(self):
        src = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
        deltas = jnp.asarray([[0.0, 0.0, 100.0, 100.0]])  # would be exp(100)
        out = B.apply_deltas(deltas, src)
        assert np.isfinite(np.asarray(out)).all()


class TestNMS:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    @pytest.mark.parametrize("thr", [0.3, 0.5, 0.7])
    def test_matches_oracle(self, seed, thr):
        rng = np.random.default_rng(seed)
        boxes = random_boxes(rng, 64)
        scores = rng.uniform(size=64).astype(np.float32)
        keep_ref = nms_oracle(boxes, scores, thr)
        mask = np.asarray(N.nms_mask(jnp.asarray(boxes), jnp.asarray(scores), thr))
        np.testing.assert_array_equal(np.nonzero(mask)[0], keep_ref)

    def test_valid_mask_excludes_padding(self):
        rng = np.random.default_rng(3)
        boxes = random_boxes(rng, 16)
        scores = rng.uniform(size=16).astype(np.float32)
        valid = np.ones(16, bool)
        valid[10:] = False
        mask = np.asarray(
            N.nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5, jnp.asarray(valid))
        )
        assert not mask[10:].any()
        keep_ref = nms_oracle(boxes[:10], scores[:10], 0.5)
        np.testing.assert_array_equal(np.nonzero(mask[:10])[0], keep_ref)

    def test_batched_classes_dont_suppress(self):
        boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11]], np.float32)
        scores = np.array([0.9, 0.8], np.float32)
        cls = np.array([0, 1], np.int32)
        mask = np.asarray(
            N.batched_nms_mask(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(cls), 0.5)
        )
        assert mask.all()
        mask_same = np.asarray(
            N.batched_nms_mask(jnp.asarray(boxes), jnp.asarray(scores), jnp.zeros(2, jnp.int32), 0.5)
        )
        assert mask_same.tolist() == [True, False]


class TestRoiAlign:
    @pytest.mark.parametrize("aligned", [True, False])
    def test_matches_oracle(self, aligned):
        rng = np.random.default_rng(4)
        feat = rng.normal(size=(24, 32, 5)).astype(np.float32)
        boxes = np.array(
            [[4.0, 8.0, 100.0, 60.0], [0.0, 0.0, 127.0, 95.0], [50.0, 20.0, 80.0, 70.0]],
            np.float32,
        )
        scale, p, sr = 0.25, 7, 2
        ref = roi_align_oracle(feat, boxes, p, scale, sr, aligned)
        got = RA.roi_align(
            jnp.asarray(feat), jnp.asarray(boxes), p, scale, sampling_ratio=sr, aligned=aligned
        )
        np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)

    def test_multilevel_assignment(self):
        rng = np.random.default_rng(5)
        feats = [
            jnp.asarray(rng.normal(size=(64 // s, 64 // s, 4)).astype(np.float32))
            for s in (4, 8, 16, 32)
        ]
        boxes = jnp.asarray(
            np.array([[0.0, 0.0, 32.0, 32.0], [0.0, 0.0, 900.0, 900.0]], np.float32)
        )
        out = RA.multilevel_roi_align(feats, boxes, 7, (4, 8, 16, 32))
        assert out.shape == (2, 7, 7, 4)
        only0 = RA.roi_align(feats[0], boxes[:1], 7, 1 / 4, 2)
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(only0[0]), atol=1e-5)
        only3 = RA.roi_align(feats[3], boxes[1:], 7, 1 / 32, 2)
        np.testing.assert_allclose(np.asarray(out[1]), np.asarray(only3[0]), atol=1e-5)


class TestMatcher:
    def test_rpn_style_matching(self):
        gt = jnp.asarray([[0.0, 0.0, 100.0, 100.0]])
        anchors = jnp.asarray(
            [
                [0.0, 0.0, 100.0, 100.0],  # iou 1.0 -> pos
                [0.0, 0.0, 50.0, 100.0],  # iou 0.5 -> ignore
                [200.0, 200.0, 220.0, 220.0],  # iou 0 -> neg
            ]
        )
        iou = B.pairwise_iou(gt, anchors)
        idx, lab = B.match_to_gt(iou, (0.3, 0.7), (0, -1, 1))
        assert lab.tolist() == [1, -1, 0]

    def test_low_quality_match(self):
        gt = jnp.asarray([[0.0, 0.0, 100.0, 100.0]])
        anchors = jnp.asarray([[0.0, 0.0, 50.0, 100.0], [200.0, 200.0, 220.0, 220.0]])
        iou = B.pairwise_iou(gt, anchors)
        _, lab = B.match_to_gt(iou, (0.3, 0.7), (0, -1, 1), allow_low_quality=True)
        assert lab.tolist() == [1, 0]  # best-for-gt promoted to positive
