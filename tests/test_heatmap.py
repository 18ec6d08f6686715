"""Heatmap target synthesis + decode vs straightforward NumPy oracles."""

import numpy as np
import jax.numpy as jnp

from spacecraft_pose_estimation_tpu.ops import geometry as G
from spacecraft_pose_estimation_tpu.ops import heatmap as H


def oracle_target(joints, joints_vis, image_size, heatmap_size, sigma):
    """NumPy loop oracle for JointsDataset.generate_target semantics."""
    J = joints.shape[0]
    wh, hh = heatmap_size
    weight = joints_vis.astype(np.float32).copy()
    target = np.zeros((J, hh, wh), np.float32)
    tmp = int(sigma * 3)
    stride = (image_size[0] / wh, image_size[1] / hh)
    for j in range(J):
        mu_x = int(joints[j, 0] / stride[0] + 0.5)
        mu_y = int(joints[j, 1] / stride[1] + 0.5)
        ul = [mu_x - tmp, mu_y - tmp]
        br = [mu_x + tmp + 1, mu_y + tmp + 1]
        if ul[0] >= wh or ul[1] >= hh or br[0] < 0 or br[1] < 0:
            weight[j] = 0
            continue
        if weight[j] <= 0.5:
            continue
        size = 2 * tmp + 1
        x = np.arange(size, dtype=np.float32)
        y = x[:, None]
        x0 = y0 = size // 2
        g = np.exp(-((x - x0) ** 2 + (y - y0) ** 2) / (2 * sigma**2))
        gx = max(0, -ul[0]), min(br[0], wh) - ul[0]
        gy = max(0, -ul[1]), min(br[1], hh) - ul[1]
        ix = max(0, ul[0]), min(br[0], wh)
        iy = max(0, ul[1]), min(br[1], hh)
        target[j, iy[0]:iy[1], ix[0]:ix[1]] = g[gy[0]:gy[1], gx[0]:gx[1]]
    return target, weight


class TestGenerateTarget:
    def test_matches_oracle(self):
        rng = np.random.default_rng(0)
        J = 17
        joints = rng.uniform(-30, 540, size=(J, 2)).astype(np.float32)
        vis = (rng.uniform(size=J) > 0.2).astype(np.float32)
        img, hm, sigma = (512, 512), (128, 128), 2.0
        tgt, w = H.generate_target(jnp.asarray(joints), jnp.asarray(vis), img, hm, sigma)
        tgt_o, w_o = oracle_target(joints, vis, img, hm, sigma)
        np.testing.assert_allclose(np.asarray(w), w_o)
        np.testing.assert_allclose(
            np.asarray(tgt).transpose(2, 0, 1), tgt_o, atol=1e-5
        )

    def test_out_of_bounds_joint_zero_weight(self):
        joints = np.array([[1e4, 1e4], [256.0, 256.0]], np.float32)
        vis = np.ones(2, np.float32)
        tgt, w = H.generate_target(
            jnp.asarray(joints), jnp.asarray(vis), (512, 512), (128, 128), 2.0
        )
        assert np.asarray(w)[0] == 0.0 and np.asarray(w)[1] == 1.0
        assert np.asarray(tgt)[..., 0].max() == 0.0
        assert np.isclose(np.asarray(tgt)[..., 1].max(), 1.0)

    def test_rect_heatmap(self):
        rng = np.random.default_rng(1)
        joints = rng.uniform(0, 190, size=(5, 2)).astype(np.float32)
        vis = np.ones(5, np.float32)
        tgt, w = H.generate_target(
            jnp.asarray(joints), jnp.asarray(vis), (192, 256), (48, 64), 3.0
        )
        tgt_o, w_o = oracle_target(joints, vis, (192, 256), (48, 64), 3.0)
        np.testing.assert_allclose(np.asarray(w), w_o)
        np.testing.assert_allclose(np.asarray(tgt).transpose(2, 0, 1), tgt_o, atol=1e-5)


def oracle_decode(hm_bjhw, post_process):
    """NumPy oracle for get_max_preds + the sub-pixel shift."""
    b, j, h, w = hm_bjhw.shape
    flat = hm_bjhw.reshape(b, j, -1)
    idx = flat.argmax(-1)
    maxv = flat.max(-1)
    coords = np.stack([(idx % w).astype(np.float64), np.floor(idx / w)], -1)
    coords *= (maxv > 0)[..., None]
    if post_process:
        for n in range(b):
            for p in range(j):
                px, py = int(np.floor(coords[n, p, 0] + 0.5)), int(np.floor(coords[n, p, 1] + 0.5))
                if 1 < px < w - 1 and 1 < py < h - 1:
                    hmv = hm_bjhw[n, p]
                    diff = np.array([hmv[py, px + 1] - hmv[py, px - 1], hmv[py + 1, px] - hmv[py - 1, px]])
                    coords[n, p] += np.sign(diff) * 0.25
    return coords, maxv


class TestDecode:
    def test_matches_oracle_with_affine_lift(self):
        rng = np.random.default_rng(2)
        b, j, h, w = 4, 17, 64, 48
        hm = rng.uniform(0, 1, size=(b, j, h, w)).astype(np.float32)
        centers = rng.uniform(100, 400, size=(b, 2)).astype(np.float32)
        scales = rng.uniform(0.5, 2.0, size=(b, 2)).astype(np.float32)

        preds, maxv = H.decode_heatmaps(
            jnp.asarray(hm.transpose(0, 2, 3, 1)),
            jnp.asarray(centers),
            jnp.asarray(scales),
            post_process=True,
        )
        coords_o, maxv_o = oracle_decode(hm, True)
        preds_o = np.stack(
            [
                np.asarray(G.transform_preds(jnp.asarray(coords_o[i], jnp.float32), centers[i], scales[i], (w, h)))
                for i in range(b)
            ]
        )
        np.testing.assert_allclose(np.asarray(maxv), maxv_o, atol=1e-6)
        np.testing.assert_allclose(np.asarray(preds), preds_o, atol=1e-3)

    def test_nonpositive_peak_zeroed(self):
        hm = -np.ones((1, 1, 8, 8), np.float32)
        preds, maxv = H.get_max_preds(jnp.asarray(hm.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(preds), 0.0)
