"""Fused pipeline e2e: synthetic scene -> crop -> tiny HRNet -> decode -> PnP.

Also covers the multi-chip dry run (8 virtual CPU devices) — the
framework's replacement for the reference's DDP path.
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from spacecraft_pose_estimation_tpu.models.hrnet import HRNET_TINY, HRNet
from spacecraft_pose_estimation_tpu.ops import geometry as G
from spacecraft_pose_estimation_tpu.pipeline import (
    PipelineConfig,
    boxes_to_center_scale,
    make_landmark_stage,
    make_pose_pipeline,
    normalize_crops,
)


class TestLandmarkStage:
    def test_shapes_and_jit(self):
        model = HRNet(config=dataclasses.replace(HRNET_TINY, num_joints=6))
        cfg = PipelineConfig(image_size=(64, 64), solver="none")
        variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False)
        stage = jax.jit(make_landmark_stage(model, cfg))
        frames = jnp.zeros((2, 100, 140, 3))
        boxes = jnp.asarray([[20.0, 20.0, 60.0, 50.0], [10.0, 30.0, 80.0, 60.0]])
        out = stage(variables, frames, boxes)
        assert out["keypoints"].shape == (2, 6, 2)
        assert out["confidence"].shape == (2, 6)
        assert out["heatmaps"].shape == (2, 16, 16, 6)

    def test_normalize(self):
        crops = jnp.full((1, 4, 4, 3), 255.0)
        out = np.asarray(normalize_crops(crops))
        expect = (1.0 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225])
        np.testing.assert_allclose(out[0, 0, 0], expect, rtol=1e-5)

    def test_center_scale(self):
        boxes = jnp.asarray([[10.0, 20.0, 100.0, 60.0]])
        c, s = boxes_to_center_scale(boxes)
        np.testing.assert_allclose(np.asarray(c[0]), [60.0, 50.0])
        np.testing.assert_allclose(np.asarray(s[0]), [0.75, 0.45])


class TestFullPipeline:
    def test_end_to_end_solves(self):
        """An untrained net gives garbage keypoints; the point here is the
        full graph compiles and produces finite, well-shaped outputs."""
        model = HRNet(config=dataclasses.replace(HRNET_TINY, num_joints=16))
        variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False)
        rng = np.random.default_rng(0)
        lm3d = rng.normal(size=(16, 3)).astype(np.float32)
        K = np.array([[200.0, 0, 70.0], [0, 200.0, 50.0], [0, 0, 1]], np.float32)
        dist = np.zeros(5, np.float32)
        cfg = PipelineConfig(image_size=(64, 64), solver="gn", refine_iters=3)
        run = jax.jit(make_pose_pipeline(model, lm3d, K, dist, cfg))
        frames = jnp.asarray(rng.uniform(0, 255, size=(2, 100, 140, 3)), jnp.float32)
        boxes = jnp.asarray([[20.0, 20.0, 60.0, 50.0], [10.0, 30.0, 80.0, 60.0]])
        out = run(variables, frames, boxes)
        assert out["R"].shape == (2, 3, 3)
        assert out["t"].shape == (2, 3)
        assert out["quat"].shape == (2, 4)
        for k in ("keypoints", "R", "t", "quat"):
            assert np.isfinite(np.asarray(out[k])).all(), k
        # R are valid rotations
        RtR = np.einsum("bij,bik->bjk", np.asarray(out["R"]), np.asarray(out["R"]))
        np.testing.assert_allclose(RtR, np.tile(np.eye(3), (2, 1, 1)), atol=1e-4)

    def test_oracle_heatmaps_recover_pose(self):
        """Bypass the net: feed ideal Gaussian heatmaps for a known pose and
        check the decode+PnP stages recover it through the fused path."""
        from spacecraft_pose_estimation_tpu.ops import heatmap as hm_ops
        from spacecraft_pose_estimation_tpu.ops import pnp as pnp_ops
        from scipy.spatial.transform import Rotation

        rng = np.random.default_rng(1)
        J = 20
        lm3d = rng.uniform(-1, 1, size=(J, 3)).astype(np.float32)
        R_gt = Rotation.random(random_state=rng).as_matrix().astype(np.float32)
        t_gt = np.array([0.1, -0.2, 8.0], np.float32)
        K = np.array([[400.0, 0, 320.0], [0, 400.0, 240.0], [0, 0, 1]], np.float32)
        dist = np.zeros(5, np.float32)
        uv = np.asarray(
            G.project_points(jnp.asarray(lm3d), jnp.asarray(R_gt), jnp.asarray(t_gt), jnp.asarray(K), jnp.asarray(dist))
        )

        # Build crop geometry from the keypoint bbox (as the detector would).
        x0, y0 = uv.min(0) - 10
        x1, y1 = uv.max(0) + 10
        box = jnp.asarray([[x0, y0, x1 - x0, y1 - y0]], jnp.float32)
        centers, scales = boxes_to_center_scale(box)

        # Ideal heatmaps at 64x64 for a 256x256 crop: joints in crop coords.
        img_size, hm_size = (256, 256), (64, 64)
        M = G.crop_affine_matrix(centers[0], scales[0], 0.0, img_size)
        joints_crop = np.asarray(G.apply_affine(jnp.asarray(uv, jnp.float32), M))
        tgt, w = hm_ops.generate_target(
            jnp.asarray(joints_crop), jnp.ones(J), img_size, hm_size, 2.0
        )
        assert np.asarray(w).min() == 1.0
        hm = tgt[None]  # (1, 64, 64, J)

        preds, maxv = hm_ops.decode_heatmaps(hm, centers, scales, post_process=True)
        # keypoints should be within a couple of source pixels (heatmap
        # stride is 4 source px here)
        err = np.linalg.norm(np.asarray(preds[0]) - uv, axis=-1)
        assert err.max() < 2 * (scales[0][0] * 200 / hm_size[0])

        Rhat, that = pnp_ops.solve_pnp(
            jnp.asarray(lm3d), preds[0], jnp.asarray(K), jnp.asarray(dist), maxv[0] > 0.5
        )
        cos = (np.trace(np.asarray(Rhat).T @ R_gt) - 1) / 2
        assert np.degrees(np.arccos(np.clip(cos, -1, 1))) < 2.0
        assert np.linalg.norm(np.asarray(that) - t_gt) / np.linalg.norm(t_gt) < 0.02


class TestMultichipDryrun:
    @pytest.mark.slow
    def test_dryrun_8_devices(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)

    @pytest.mark.slow
    def test_entry_compiles_on_cpu_tiny(self):
        # entry() itself uses the flagship 512x512 model (too slow for CPU
        # CI); here we only check it constructs and traces abstractly.
        import __graft_entry__ as ge

        fn, args = ge.entry()
        jax.eval_shape(fn, *args)


class TestWindowedCropPipeline:
    def test_windowed_stage_matches_fullframe(self):
        """crop_window serving path == full-frame path when the padded
        box fits the window coverage (exact f32 taps both sides)."""
        model = HRNet(config=dataclasses.replace(HRNET_TINY, num_joints=6))
        variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False)
        rng = np.random.default_rng(3)
        frames = jnp.asarray(rng.integers(0, 255, (2, 224, 256, 3)), jnp.uint8)
        boxes = jnp.asarray([[60.0, 40.0, 50.0, 40.0], [120.0, 70.0, 60.0, 48.0]])
        base = PipelineConfig(image_size=(64, 64), solver="none", warp_dtype="float32")
        # window coverage (h-33, w-129) must exceed the 90-px padded box
        windowed = dataclasses.replace(base, crop_window=(192, 256))
        out_full = jax.jit(make_landmark_stage(model, base))(
            variables, frames.astype(jnp.float32), boxes
        )
        out_win = jax.jit(make_landmark_stage(model, windowed))(
            variables, frames, boxes
        )
        np.testing.assert_allclose(
            np.asarray(out_win["heatmaps"]), np.asarray(out_full["heatmaps"]),
            atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(out_win["keypoints"]), np.asarray(out_full["keypoints"]),
            atol=1e-2,
        )
