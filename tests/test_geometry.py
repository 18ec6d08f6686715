"""Geometry ops vs OpenCV / SciPy oracles."""

import cv2
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax
import jax.numpy as jnp

from spacecraft_pose_estimation_tpu.ops import geometry as G


def random_rotation(rng):
    return Rotation.random(random_state=rng).as_matrix().astype(np.float64)


class TestQuaternions:
    def test_quat_dcm_roundtrip(self):
        rng = np.random.default_rng(0)
        for _ in range(20):
            R = random_rotation(rng)
            q = G.rotmat_to_quat(jnp.asarray(R, jnp.float32))
            R2 = G.quat_to_rotmat(q)
            np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)

    def test_rotmat_to_quat_matches_scipy(self):
        # scipy uses scalar-last [x,y,z,w]; ours scalar-first [w,x,y,z].
        rng = np.random.default_rng(1)
        for _ in range(20):
            R = random_rotation(rng)
            q = np.asarray(G.rotmat_to_quat(jnp.asarray(R, jnp.float32)))
            q_sp = Rotation.from_matrix(R).as_quat()  # x,y,z,w
            q_sp = np.array([q_sp[3], q_sp[0], q_sp[1], q_sp[2]])
            if np.dot(q, q_sp) < 0:
                q_sp = -q_sp
            np.testing.assert_allclose(q, q_sp, atol=1e-5)

    def test_quat_to_dcm_is_transpose_of_rotation(self):
        rng = np.random.default_rng(2)
        R = random_rotation(rng)
        q_sp = Rotation.from_matrix(R).as_quat()
        q = jnp.asarray([q_sp[3], q_sp[0], q_sp[1], q_sp[2]], jnp.float32)
        np.testing.assert_allclose(np.asarray(G.quat_to_dcm(q)), R.T, atol=1e-5)

    def test_near_pi_rotations(self):
        for axis in np.eye(3):
            R = Rotation.from_rotvec(axis * (np.pi - 1e-4)).as_matrix()
            q = G.rotmat_to_quat(jnp.asarray(R, jnp.float32))
            np.testing.assert_allclose(
                np.asarray(G.quat_to_rotmat(q)), R, atol=1e-4
            )


class TestRodrigues:
    def test_forward_matches_cv2(self):
        rng = np.random.default_rng(3)
        for _ in range(10):
            rvec = rng.normal(size=3)
            R_cv, _ = cv2.Rodrigues(rvec)
            R = G.rodrigues(jnp.asarray(rvec, jnp.float32))
            np.testing.assert_allclose(np.asarray(R), R_cv, atol=1e-5)

    def test_inverse_matches_cv2(self):
        rng = np.random.default_rng(4)
        for _ in range(10):
            R = random_rotation(rng)
            rvec_cv, _ = cv2.Rodrigues(R)
            rvec = G.rotmat_to_rodrigues(jnp.asarray(R, jnp.float32))
            np.testing.assert_allclose(
                np.asarray(rvec), rvec_cv[:, 0], atol=1e-4
            )

    def test_zero_rotation(self):
        np.testing.assert_allclose(
            np.asarray(G.rodrigues(jnp.zeros(3))), np.eye(3), atol=1e-7
        )
        np.testing.assert_allclose(
            np.asarray(G.rotmat_to_rodrigues(jnp.eye(3))), np.zeros(3), atol=1e-7
        )


class TestProjection:
    K = np.array([[600.0, 0, 320.0], [0, 610.0, 240.0], [0, 0, 1.0]])
    dist = np.array([-0.2, 0.05, 1e-3, -2e-3, 0.01])

    def test_project_matches_cv2(self):
        rng = np.random.default_rng(5)
        X = rng.normal(size=(11, 3)) + np.array([0, 0, 6.0])
        R = random_rotation(rng)
        t = np.array([0.1, -0.2, 5.0])
        uv_cv, _ = cv2.projectPoints(X, cv2.Rodrigues(R)[0], t, self.K, self.dist)
        uv = G.project_points(
            jnp.asarray(X, jnp.float32),
            jnp.asarray(R, jnp.float32),
            jnp.asarray(t, jnp.float32),
            jnp.asarray(self.K, jnp.float32),
            jnp.asarray(self.dist, jnp.float32),
        )
        np.testing.assert_allclose(np.asarray(uv), uv_cv[:, 0], atol=1e-2)

    def test_undistort_roundtrip(self):
        rng = np.random.default_rng(6)
        xy = rng.uniform(-0.3, 0.3, size=(50, 2))
        xy_d = G.distort_normalized(jnp.asarray(xy, jnp.float32), jnp.asarray(self.dist, jnp.float32))
        xy_u = G.undistort_normalized(xy_d, jnp.asarray(self.dist, jnp.float32), iters=20)
        np.testing.assert_allclose(np.asarray(xy_u), xy, atol=1e-5)

    def test_pixels_to_normalized_matches_cv2(self):
        rng = np.random.default_rng(7)
        uv = rng.uniform(50, 500, size=(20, 2)).astype(np.float64)
        out_cv = cv2.undistortPoints(uv[:, None, :], self.K, self.dist)[:, 0]
        out = G.pixels_to_normalized(
            jnp.asarray(uv, jnp.float32),
            jnp.asarray(self.K, jnp.float32),
            jnp.asarray(self.dist, jnp.float32),
            iters=20,
        )
        np.testing.assert_allclose(np.asarray(out), out_cv, atol=1e-4)


def _reference_affine(center, scale, rot, output_size, shift=(0, 0), inv=0):
    """cv2.getAffineTransform 3-point oracle, per transforms.py:57-89."""
    scale_tmp = np.asarray(scale) * 200.0
    src_w = scale_tmp[0]
    dst_w, dst_h = output_size
    rot_rad = np.pi * rot / 180
    sn, cs = np.sin(rot_rad), np.cos(rot_rad)
    src_dir = np.array([-src_w * 0.5 * -sn, src_w * -0.5 * cs])
    dst_dir = np.array([0, dst_w * -0.5], np.float32)

    def third(a, b):
        d = a - b
        return b + np.array([-d[1], d[0]], dtype=np.float32)

    src = np.zeros((3, 2), dtype=np.float32)
    dst = np.zeros((3, 2), dtype=np.float32)
    src[0] = np.asarray(center) + scale_tmp * np.asarray(shift)
    src[1] = np.asarray(center) + src_dir + scale_tmp * np.asarray(shift)
    dst[0] = [dst_w * 0.5, dst_h * 0.5]
    dst[1] = np.array([dst_w * 0.5, dst_h * 0.5]) + dst_dir
    src[2] = third(src[0], src[1])
    dst[2] = third(dst[0], dst[1])
    if inv:
        return cv2.getAffineTransform(dst, src)
    return cv2.getAffineTransform(src, dst)


class TestCropAffine:
    @pytest.mark.parametrize("rot", [0.0, 17.5, -30.0, 90.0])
    @pytest.mark.parametrize("inv", [False, True])
    def test_matches_reference_construction(self, rot, inv):
        center = np.array([301.5, 212.25])
        scale = np.array([1.8, 1.2])
        out = (512, 512)
        M_ref = _reference_affine(center, scale, rot, out, inv=int(inv))
        M = G.crop_affine_matrix(center, scale, rot, out, inv=inv)
        np.testing.assert_allclose(np.asarray(M), M_ref, atol=1e-3)

    def test_shift_and_rect_output(self):
        center = np.array([100.0, 50.0])
        scale = np.array([0.9, 0.9])
        shift = np.array([0.1, -0.05])
        out = (192, 256)
        M_ref = _reference_affine(center, scale, 12.0, out, shift=shift)
        M = G.crop_affine_matrix(center, scale, 12.0, out, shift=shift)
        np.testing.assert_allclose(np.asarray(M), M_ref, atol=1e-3)

    def test_inverse_is_exact_inverse(self):
        center = jnp.array([301.5, 212.25])
        scale = jnp.array([1.8, 1.2])
        M = G.crop_affine_matrix(center, scale, 25.0, (512, 512))
        Minv = G.crop_affine_matrix(center, scale, 25.0, (512, 512), inv=True)
        pts = jnp.array([[0.0, 0.0], [100.0, 220.0], [511.0, 1.0]])
        back = G.apply_affine(G.apply_affine(pts, M), Minv)
        np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-2)

    def test_bbox_to_center_scale(self):
        c, s = G.bbox_to_center_scale(jnp.array([10.0, 20.0, 100.0, 60.0]))
        np.testing.assert_allclose(np.asarray(c), [60.0, 50.0])
        np.testing.assert_allclose(np.asarray(s), [100 * 1.5 / 200, 60 * 1.5 / 200])
