"""Rotation, projection and affine-crop geometry as pure, batch-friendly JAX.

Replaces the reference's scattered NumPy/OpenCV geometry:

* quaternion <-> DCM conventions of ``speed_plus_utils/utils.py:26-60`` and
  ``pose_estimation/export_predicted_poses_real.py:22-57`` (Jazar extraction
  with the repo's sign fix),
* Brown 5-coefficient distortion projection
  (``speed_plus_utils/utils.py:108-139``),
* the center/scale/rot affine crop transform of
  ``landmark_regression/lib/utils/transforms.py:57-110`` — here in closed
  form (it is always a similarity transform) rather than via
  ``cv2.getAffineTransform`` 3-point solves.

Everything is written for a single example; batch with ``jax.vmap``. All
functions are jit-safe (static shapes, no Python branching on values).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

# Pose math is tiny (3x3 / Nx3 matmuls) but precision-critical: on TPU the
# MXU would otherwise run these in bfloat16. Pin full f32 precision here —
# the FLOPs are negligible, the parity with the OpenCV reference is not.
_HI = jax.lax.Precision.HIGHEST


def _mm(a: Array, b: Array) -> Array:
    return jnp.matmul(a, b, precision=_HI)


# ---------------------------------------------------------------------------
# Quaternions / rotation matrices
# ---------------------------------------------------------------------------


def quat_to_dcm(q: Array) -> Array:
    """Scalar-first quaternion -> direction cosine matrix.

    Matches the reference's PyNav-derived convention
    (``speed_plus_utils/utils.py:26-60``): the returned matrix is the
    *transpose* of the usual Hamilton rotation matrix, i.e. the world->body
    DCM. The reference projects with ``quat_to_dcm(q).T @ X + t``.
    """
    q = q / jnp.linalg.norm(q)
    q0, q1, q2, q3 = q[0], q[1], q[2], q[3]
    return jnp.stack(
        [
            jnp.stack([2 * q0**2 - 1 + 2 * q1**2,
                       2 * q1 * q2 + 2 * q0 * q3,
                       2 * q1 * q3 - 2 * q0 * q2]),
            jnp.stack([2 * q1 * q2 - 2 * q0 * q3,
                       2 * q0**2 - 1 + 2 * q2**2,
                       2 * q2 * q3 + 2 * q0 * q1]),
            jnp.stack([2 * q1 * q3 + 2 * q0 * q2,
                       2 * q2 * q3 - 2 * q0 * q1,
                       2 * q0**2 - 1 + 2 * q3**2]),
        ]
    )


def quat_to_rotmat(q: Array) -> Array:
    """Scalar-first quaternion -> standard (body->world) rotation matrix."""
    return quat_to_dcm(q).T


def rotmat_to_quat(r: Array) -> Array:
    """Rotation matrix -> scalar-first quaternion, Shepperd-style extraction.

    Branchless equivalent of the reference's Jazar algorithm *including its
    corrected e1-dominant branch*
    (``pose_estimation/export_predicted_poses_real.py:22-57``): the diagonal
    term with the largest magnitude anchors the extraction, off-diagonal
    differences/sums fill in the rest. All four candidate extractions are
    computed and the numerically dominant one selected with a gather, so the
    function vmaps and differentiates cleanly.
    """
    r00, r11, r22 = r[0, 0], r[1, 1], r[2, 2]
    e0 = jnp.sqrt(jnp.maximum(1 + r00 + r11 + r22, 0.0)) / 2
    e1 = jnp.sqrt(jnp.maximum(1 + r00 - r11 - r22, 0.0)) / 2
    e2 = jnp.sqrt(jnp.maximum(1 - r00 + r11 - r22, 0.0)) / 2
    e3 = jnp.sqrt(jnp.maximum(1 - r00 - r11 + r22, 0.0)) / 2
    mags = jnp.stack([e0, e1, e2, e3])
    idx = jnp.argmax(mags)

    def safe(d):
        return jnp.where(jnp.abs(d) > 1e-12, d, 1.0)

    d0, d1, d2, d3 = safe(4 * e0), safe(4 * e1), safe(4 * e2), safe(4 * e3)
    a01, a02, a12 = r[2, 1] - r[1, 2], r[0, 2] - r[2, 0], r[1, 0] - r[0, 1]
    s01, s02, s12 = r[1, 0] + r[0, 1], r[2, 0] + r[0, 2], r[2, 1] + r[1, 2]
    candidates = jnp.stack(
        [
            jnp.stack([e0, a01 / d0, a02 / d0, a12 / d0]),
            jnp.stack([a01 / d1, e1, s01 / d1, s02 / d1]),
            jnp.stack([a02 / d2, s01 / d2, e2, s12 / d2]),
            jnp.stack([a12 / d3, s02 / d3, s12 / d3, e3]),
        ]
    )
    return candidates[idx]


def rodrigues(rvec: Array) -> Array:
    """Axis-angle vector -> rotation matrix (cv2.Rodrigues forward)."""
    theta = jnp.linalg.norm(rvec)
    safe_theta = jnp.where(theta > 1e-12, theta, 1.0)
    k = rvec / safe_theta
    kx, ky, kz = k[0], k[1], k[2]
    K = jnp.array([[0.0, -kz, ky], [kz, 0.0, -kx], [-ky, kx, 0.0]])
    s, c = jnp.sin(theta), jnp.cos(theta)
    R = jnp.eye(3) + s * K + (1 - c) * _mm(K, K)
    return jnp.where(theta > 1e-12, R, jnp.eye(3) + skew(rvec))


def skew(v: Array) -> Array:
    """3-vector -> skew-symmetric cross-product matrix."""
    x, y, z = v[0], v[1], v[2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y]),
            jnp.stack([z, zero, -x]),
            jnp.stack([-y, x, zero]),
        ]
    )


def rotmat_to_rodrigues(r: Array) -> Array:
    """Rotation matrix -> axis-angle vector (cv2.Rodrigues inverse)."""
    cos_theta = jnp.clip((jnp.trace(r) - 1) / 2, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    axis_raw = jnp.stack([r[2, 1] - r[1, 2], r[0, 2] - r[2, 0], r[1, 0] - r[0, 1]])
    sin_theta = jnp.sin(theta)
    # Generic case: axis from the skew part. Near theta==pi the skew part
    # vanishes; recover the axis from the diagonal instead.
    axis_generic = axis_raw / jnp.where(jnp.abs(sin_theta) > 1e-6, 2 * sin_theta, 1.0)
    diag_axis = jnp.sqrt(jnp.maximum((jnp.diag(r) + 1) / 2, 0.0))
    signs = jnp.sign(jnp.where(axis_raw == 0, 1.0, axis_raw))
    axis_pi = diag_axis * signs
    axis_pi = axis_pi / jnp.maximum(jnp.linalg.norm(axis_pi), 1e-12)
    axis = jnp.where(jnp.abs(sin_theta) > 1e-6, axis_generic, axis_pi)
    return jnp.where(theta > 1e-12, axis * theta, jnp.zeros(3))


# ---------------------------------------------------------------------------
# Camera model: Brown distortion projection / undistortion
# ---------------------------------------------------------------------------


def distort_normalized(xy: Array, dist: Array) -> Array:
    """Apply OpenCV Brown distortion (k1,k2,p1,p2,k3) to normalized coords.

    ``xy``: (..., 2) normalized image-plane coordinates (x/z, y/z).
    Matches ``speed_plus_utils/utils.py:120-131``.
    """
    k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
    xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_normalized(xy_dist: Array, dist: Array, iters: int = 8) -> Array:
    """Invert Brown distortion by fixed-point iteration (cv2.undistortPoints)."""

    def body(_, xy):
        k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
        x, y = xy[..., 0], xy[..., 1]
        r2 = x * x + y * y
        radial = 1 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
        dx = 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
        dy = p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
        x_new = (xy_dist[..., 0] - dx) / radial
        y_new = (xy_dist[..., 1] - dy) / radial
        return jnp.stack([x_new, y_new], axis=-1)

    return jax.lax.fori_loop(0, iters, body, xy_dist)


def project_points(points: Array, R: Array, t: Array, K: Array, dist: Array) -> Array:
    """World points -> pixel coordinates through K @ [R|t] with distortion.

    ``points``: (N, 3); ``R``: (3, 3) world->camera; ``t``: (3,).
    Pinhole + Brown model per ``speed_plus_utils/utils.py:108-139``.
    """
    p_cam = _mm(points, R.T) + t
    xy = p_cam[..., :2] / p_cam[..., 2:3]
    xy = distort_normalized(xy, dist)
    u = K[0, 0] * xy[..., 0] + K[0, 2]
    v = K[1, 1] * xy[..., 1] + K[1, 2]
    return jnp.stack([u, v], axis=-1)


def pixels_to_normalized(uv: Array, K: Array, dist: Array, iters: int = 8) -> Array:
    """Pixel coordinates -> undistorted normalized image-plane coordinates."""
    x = (uv[..., 0] - K[0, 2]) / K[0, 0]
    y = (uv[..., 1] - K[1, 2]) / K[1, 1]
    return undistort_normalized(jnp.stack([x, y], axis=-1), dist, iters=iters)


# ---------------------------------------------------------------------------
# Affine crop transform (center/scale/rot similarity)
# ---------------------------------------------------------------------------

PIXEL_STD = 200.0  # the HRNet-lineage scale unit (JointsDataset.py pixel_std)


def crop_affine_matrix(
    center: Array,
    scale: Array,
    rot_deg: Array,
    output_size: tuple[int, int],
    shift: Array | None = None,
    inv: bool = False,
) -> Array:
    """2x3 affine mapping a scale*200-sized box at ``center`` to the output.

    Closed-form equivalent of ``lib/utils/transforms.py:57-89``
    (`get_affine_transform`): the 3-point ``cv2.getAffineTransform``
    construction there always produces the similarity
    ``p_dst = s * Rot(-rot) @ (p_src - src_center) + dst_center`` with
    ``s = output_w / (scale_x * 200)``. ``inv=True`` returns the exact
    inverse map (dst -> src), used to lift heatmap peaks back to source
    image coordinates (`transform_preds`).

    ``output_size`` is (width, height), matching the reference convention.
    """
    scale = jnp.asarray(scale, jnp.float32)
    scale = jnp.broadcast_to(scale, (2,))
    center = jnp.asarray(center, jnp.float32)
    shift_v = jnp.zeros(2, jnp.float32) if shift is None else jnp.asarray(shift, jnp.float32)

    src_w = scale[0] * PIXEL_STD
    dst_w, dst_h = float(output_size[0]), float(output_size[1])
    s = dst_w / src_w

    rot = -jnp.deg2rad(jnp.asarray(rot_deg, jnp.float32))
    cs, sn = jnp.cos(rot), jnp.sin(rot)
    A = s * jnp.stack([jnp.stack([cs, -sn]), jnp.stack([sn, cs])])

    src_c = center + scale * PIXEL_STD * shift_v
    dst_c = jnp.array([dst_w * 0.5, dst_h * 0.5], jnp.float32)

    if inv:
        A_inv = jnp.stack([jnp.stack([cs, sn]), jnp.stack([-sn, cs])]) / s
        b = src_c - _mm(A_inv, dst_c[:, None])[:, 0]
        return jnp.concatenate([A_inv, b[:, None]], axis=1)
    b = dst_c - _mm(A, src_c[:, None])[:, 0]
    return jnp.concatenate([A, b[:, None]], axis=1)


def apply_affine(points: Array, M: Array) -> Array:
    """Apply a 2x3 affine to (..., 2) points."""
    return _mm(points, M[:, :2].T) + M[:, 2]


def transform_preds(
    coords: Array, center: Array, scale: Array, output_size: tuple[int, int]
) -> Array:
    """Heatmap-space coords -> source-image coords (lib/utils/transforms.py:49-54)."""
    M = crop_affine_matrix(center, scale, 0.0, output_size, inv=True)
    return apply_affine(coords, M)


def bbox_to_center_scale(bbox_xywh: Array, padding: float = 1.5) -> tuple[Array, Array]:
    """COCO xywh box -> (center, scale) a la ``lib/dataset/events.py:98-113``.

    The reference's `_xywh2cs` does *not* inflate to the image aspect ratio
    (that branch is commented out); scale is simply ``[w, h] * 1.5 / 200``.
    Note downstream only scale[0] drives the crop width (`crop_affine_matrix`),
    so the effective crop is a square of side ``w * padding``.
    """
    x, y, w, h = bbox_xywh[0], bbox_xywh[1], bbox_xywh[2], bbox_xywh[3]
    center = jnp.stack([x + w * 0.5, y + h * 0.5])
    scale = jnp.stack([w, h]) * padding / PIXEL_STD
    return center, scale
