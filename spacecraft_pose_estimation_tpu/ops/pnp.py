"""Batched PnP: weighted EPnP + Gauss-Newton refine + vmapped RANSAC.

Replaces the reference's ``cv2.solvePnPRansac(..., SOLVEPNP_EPNP,
iterationsCount=10000, reprojectionError=15.0)`` stage
(pose_estimation/export_predicted_poses_real.py:199-201) with a fully
compiled, fixed-shape formulation:

* the adaptive confidence-threshold loop (:187-197 — 0.95 * 0.8**k until
  >= 15 keypoints survive, max 100 steps) becomes a closed-form scan over
  all 101 candidate thresholds;
* RANSAC becomes ``vmap`` over H hypothesis minimal subsets (EPnP on 6
  points each), inliers counted by pixel-space reprojection error with
  distortion, best model refined by damped Gauss-Newton on the inliers;
* everything is weighted/masked rather than gathered, so the whole solver
  jits and batches over frames with a second vmap.

All matmuls run at Precision.HIGHEST — this is precision-critical scalar
geometry, not MXU-bound compute.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import geometry

Array = jax.Array
_HI = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_HI)


# ---------------------------------------------------------------------------
# Confidence gating (export_predicted_poses_real.py:187-197)
# ---------------------------------------------------------------------------


def adaptive_confidence_mask(
    conf: Array,
    init_threshold: float = 0.95,
    decay: float = 0.8,
    min_count: int = 15,
    max_iters: int = 100,
) -> Array:
    """Largest threshold in {init * decay**k} keeping >= min_count points.

    Returns the boolean keep-mask. If no threshold reaches ``min_count``
    within ``max_iters`` decays, the final (smallest) threshold is used —
    exactly the reference's loop-exit behaviour.
    """
    ks = jnp.arange(max_iters + 1, dtype=jnp.float32)
    thresholds = init_threshold * decay**ks  # (K,)
    counts = jnp.sum(conf[None, :] > thresholds[:, None], axis=1)
    meets = counts >= min_count
    k = jnp.where(jnp.any(meets), jnp.argmax(meets), max_iters)
    return conf > thresholds[k]


# ---------------------------------------------------------------------------
# EPnP core
# ---------------------------------------------------------------------------


def _control_points(world: Array, w: Array) -> Array:
    """4 control points: weighted centroid + principal axes (EPnP choice)."""
    wsum = jnp.maximum(jnp.sum(w), 1e-8)
    c0 = jnp.sum(world * w[:, None], axis=0) / wsum
    centered = (world - c0) * jnp.sqrt(w)[:, None]
    cov = _mm(centered.T, centered) / wsum
    eigval, eigvec = jnp.linalg.eigh(cov)  # ascending
    # Guard the planar/degenerate case: keep every axis at a minimum extent
    # so the barycentric basis stays invertible.
    scale = jnp.sqrt(jnp.maximum(eigval, 1e-6 * jnp.maximum(eigval[-1], 1e-8)))
    ctrl = c0[None, :] + scale[:, None] * eigvec.T
    return jnp.concatenate([c0[None, :], ctrl], axis=0)  # (4, 3)


def _barycentric(world: Array, ctrl: Array) -> Array:
    """Alphas with sum 1 st world_i = sum_j alpha_ij * ctrl_j. (N, 4)."""
    C = jnp.concatenate([ctrl.T, jnp.ones((1, 4))], axis=0)  # (4, 4)
    P = jnp.concatenate([world.T, jnp.ones((1, world.shape[0]))], axis=0)
    return jnp.linalg.solve(C, P).T


def _kabsch(world: Array, cam: Array, w: Array) -> tuple[Array, Array]:
    """Weighted rigid alignment: find R, t with cam ~= R @ world + t."""
    wsum = jnp.maximum(jnp.sum(w), 1e-8)
    mw = jnp.sum(world * w[:, None], axis=0) / wsum
    mc = jnp.sum(cam * w[:, None], axis=0) / wsum
    H = _mm(((world - mw) * w[:, None]).T, cam - mc)
    U, _, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(_mm(Vt.T, U.T)))
    S = jnp.diag(jnp.concatenate([jnp.ones(2), d[None]]))
    R = _mm(_mm(Vt.T, S), U.T)
    t = mc - _mm(R, mw[:, None])[:, 0]
    return R, t


def epnp(world: Array, img_norm: Array, weights: Array) -> tuple[Array, Array]:
    """Weighted EPnP (beta-1 case + rigid alignment).

    Args:
      world: (N, 3) 3-D landmarks.
      img_norm: (N, 2) undistorted normalized image coordinates.
      weights: (N,) nonnegative point weights (0 masks a point out).

    Returns:
      (R, t): world->camera rotation and translation.
    """
    n = world.shape[0]
    w = weights.astype(jnp.float32)
    ctrl = _control_points(world, w)
    alpha = _barycentric(world, ctrl)  # (N, 4)

    u, v = img_norm[:, 0], img_norm[:, 1]
    sw = jnp.sqrt(w)
    # M rows: [a_j, 0, -a_j*u] and [0, a_j, -a_j*v] per control point j.
    zeros = jnp.zeros_like(alpha)
    rx = jnp.stack([alpha, zeros, -alpha * u[:, None]], axis=-1)  # (N,4,3)
    ry = jnp.stack([zeros, alpha, -alpha * v[:, None]], axis=-1)
    M = jnp.concatenate(
        [rx.reshape(n, 12) * sw[:, None], ry.reshape(n, 12) * sw[:, None]], axis=0
    )
    MtM = _mm(M.T, M)
    _, vecs = jnp.linalg.eigh(MtM)
    x = vecs[:, 0].reshape(4, 3)  # camera-frame control points up to scale

    # Scale beta from inter-control-point distances; sign so depths > 0.
    iu, ju = jnp.triu_indices(4, k=1)
    dc = jnp.linalg.norm(ctrl[iu] - ctrl[ju], axis=-1)
    dv = jnp.linalg.norm(x[iu] - x[ju], axis=-1)
    beta = jnp.sum(dv * dc) / jnp.maximum(jnp.sum(dv * dv), 1e-12)
    cam_ctrl = beta * x
    cam = _mm(alpha, cam_ctrl)  # (N, 3)
    sign = jnp.sign(jnp.sum(cam[:, 2] * w) + 1e-12)
    cam = cam * sign
    return _kabsch(world, cam, w)


# ---------------------------------------------------------------------------
# Gauss-Newton refinement (pixel space, with distortion, via autodiff)
# ---------------------------------------------------------------------------


def refine_pose(
    R: Array,
    t: Array,
    world: Array,
    img_px: Array,
    K: Array,
    dist: Array,
    weights: Array,
    iters: int = 10,
    damping: float = 1e-6,
) -> tuple[Array, Array]:
    """Damped Gauss-Newton on weighted pixel reprojection error.

    Pose is updated multiplicatively: p_cam' = exp(w_hat) p_cam + dt.
    Jacobians come from jacfwd of the full distortion-aware projection.
    """

    def residual(delta, R, t):
        dR = geometry.rodrigues(delta[:3])
        Rn = _mm(dR, R)
        tn = _mm(dR, t[:, None])[:, 0] + delta[3:]
        proj = geometry.project_points(world, Rn, tn, K, dist)
        return ((proj - img_px) * weights[:, None]).reshape(-1)

    def step(carry, _):
        R, t = carry
        z = jnp.zeros(6)
        J = jax.jacfwd(residual)(z, R, t)  # (2N, 6)
        r = residual(z, R, t)
        A = _mm(J.T, J) + damping * jnp.eye(6)
        g = _mm(J.T, r[:, None])[:, 0]
        delta = -jnp.linalg.solve(A, g)
        dR = geometry.rodrigues(delta[:3])
        return (_mm(dR, R), _mm(dR, t[:, None])[:, 0] + delta[3:]), None

    (R, t), _ = jax.lax.scan(step, (R, t), None, length=iters)
    return R, t


# ---------------------------------------------------------------------------
# RANSAC
# ---------------------------------------------------------------------------


def _reproj_err(world, img_px, K, dist, R, t):
    proj = geometry.project_points(world, R, t, K, dist)
    return jnp.linalg.norm(proj - img_px, axis=-1)


@partial(
    jax.jit,
    static_argnames=("num_hypotheses", "sample_size", "refine_iters", "min_count"),
)
def pnp_ransac(
    world: Array,
    img_px: Array,
    K: Array,
    dist: Array,
    conf: Array,
    key: Array,
    num_hypotheses: int = 512,
    sample_size: int = 6,
    reproj_threshold: float = 15.0,
    refine_iters: int = 10,
    min_count: int = 15,
) -> dict[str, Array]:
    """Fixed-shape RANSAC PnP over confidence-gated keypoints.

    Matches the reference solve stage's contract: input all keypoints with
    confidences, gate with the adaptive threshold, robustly solve, return
    pose + inliers. ``num_hypotheses`` plays the role of OpenCV's
    ``iterationsCount`` (vmapped, so hundreds are cheap).
    """
    n = world.shape[0]
    valid = adaptive_confidence_mask(conf, min_count=min_count)
    vf = valid.astype(jnp.float32)
    p = vf / jnp.maximum(jnp.sum(vf), 1.0)

    def hypothesis(k):
        idx = jax.random.choice(k, n, shape=(sample_size,), replace=False, p=p)
        R, t = epnp(world[idx], _norm_pts(img_px[idx], K, dist), jnp.ones(sample_size))
        err = _reproj_err(world, img_px, K, dist, R, t)
        inl = (err < reproj_threshold) & valid
        return R, t, jnp.sum(inl)

    keys = jax.random.split(key, num_hypotheses)
    Rs, ts, scores = jax.vmap(hypothesis)(keys)
    best = jnp.argmax(scores)
    R0, t0 = Rs[best], ts[best]

    err0 = _reproj_err(world, img_px, K, dist, R0, t0)
    inliers = (err0 < reproj_threshold) & valid
    iw = inliers.astype(jnp.float32)
    # Re-solve EPnP on all inliers, then polish with Gauss-Newton.
    R1, t1 = epnp(world, _norm_pts(img_px, K, dist), iw)
    # Keep whichever of (hypothesis, inlier-EPnP) fits better, then refine.
    e_hyp = jnp.sum(err0 * iw)
    e_all = jnp.sum(_reproj_err(world, img_px, K, dist, R1, t1) * iw)
    use_all = e_all < e_hyp
    R2 = jnp.where(use_all, R1, R0)
    t2 = jnp.where(use_all, t1, t0)
    R, t = refine_pose(R2, t2, world, img_px, K, dist, iw, iters=refine_iters)

    err = _reproj_err(world, img_px, K, dist, R, t)
    inliers = (err < reproj_threshold) & valid
    return {
        "R": R,
        "t": t,
        "inliers": inliers,
        "num_inliers": jnp.sum(inliers),
        "mean_reproj_err": jnp.sum(err * iw) / jnp.maximum(jnp.sum(iw), 1.0),
    }


def solve_pnp(
    world: Array,
    img_px: Array,
    K: Array,
    dist: Array,
    weights: Array,
    refine_iters: int = 10,
) -> tuple[Array, Array]:
    """Direct weighted EPnP + Gauss-Newton (no RANSAC) — the fused-pipeline
    fast path when keypoint confidences are trusted."""
    R, t = epnp(world, _norm_pts(img_px, K, dist), weights)
    return refine_pose(R, t, world, img_px, K, dist, weights, iters=refine_iters)


def _norm_pts(img_px, K, dist):
    return geometry.pixels_to_normalized(img_px, K, dist, iters=10)
