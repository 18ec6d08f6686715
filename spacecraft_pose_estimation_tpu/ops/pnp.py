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

TPU formulation note: the textbook EPnP/Kabsch/GN pipeline leans on
``eigh``/``svd``/``lu_solve``, which XLA lowers to QDWH-style iterative
composites — hundreds of *sequential* tiny ops that dominate the
latency of a vmapped batch of 12x12 problems (measured 4 ms/b128 on
v5e, ~8% of the serving budget). Every decomposition here is therefore
replaced by a shallow fixed-depth equivalent:

* smallest eigenvector of the PSD normal matrix -> shifted inverse
  power iteration with repeated squaring (one 12-step Gauss-Jordan
  inverse + 3 batched matmul squarings);
* Kabsch SVD -> Horn's quaternion method (largest eigenvector of the
  4x4 Davenport matrix by shifted power iteration with squaring);
* control points -> axis-aligned weighted-std basis (no 3x3 eigh; the
  basis only needs conditioning, and the Gauss-Newton polish makes the
  final pose insensitive to the choice);
* barycentric coordinates -> closed form in the orthogonal basis;
* GN step -> 6x6 Gauss-Jordan inverse (PD by damping).
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
# Shallow fixed-depth linear algebra (see module docstring)
# ---------------------------------------------------------------------------


def _gj_inverse(A: Array) -> Array:
    """Gauss-Jordan inverse of a (strictly diagonally stabilized /
    positive-definite) n x n matrix — no pivoting, n unrolled rank-1
    updates. Depth n instead of an LU/QR composite.

    Pivots are magnitude-clamped (sign-preserving): a rank-deficient
    input (degenerate normal matrix from all-zero weights — the r4
    NaN-pose root cause) yields a garbage-but-finite inverse instead of
    a div-by-zero inf/NaN cascade; callers gate on ``isfinite`` and fall
    back (see ``pnp_ransac``). Well-conditioned inputs are unaffected:
    their pivots are far above the clamp."""
    n = A.shape[-1]
    aug = jnp.concatenate([A, jnp.eye(n, dtype=A.dtype)], axis=-1)  # (n, 2n)
    rows = jnp.arange(n)
    for k in range(n):
        piv = aug[k, k]
        piv = jnp.where(
            jnp.abs(piv) >= 1e-20, piv, jnp.where(piv < 0, -1e-20, 1e-20)
        )
        row_k = aug[k] / piv
        col = aug[:, k]
        upd = aug - col[:, None] * row_k[None, :]
        aug = jnp.where((rows == k)[:, None], row_k[None, :], upd)
    return aug[:, n:]


def _min_eigvec_pd(A: Array, shift_rel: float = 1e-6) -> Array:
    """Eigenvector of the smallest eigenvalue of a PSD matrix via shifted
    inverse power iteration with repeated squaring: B = (A + eps I)^-1,
    v ~ B^8 b. The eigen-gap amplification is ((l2+eps)/(l1+eps))^8 —
    astronomically dominant for PnP normal matrices, at a fixed depth of
    ~n + 5 ops."""
    n = A.shape[-1]
    scale = jnp.trace(A) / n + 1e-30
    # absolute shift floor: an all-zero A (all-masked EPnP system) would
    # otherwise invert a ~1e-36-scaled matrix and overflow f32
    B = _gj_inverse(A + (shift_rel * scale + 1e-12) * jnp.eye(n, dtype=A.dtype))
    # normalize between squarings: B's top eigenvalue ~1/eps would
    # overflow f32 after two squarings otherwise
    for _ in range(3):
        B = B / jnp.linalg.norm(B)
        B = _mm(B, B)
    # Seed with the largest-norm COLUMN of B^8 (not B @ ones): after the
    # squarings B ~ v1 v1^T, whose column j is v1 * v1[j]; the max-norm
    # column has |v1[j]| >= 1/sqrt(n), so the seed can never be
    # orthogonal to the target eigenvector (B @ ones collapses onto the
    # runner-up whenever v1 . ones ~ 0, e.g. symmetric null vectors).
    j = jnp.argmax(jnp.sum(B * B, axis=0))
    v = B[:, j]
    v = _mm(B / jnp.linalg.norm(B), v[:, None])[:, 0]  # one polish step
    return v / jnp.maximum(jnp.linalg.norm(v), 1e-30)


def _max_eigvec_sym4(K: Array) -> Array:
    """Largest-eigenvalue eigenvector of a symmetric 4x4 via shifted
    power iteration with repeated squaring. All eigenvalues lie within
    +-||K||_F, so K + ||K||_F I is PSD with the same top eigenvector;
    7 squarings amplify the gap by ratio^128 (1.5^128 ~ 1e22 even for a
    modest spectral ratio) at the cost of 7 4x4 matmuls."""
    A = K + jnp.linalg.norm(K) * jnp.eye(4, dtype=K.dtype)
    for _ in range(7):
        A = A / jnp.maximum(jnp.linalg.norm(A), 1e-30)
        A = _mm(A, A)
    # max-norm column seed (see _min_eigvec_pd): A @ ones fails for
    # q . ones = 0, e.g. a 180-degree rotation about an axis with
    # ax + ay + az = 0, where q = (0, ax, ay, az)
    j = jnp.argmax(jnp.sum(A * A, axis=0))
    v = A[:, j]
    v = _mm(A / jnp.maximum(jnp.linalg.norm(A), 1e-30), v[:, None])[:, 0]
    return v / jnp.maximum(jnp.linalg.norm(v), 1e-30)


# ---------------------------------------------------------------------------
# EPnP core
# ---------------------------------------------------------------------------


def _control_and_alphas(world: Array, w: Array) -> tuple[Array, Array]:
    """4 control points (weighted centroid + axis-aligned weighted-std
    basis) and the closed-form barycentric coordinates.

    The orthogonal basis makes the alphas a diagonal solve; conditioning
    is guarded per axis (planar/degenerate clouds), and the downstream
    Gauss-Newton polish removes any basis-choice sensitivity."""
    wsum = jnp.maximum(jnp.sum(w), 1e-8)
    c0 = jnp.sum(world * w[:, None], axis=0) / wsum
    centered = world - c0
    var = jnp.sum(centered**2 * w[:, None], axis=0) / wsum  # per axis
    # absolute floor on top of the relative one: all-zero weights give
    # var == 0 on every axis, and a ~1e-7 scale would blow the alphas up
    # to ~1e7 x world (finite garbage is fine — callers isfinite-gate —
    # but overflow into inf is not)
    scale = jnp.sqrt(
        jnp.maximum(var, jnp.maximum(1e-6 * jnp.max(var), 1e-10))
    )
    ctrl = jnp.concatenate([c0[None, :], c0[None, :] + jnp.diag(scale)], axis=0)
    a123 = centered / scale[None, :]  # (N, 3) coords in the basis
    a0 = 1.0 - jnp.sum(a123, axis=1)
    alpha = jnp.concatenate([a0[:, None], a123], axis=1)  # (N, 4)
    return ctrl, alpha


def _kabsch(world: Array, cam: Array, w: Array) -> tuple[Array, Array]:
    """Weighted rigid alignment (cam ~= R @ world + t) by Horn's
    quaternion method: q = top eigenvector of the 4x4 Davenport matrix —
    a proper rotation by construction, no SVD."""
    wsum = jnp.maximum(jnp.sum(w), 1e-8)
    mw = jnp.sum(world * w[:, None], axis=0) / wsum
    mc = jnp.sum(cam * w[:, None], axis=0) / wsum
    S = _mm(((world - mw) * w[:, None]).T, cam - mc)  # S_ab = sum a_a b_b
    sxx, sxy, sxz = S[0, 0], S[0, 1], S[0, 2]
    syx, syy, syz = S[1, 0], S[1, 1], S[1, 2]
    szx, szy, szz = S[2, 0], S[2, 1], S[2, 2]
    N = jnp.array(
        [
            [sxx + syy + szz, syz - szy, szx - sxz, sxy - syx],
            [syz - szy, sxx - syy - szz, sxy + syx, szx + sxz],
            [szx - sxz, sxy + syx, -sxx + syy - szz, syz + szy],
            [sxy - syx, szx + sxz, syz + szy, -sxx - syy + szz],
        ]
    )
    q = _max_eigvec_sym4(N)
    q0, qx, qy, qz = q[0], q[1], q[2], q[3]
    R = jnp.array(
        [
            [
                1 - 2 * (qy * qy + qz * qz),
                2 * (qx * qy - q0 * qz),
                2 * (qx * qz + q0 * qy),
            ],
            [
                2 * (qx * qy + q0 * qz),
                1 - 2 * (qx * qx + qz * qz),
                2 * (qy * qz - q0 * qx),
            ],
            [
                2 * (qx * qz - q0 * qy),
                2 * (qy * qz + q0 * qx),
                1 - 2 * (qx * qx + qy * qy),
            ],
        ]
    )
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
    ctrl, alpha = _control_and_alphas(world, w)  # (4,3), (N,4)

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
    x = _min_eigvec_pd(MtM).reshape(4, 3)  # cam-frame ctrl pts up to scale

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
        # GN must never corrupt a finite pose: points behind/at the
        # camera plane project to inf, and a degenerate (all-zero-
        # weight) system gives 0/0 — sanitize the system, then accept
        # the step only if the updated pose stays finite.
        J = jnp.where(jnp.isfinite(J), J, 0.0)
        r = jnp.where(jnp.isfinite(r), r, 0.0)
        A = _mm(J.T, J) + damping * jnp.eye(6)
        g = _mm(J.T, r[:, None])[:, 0]
        delta = -_mm(_gj_inverse(A), g[:, None])[:, 0]
        dR = geometry.rodrigues(delta[:3])
        Rn = _mm(dR, R)
        tn = _mm(dR, t[:, None])[:, 0] + delta[3:]
        ok = jnp.all(jnp.isfinite(Rn)) & jnp.all(jnp.isfinite(tn))
        return (jnp.where(ok, Rn, R), jnp.where(ok, tn, t)), None

    (R, t), _ = jax.lax.scan(step, (R, t), None, length=iters)
    return R, t


# ---------------------------------------------------------------------------
# RANSAC
# ---------------------------------------------------------------------------


def _reproj_err(world, img_px, K, dist, R, t):
    proj = geometry.project_points(world, R, t, K, dist)
    return jnp.linalg.norm(proj - img_px, axis=-1)


def _pose_is_finite(R: Array, t: Array) -> Array:
    return jnp.all(jnp.isfinite(R)) & jnp.all(jnp.isfinite(t))


def _first_finite_pose(candidates: list[tuple[Array, Array]]) -> tuple[Array, Array]:
    """First all-finite (R, t) in priority order. The last candidate must
    be finite by construction (the identity fallback). Mirrors the
    reference solver's contract: ``cv2.solvePnPRansac`` never hands back
    non-finite poses (export_predicted_poses_real.py:199-204), so
    neither do we — the r4 accuracy run emitted 30/41 NaN poses through
    exactly this hole."""
    R, t = candidates[-1]
    for Rc, tc in reversed(candidates[:-1]):
        ok = _pose_is_finite(Rc, tc)
        R = jnp.where(ok, Rc, R)
        t = jnp.where(ok, tc, t)
    return R, t


def _identity_pose(world: Array) -> tuple[Array, Array]:
    """Finite last-resort pose: identity rotation, target centred one
    model-diameter in front of the camera."""
    span = jnp.max(jnp.linalg.norm(world - jnp.mean(world, axis=0), axis=-1))
    z = jnp.maximum(2.0 * span, 1.0)
    return jnp.eye(3), jnp.array([0.0, 0.0, 1.0]) * z


def _masked_err_sum(err: Array, w: Array) -> Array:
    """Weighted reprojection-error sum that treats any non-finite entry
    as 'infinitely bad' instead of poisoning comparisons with NaN."""
    s = jnp.sum(jnp.where(w > 0, err, 0.0) * w)
    return jnp.where(jnp.isfinite(s), s, jnp.inf)


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
    # Sampling guard: with fewer valid points than the minimal-subset
    # size (e.g. every confidence below the smallest adaptive
    # threshold), a zero/underfilled probability vector makes
    # jax.random.choice(replace=False) undefined — degrade to uniform
    # over all points; the finite-fallback chain below bounds the rest.
    p = jnp.where(
        jnp.sum(vf) >= sample_size,
        vf / jnp.maximum(jnp.sum(vf), 1.0),
        jnp.full((n,), 1.0 / n),
    )

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
    e_hyp = _masked_err_sum(err0, iw)
    e_all = _masked_err_sum(_reproj_err(world, img_px, K, dist, R1, t1), iw)
    use_all = e_all < e_hyp
    R2 = jnp.where(use_all, R1, R0)
    t2 = jnp.where(use_all, t1, t0)
    R, t = refine_pose(R2, t2, world, img_px, K, dist, iw, iters=refine_iters)

    # Finite-fallback chain: refined -> pre-refine selection -> best
    # RANSAC hypothesis -> inlier EPnP -> identity. Guarantees finite
    # R/t on ANY input (garbage keypoints, zero confidences, clustered
    # points) — the reference-parity contract.
    R, t = _first_finite_pose(
        [(R, t), (R2, t2), (R0, t0), (R1, t1), _identity_pose(world)]
    )

    err = _reproj_err(world, img_px, K, dist, R, t)
    inliers = (err < reproj_threshold) & valid
    iw_out = inliers.astype(jnp.float32)
    return {
        "R": R,
        "t": t,
        "inliers": inliers,
        "num_inliers": jnp.sum(inliers),
        "mean_reproj_err": jnp.sum(err * iw_out) / jnp.maximum(jnp.sum(iw_out), 1.0),
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
    fast path when keypoint confidences are trusted. Finite R/t on any
    input (same fallback contract as ``pnp_ransac``)."""
    R0, t0 = epnp(world, _norm_pts(img_px, K, dist), weights)
    R, t = refine_pose(R0, t0, world, img_px, K, dist, weights, iters=refine_iters)
    return _first_finite_pose([(R, t), (R0, t0), _identity_pose(world)])


def _norm_pts(img_px, K, dist):
    return geometry.pixels_to_normalized(img_px, K, dist, iters=10)
