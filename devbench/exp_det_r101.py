"""Detector serving A/B: X101 vs R101 backbones, bf16 vs int8-PTQ
(precomputed_feats path), b8 768^2 — the detect-every-frame budget."""
import os, sys, time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")
import jax, jax.numpy as jnp, numpy as np

N_LO, N_HI = 2, 6


def marginal(fn, *args, reps=4):
    def timed(n):
        t0 = time.perf_counter()
        _ = float(fn(n, *args))
        return time.perf_counter() - t0

    timed(N_LO)
    timed(N_HI)
    t_lo = min(timed(N_LO) for _ in range(reps))
    t_hi = min(timed(N_HI) for _ in range(reps))
    return (t_hi - t_lo) / (N_HI - N_LO)


def scanner(body):
    @partial(jax.jit, static_argnames="n")
    def fn(n, *args):
        def step(c, _):
            return c + body(*args, c) * 1e-20, None

        c, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=n)
        return c

    return fn


from spacecraft_pose_estimation_tpu.models.rcnn import (
    FASTER_RCNN_R101_SERVING,
    FASTER_RCNN_X101_SERVING,
    GeneralizedRCNN,
    select_best_box,
)
from spacecraft_pose_estimation_tpu.models.backbone_int8 import (
    backbone_int8_apply,
    quantize_backbone,
)

B, S = 8, 768
rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.integers(0, 255, (B, S, S, 3)).astype(np.float32))

for name, cfg in (("R101", FASTER_RCNN_R101_SERVING), ("X101", FASTER_RCNN_X101_SERVING)):
    model = GeneralizedRCNN(config=cfg, dtype=jnp.bfloat16)
    det_vars = jax.jit(
        lambda k: model.init({"params": k}, jnp.zeros((1, S, S, 3)), train=False)
    )(jax.random.key(0))

    def body_bf16(v, imgs, c):
        im = imgs + c * 1e-20
        dets = model.apply(v, im, train=False)
        return jnp.sum(select_best_box(dets, (S, S))) * 1e-9

    t = marginal(scanner(body_bf16), det_vars, imgs)
    print(f"{name} bf16 full:        {t*1e3:8.2f} ms/b{B}  ({B/t:6.1f} im/s)", flush=True)

    # int8 PTQ backbone + bf16 FPN/RPN/ROI via precomputed_feats
    mean = jnp.asarray(cfg.pixel_mean, jnp.float32)
    std = jnp.asarray(cfg.pixel_std, jnp.float32)
    calib = (jnp.asarray(rng.integers(0, 255, (2, S, S, 3)), jnp.float32) - mean) / std
    try:
        q = quantize_backbone(cfg.backbone, det_vars, calib)

        def body_int8(v, q, imgs, c):
            im = imgs + c * 1e-20
            x_norm = (im - mean) / std
            feats = backbone_int8_apply(cfg.backbone, q, x_norm)
            dets = model.apply(v, im, train=False, precomputed_feats=feats)
            return jnp.sum(select_best_box(dets, (S, S))) * 1e-9

        t = marginal(scanner(body_int8), det_vars, q, imgs)
        print(f"{name} int8 backbone:    {t*1e3:8.2f} ms/b{B}  ({B/t:6.1f} im/s)", flush=True)
    except Exception as e:
        print(f"{name} int8 backbone: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
print("done", flush=True)
