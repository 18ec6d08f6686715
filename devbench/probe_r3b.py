"""Round-3b diagnostics: (1) strips-kernel compile+time, (2) windowed
crop decomposition, (3) s2d mask ablation + whole-model retime,
(4) decode/pnp split. One process, ordered most-informative-first."""
import os, sys, time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")
import jax, jax.numpy as jnp, numpy as np

N_LO, N_HI = 2, 10


def marginal(fn, *args, reps=4, lo=None, hi=None):
    lo, hi = lo or N_LO, hi or N_HI

    def timed(n):
        t0 = time.perf_counter()
        _ = float(fn(n, *args))
        return time.perf_counter() - t0

    timed(lo)
    timed(hi)
    t_lo = min(timed(lo) for _ in range(reps))
    t_hi = min(timed(hi) for _ in range(reps))
    return (t_hi - t_lo) / (hi - lo)


def scanner(body):
    @partial(jax.jit, static_argnames="n")
    def fn(n, *args):
        def step(c, _):
            return c + body(*args, c) * 1e-20, None

        c, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=n)
        return c

    return fn


def report(name, t):
    print(f"{name:46s}: {t*1e3:8.3f} ms", flush=True)


B = 128
rng = np.random.default_rng(0)

# ---- 2. windowed crop decomposition ----------------------------------
print("== crop ==", flush=True)
from spacecraft_pose_estimation_tpu.ops import warp, pallas_crop, geometry

h, w = 1200, 1920
frames_u8 = jnp.asarray(rng.integers(0, 255, (B, h, w, 3)), jnp.uint8)
boxes = jnp.asarray(np.tile(np.array([[700.0, 400.0, 500.0, 420.0]], np.float32), (B, 1)))
window = (832, 896)
wh, ww = pallas_crop._effective_window(h, w, window)
print(f"effective window {wh}x{ww}", flush=True)


def cs(bx):
    return jax.vmap(partial(geometry.bbox_to_center_scale, padding=1.5))(bx)


def ext_body(frames, boxes, c, dtype):
    bx = boxes + c * 1e-20
    centers, scales = cs(bx)
    oy, ox = pallas_crop._window_origins(centers, scales, h, w, (wh, ww))
    wins = pallas_crop.extract_windows(frames, oy, ox, (wh, ww), out_dtype=dtype)
    return jnp.sum(wins.astype(jnp.float32)[:, ::97, ::131]) * 1e-9





wins_pre = jnp.asarray(rng.integers(0, 255, (B, wh, ww, 3)), jnp.uint8).astype(jnp.bfloat16)
oys = jnp.zeros(B, jnp.int32)
oxs = jnp.zeros(B, jnp.int32)


def taps_body(wins, boxes, c):
    bx = boxes + c * 1e-20
    centers, scales = cs(bx)

    def taps(center, scale, oy_i, ox_i):
        M_inv = geometry.crop_affine_matrix(center, scale, 0.0, (512, 512), inv=True)
        xs = M_inv[0, 0] * jnp.arange(512, dtype=jnp.float32) + M_inv[0, 2]
        ys = M_inv[1, 1] * jnp.arange(512, dtype=jnp.float32) + M_inv[1, 2]
        Wx = pallas_crop._interp_matrix_local(xs, ox_i, w, ww, jnp.bfloat16)
        Wy = pallas_crop._interp_matrix_local(ys, oy_i, h, wh, jnp.bfloat16)
        return Wx, Wy

    Wx, Wy = jax.vmap(taps)(centers, scales, oys, oxs)
    tmp = jnp.einsum("bhwc,boh->bowc", wins, Wy, preferred_element_type=jnp.float32)
    out = jnp.einsum("bowc,bpw->bopc", tmp.astype(jnp.bfloat16), Wx,
                     preferred_element_type=jnp.float32)
    return jnp.sum(out[:, ::31, ::37]) * 1e-9





def full_win_body(frames, boxes, c):
    bx = boxes + c * 1e-20
    centers, scales = cs(bx)
    scales = pallas_crop.clamp_scales_to_window(scales, (512, 512), window)
    crops = pallas_crop.crop_and_resize_window(
        frames, centers, scales, (512, 512), window, compute_dtype=jnp.bfloat16
    )
    return jnp.sum(crops[:, ::31, ::37]) * 1e-9


try:
    t = marginal(scanner(full_win_body), frames_u8, boxes)
    report("crop_and_resize_window e2e (hcontract)", t)
except Exception as e:
    print(f"hcontract FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)


def copy_win_body(frames, boxes, c):
    bx = boxes + c * 1e-20
    centers, scales = cs(bx)
    scales = pallas_crop.clamp_scales_to_window(scales, (512, 512), window)
    crops = pallas_crop.crop_and_resize_window(
        frames, centers, scales, (512, 512), window, compute_dtype=jnp.bfloat16,
        mode="copy",
    )
    return jnp.sum(crops[:, ::31, ::37]) * 1e-9


try:
    t = marginal(scanner(copy_win_body), frames_u8, boxes)
    report("crop_and_resize_window e2e (copy)", t)
except Exception as e:
    print(f"copy mode FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)


def full_frame_body(frames, boxes, c):
    bx = boxes + c * 1e-20
    centers, scales = cs(bx)
    crops = warp.batched_crop_and_resize(
        frames, centers, scales, jnp.zeros(B, jnp.float32), (512, 512),
        method="mxu", compute_dtype=jnp.bfloat16,
    )
    return jnp.sum(crops[:, ::31, ::37]) * 1e-9




# ---- 3. s2d model ablations ------------------------------------------
print("== s2d model ==", flush=True)
from spacecraft_pose_estimation_tpu.models.hrnet import HRNet, POSE_HRNET_W32
from spacecraft_pose_estimation_tpu.models import hrnet_int8 as hi
from spacecraft_pose_estimation_tpu.pipeline import normalize_crops

model = HRNet(config=POSE_HRNET_W32.with_joints(11), dtype=jnp.bfloat16)
variables = jax.jit(lambda k: model.init(k, jnp.zeros((1, 512, 512, 3)), train=False))(
    jax.random.key(0)
)
calib = normalize_crops(jnp.asarray(rng.integers(0, 255, (4, 512, 512, 3)), jnp.float32))
q = hi.quantize_hrnet(model, variables, calib, s2d=True)
cfg = model.config
x = jnp.asarray(rng.normal(size=(B, 512, 512, 3)), jnp.float32)

for label, s2d, nomask in (
    ("s2d folded-mask", True, False),
    ("s2d NO mask (ablation)", True, True),
):
    os.environ["_SPE_S2D_NO_MASK"] = "1" if nomask else "0"

    def body(q, x, c, s2d=s2d):
        xi = x + c * 1e-20
        hm = hi.hrnet_int8_apply(cfg, q, xi, s2d=s2d, layer1_strips=False)
        return jnp.sum(hm) * 1e-9

    try:
        t = marginal(scanner(body), q, x, lo=2, hi=8)
        report(f"int8 model {label}", t)
    except Exception as e:
        print(f"int8 model {label} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
os.environ["_SPE_S2D_NO_MASK"] = "0"

# with strips on top (if the kernel compiled above)
try:
    def body_strips(q, x, c):
        xi = x + c * 1e-20
        hm = hi.hrnet_int8_apply(cfg, q, xi, s2d=False, layer1_strips=True)
        return jnp.sum(hm) * 1e-9

    t = marginal(scanner(body_strips), q, x, lo=2, hi=8)
    report("int8 model std + layer1 strips", t)
except Exception as e:
    print(f"int8 strips model FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)

# ---- 4. decode / pnp split -------------------------------------------
print("== decode/pnp ==", flush=True)
from spacecraft_pose_estimation_tpu.ops import heatmap, pnp

hm = jnp.asarray(rng.normal(size=(B, 128, 128, 11)), jnp.float32)
centers = jnp.tile(jnp.asarray([[950.0, 610.0]], jnp.float32), (B, 1))
scales = jnp.tile(jnp.asarray([[3.75, 3.15]], jnp.float32), (B, 1))
lm3d = jnp.asarray(rng.normal(size=(11, 3)), jnp.float32)
K = jnp.asarray([[2988.6, 0, 960.0], [0, 2988.3, 600.0], [0, 0, 1]], jnp.float32)
dist = jnp.zeros(5, jnp.float32)


def dec_body(hm, c, post):
    hmi = hm + c * 1e-20
    preds, maxvals = heatmap.decode_heatmaps(hmi, centers, scales, post_process=post)
    return jnp.sum(preds) * 1e-9


t = marginal(scanner(partial(dec_body, post=True)), hm)
report("decode post_process=True", t)
t = marginal(scanner(partial(dec_body, post=False)), hm)
report("decode post_process=False", t)

kps = jnp.asarray(rng.uniform(0, 1900, (B, 11, 2)), jnp.float32)
conf = jnp.asarray(rng.uniform(0.5, 1.0, (B, 11)), jnp.float32)


def pnp_body(kps, conf, c):
    k2 = kps + c * 1e-20

    def solve(kp, cf):
        wt = pnp.adaptive_confidence_mask(cf, min_count=11)
        return pnp.solve_pnp(lm3d, kp, K, dist, wt.astype(jnp.float32), refine_iters=5)

    R, tt = jax.vmap(solve)(k2, conf)
    return jnp.sum(tt) * 1e-9


t = marginal(scanner(pnp_body), kps, conf)
report("pnp gn5 only", t)
# ---- 1. strips kernel: layer1 shapes ---------------------------------
print("== strips kernel ==", flush=True)
try:
    from spacecraft_pose_estimation_tpu.ops.pallas_blocks import (
        fused_bottleneck_chain_strips,
    )

    def rw(*shape, hi=40):
        return jnp.asarray(rng.integers(-hi, hi, shape), jnp.int8)

    def rf(*shape):
        return jnp.asarray(rng.uniform(5e-4, 2e-3, shape), jnp.float32)

    cin0, cm, cout, nb = 64, 64, 256, 4
    w1 = np.zeros((nb, cout, cm), np.int8)
    w1[0, :cin0] = np.asarray(rw(cin0, cm))
    for k in range(1, nb):
        w1[k] = np.asarray(rw(cout, cm))
    params = dict(
        w1=jnp.asarray(w1), m1=rf(nb, cm), b1=rf(nb, cm),
        w2=rw(nb, 3, 3, cm, cm), m2=rf(nb, cm), b2=rf(nb, cm),
        w3=rw(nb, cm, cout), m3=rf(nb, cout), b3=rf(nb, cout),
        wd=rw(cin0, cout), md=rf(cout), bd=rf(cout),
        coeffs=rf(nb, 2),
    )
    x64 = jnp.asarray(rng.integers(-80, 80, (B, 128, 128, cin0)), jnp.int8)

    def strips_body(x, c):
        xi = (x.astype(jnp.int32) + (c * 1e-20).astype(jnp.int32)).astype(jnp.int8)
        out = fused_bottleneck_chain_strips(
            xi, params["w1"], params["m1"], params["b1"],
            params["w2"], params["m2"], params["b2"],
            params["w3"], params["m3"], params["b3"],
            params["wd"], params["md"], params["bd"],
            params["coeffs"], nb, strip=32,
        )
        return jnp.sum(out.astype(jnp.float32)) * 1e-9

    t = marginal(scanner(strips_body), x64)
    report("layer1 strips kernel b128 128^2", t)
except Exception as e:
    print(f"strips kernel FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

# per-op XLA reference of the same chain


def perop_body(x, c):
    xi = (x.astype(jnp.int32) + (c * 1e-20).astype(jnp.int32)).astype(jnp.int8)

    def requant(f):
        return jnp.clip(jnp.round(f), -127, 127).astype(jnp.int8)

    cur = xi
    for blk in range(4):
        kin = 64 if blk == 0 else 256
        src = cur
        f1 = jax.lax.conv_general_dilated(
            src, params["w1"][blk, :kin][None, None], (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        x1 = requant(jnp.maximum(f1 * params["m1"][blk] + params["b1"][blk], 0))
        y2 = jax.lax.conv_general_dilated(
            x1, params["w2"][blk], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        x2 = requant(jnp.maximum(y2 * params["m2"][blk] + params["b2"][blk], 0))
        f3 = jax.lax.conv_general_dilated(
            x2, params["w3"][blk][None, None], (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        x3 = requant(f3 * params["m3"][blk] + params["b3"][blk])
        if blk == 0:
            fr = jax.lax.conv_general_dilated(
                src, params["wd"][None, None], (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            r = requant(fr * params["md"] + params["bd"])
        else:
            r = cur
        f = x3.astype(jnp.float32) * params["coeffs"][blk, 0] + r.astype(
            jnp.float32
        ) * params["coeffs"][blk, 1]
        cur = requant(jnp.maximum(f, 0))
    return jnp.sum(cur.astype(jnp.float32)) * 1e-9


t = marginal(scanner(perop_body), x64)
report("layer1 per-op XLA b128 128^2", t)


print("probe_r3b done", flush=True)
