"""Segment timings of the int8 HRNet: stem+layer1 / +stage2 / +stage3 /
+stage4+head, to localize the gap between the 83 ms measured model and
the ~40 ms component roofline sum."""
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

def marginal(fn, *args, reps=3):
    def timed(n):
        t0 = time.perf_counter(); _ = float(fn(n, *args)); return time.perf_counter() - t0
    timed(N_LO); timed(N_HI)
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

from spacecraft_pose_estimation_tpu.models.hrnet import HRNet, POSE_HRNET_W32
from spacecraft_pose_estimation_tpu.models import hrnet_int8 as hi
from spacecraft_pose_estimation_tpu.pipeline import normalize_crops

batch = 128
rng = np.random.default_rng(0)
model = HRNet(config=POSE_HRNET_W32.with_joints(11), dtype=jnp.bfloat16)
variables = jax.jit(lambda k: model.init(k, jnp.zeros((1, 512, 512, 3)), train=False))(jax.random.key(0))
calib = normalize_crops(jnp.asarray(rng.integers(0, 255, (4, 512, 512, 3)), jnp.float32))
q = hi.quantize_hrnet(model, variables, calib)
x = jnp.asarray(rng.normal(size=(batch, 512, 512, 3)), jnp.float32)
cfg = model.config

def walk_until(ops, cfg, x, n_stages):
    """Replicates hrnet_int8._forward but stops after n_stages of
    (stem+layer1=0, stage2=1, stage3=2, stage4=3(no head), full=4)."""
    from spacecraft_pose_estimation_tpu.models.layers import block_expansion
    h = ops.input_(x)
    h = ops.stem_conv_bf16("stem1", h)
    h = ops.convbn("stem2", h, 2, True)
    for i in range(cfg.stage1_blocks):
        hin = h
        y = ops.convbn(f"layer1/block{i}/conv1", hin, 1, True)
        y = ops.convbn(f"layer1/block{i}/conv2", y, 1, True)
        y = ops.convbn(f"layer1/block{i}/conv3", y, 1, False)
        r = (ops.convbn(f"layer1/block{i}/down", hin, 1, False)
             if ops.has(f"layer1/block{i}/down") else hin)
        h = ops.add(f"layer1/block{i}", [y, r], True)
    xs = [h]
    if n_stages == 0:
        return xs
    for si, spec in enumerate((cfg.stage2, cfg.stage3, cfg.stage4)):
        if si + 1 > n_stages:
            break
        exp = block_expansion(spec.block)
        widths = [c * exp for c in spec.num_channels]
        n_pre = len(xs)
        new_xs = []
        for i in range(len(widths)):
            if i < n_pre:
                name = f"transition{si + 1}/adapt{i}"
                new_xs.append(ops.convbn(name, xs[i], 1, True) if ops.has(name) else xs[i])
            else:
                y = xs[-1]
                for j in range(i + 1 - n_pre):
                    y = ops.convbn(f"transition{si + 1}/new{i}_{j}", y, 2, True)
                new_xs.append(y)
        xs = new_xs
        last_stage = si == 2
        for m in range(spec.num_modules):
            multi = not (last_stage and m == spec.num_modules - 1)
            prefix = f"stage{si + 2}_m{m}"
            ys = []
            for bi in range(len(xs)):
                hcur = xs[bi]
                for k in range(spec.num_blocks[bi]):
                    bn = f"{prefix}/branch{bi}/block{k}"
                    y = ops.convbn(f"{bn}/conv1", hcur, 1, True)
                    y = ops.convbn(f"{bn}/conv2", y, 1, False)
                    if ops.has(f"{bn}/down"):
                        hcur = ops.convbn(f"{bn}/down", hcur, 1, False)
                    hcur = ops.add(bn, [y, hcur], True)
                ys.append(hcur)
            if len(ys) == 1:
                xs = ys
                continue
            out_n = len(ys) if multi else 1
            outs = []
            for i in range(out_n):
                acc = [ys[i]]
                for j in range(len(ys)):
                    if j == i:
                        continue
                    if j > i:
                        y = ops.convbn(f"{prefix}/fuse/up{i}_{j}", ys[j], 1, False)
                        y = ops.upsample(y, 2 ** (j - i))
                    else:
                        y = ys[j]
                        for k2 in range(i - j):
                            y = ops.convbn(f"{prefix}/fuse/down{i}_{j}_{k2}", y, 2,
                                           k2 != i - j - 1)
                    acc.append(y)
                outs.append(ops.add(f"{prefix}/fuse/out{i}", acc, True))
            xs = outs
    return xs

for n_stages, label in [(0, "stem+layer1"), (1, "+stage2"), (2, "+stage3"), (3, "+stage4")]:
    def body(q, x, pert, n_stages=n_stages):
        xi = x + pert
        ops = hi._Int8Ops(q, xi, q["in_scale"])
        xs = walk_until(ops, cfg, xi, n_stages)
        return sum(jnp.sum(h.value.astype(jnp.float32)) for h in xs) * 1e-9
    v = marginal(scanner(body), q, x)
    print(f"int8 {label:12s}: {v*1e3:8.2f} ms cumulative", flush=True)
