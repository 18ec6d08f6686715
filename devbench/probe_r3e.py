"""Round-3e: strips-kernel Mosaic-crash hunt. The slab-DMA form (ANY
memory space + make_async_copy) crashes the remote compile helper (HTTP
500, probe_r3c/r3b). Variants:

  B  slab-DMA, blocks UNROLLED (no fori_loop / dynamic ref indices)
  C  XLA-pre-sliced overlapping slabs (plain BlockSpec grid, NO DMA),
     fori_loop over blocks
  D  C but unrolled

Each: compile, bit-exact check vs per-op (b8), then b128 timing.
"""
import os, sys, time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spacecraft_pose_estimation_tpu.ops.pallas_blocks import (
    _conv3x3_rows, _dot_i8, _requant,
)


def marginal(fn, *args, reps=4, lo=2, hi=10):
    def timed(n):
        t0 = time.perf_counter()
        _ = float(fn(n, *args))
        return time.perf_counter() - t0

    timed(lo); timed(hi)
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


rng = np.random.default_rng(0)
cin0, cm, cout, nb = 64, 64, 256, 4
B, H, W = 128, 128, 128
STRIP = 32
HALO = nb


def rw(*shape, hi=40):
    return jnp.asarray(rng.integers(-hi, hi, shape), jnp.int8)


def rf(*shape):
    return jnp.asarray(rng.uniform(5e-4, 2e-3, shape), jnp.float32)


w1 = np.zeros((nb, cout, cm), np.int8)
w1[0, :cin0] = np.asarray(rw(cin0, cm))
for k in range(1, nb):
    w1[k] = np.asarray(rw(cout, cm))
P = dict(
    w1=jnp.asarray(w1), m1=rf(nb, cm), b1=rf(nb, cm),
    w2=rw(nb, 3, 3, cm, cm), m2=rf(nb, cm), b2=rf(nb, cm),
    w3=rw(nb, cm, cout), m3=rf(nb, cout), b3=rf(nb, cout),
    wd=rw(cin0, cout), md=rf(cout), bd=rf(cout),
    coeffs=rf(nb, 2),
)


# ---------------------------------------------------------------------
# variant C/D: pre-sliced slabs, plain BlockSpec, no DMA
def _strip_kernel_nodma(
    x_ref,                       # block (1, rows, W, Cin0)
    w1_ref, m1_ref, b1_ref, w2_ref, m2_ref, b2_ref,
    w3_ref, m3_ref, b3_ref, wd_ref, md_ref, bd_ref, coef_ref,
    out_ref,                     # block (1, strip, W, Cout)
    pad_ref, x2s_ref, xss_ref,
    *, nblocks, strip, halo, wdt, cin0, cm, cout, unroll,
):
    rows = strip + 2 * halo
    pad_ref[...] = jnp.zeros((rows + 2, wdt + 2, cm), jnp.int8)

    def run_block(blk, src_flat, residual_flat):
        f1 = _dot_i8(src_flat, w1_ref[blk, : src_flat.shape[1], :]).astype(jnp.float32)
        pad_ref[1 : rows + 1, 1 : wdt + 1, :] = _requant(
            jnp.maximum(f1 * m1_ref[blk] + b1_ref[blk], 0.0)
        ).reshape(rows, wdt, cm)
        y2 = _conv3x3_rows(pad_ref, w2_ref[blk], 0, rows, wdt, cm)
        x2s_ref[...] = _requant(
            jnp.maximum(y2.astype(jnp.float32) * m2_ref[blk] + b2_ref[blk], 0.0)
        ).reshape(rows, wdt, cm)
        f3 = _dot_i8(x2s_ref[...].reshape(rows * wdt, cm), w3_ref[blk]).astype(jnp.float32)
        x3 = _requant(f3 * m3_ref[blk] + b3_ref[blk])
        cf = coef_ref[blk]
        f = x3.astype(jnp.float32) * cf[0] + residual_flat.astype(jnp.float32) * cf[1]
        xss_ref[...] = _requant(jnp.maximum(f, 0.0)).reshape(rows, wdt, cout)

    x0_flat = x_ref[0].reshape(rows * wdt, cin0)
    fr = _dot_i8(x0_flat, wd_ref[...]).astype(jnp.float32)
    shortcut = _requant(fr * md_ref[...] + bd_ref[...])
    run_block(0, x0_flat, shortcut)
    if unroll:
        for blk in range(1, nblocks):
            run_block(blk, xss_ref[...].reshape(rows * wdt, cout),
                      xss_ref[...].reshape(rows * wdt, cout))
    else:
        def body(blk, _):
            run_block(blk, xss_ref[...].reshape(rows * wdt, cout),
                      xss_ref[...].reshape(rows * wdt, cout))
            return 0
        jax.lax.fori_loop(1, nblocks, body, 0)
    out_ref[0] = xss_ref[halo : halo + strip, :, :]


@partial(jax.jit, static_argnames=("nblocks", "strip", "unroll"))
def strips_nodma(x, w1, m1, b1, w2, m2, b2, w3, m3, b3, wd, md, bd, coeffs,
                 nblocks, strip=32, unroll=False):
    b, h, wdt, cin0_ = x.shape
    cm_ = w2.shape[-1]
    cout_ = w3.shape[-1]
    halo = nblocks
    rows = strip + 2 * halo
    ns = h // strip
    xp = jnp.pad(x, ((0, 0), (halo, halo), (0, 0), (0, 0)))
    # overlapping slabs via static strided slices: (B, ns, rows, W, C)
    slabs = jnp.stack(
        [jax.lax.slice_in_dim(xp, i * strip, i * strip + rows, axis=1)
         for i in range(ns)], axis=1,
    ).reshape(b * ns, rows, wdt, cin0_)
    kernel = partial(
        _strip_kernel_nodma, nblocks=nblocks, strip=strip, halo=halo,
        wdt=wdt, cin0=cin0_, cm=cm_, cout=cout_, unroll=unroll,
    )
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)
    out = pl.pallas_call(
        kernel,
        grid=(b * ns,),
        in_specs=[
            pl.BlockSpec((1, rows, wdt, cin0_), lambda i: (i, 0, 0, 0)),
            full(w1), full(m1), full(b1), full(w2), full(m2), full(b2),
            full(w3), full(m3), full(b3), full(wd), full(md), full(bd),
            full(coeffs),
        ],
        out_specs=pl.BlockSpec((1, strip, wdt, cout_), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b * ns, strip, wdt, cout_), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((rows + 2, wdt + 2, cm_), jnp.int8),
            pltpu.VMEM((rows, wdt, cm_), jnp.int8),
            pltpu.VMEM((rows, wdt, cout_), jnp.int8),
        ],
    )(slabs, w1, m1, b1, w2, m2, b2, w3, m3, b3, wd, md, bd, coeffs)
    return out.reshape(b, h, wdt, cout_)


def perop(x):
    cur = x
    for blk in range(4):
        kin = 64 if blk == 0 else 256
        src = cur
        f1 = jax.lax.conv_general_dilated(
            src, P["w1"][blk, :kin][None, None], (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        x1 = _requant(jnp.maximum(f1 * P["m1"][blk] + P["b1"][blk], 0))
        y2 = jax.lax.conv_general_dilated(
            x1, P["w2"][blk], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        x2 = _requant(jnp.maximum(y2 * P["m2"][blk] + P["b2"][blk], 0))
        f3 = jax.lax.conv_general_dilated(
            x2, P["w3"][blk][None, None], (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        x3 = _requant(f3 * P["m3"][blk] + P["b3"][blk])
        if blk == 0:
            fr = jax.lax.conv_general_dilated(
                src, P["wd"][None, None], (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            r = _requant(fr * P["md"] + P["bd"])
        else:
            r = cur
        f = x3.astype(jnp.float32) * P["coeffs"][blk, 0] + r.astype(jnp.float32) * P["coeffs"][blk, 1]
        cur = _requant(jnp.maximum(f, 0))
    return cur


args = (P["w1"], P["m1"], P["b1"], P["w2"], P["m2"], P["b2"],
        P["w3"], P["m3"], P["b3"], P["wd"], P["md"], P["bd"], P["coeffs"])

x8 = jnp.asarray(rng.integers(-80, 80, (8, H, W, cin0)), jnp.int8)
ref8 = np.asarray(jax.jit(perop)(x8))
x128 = jnp.asarray(rng.integers(-80, 80, (B, H, W, cin0)), jnp.int8)

# ---- variant C: nodma + fori ----
for name, unroll in (("C nodma+fori", False), ("D nodma+unroll", True)):
    try:
        out = np.asarray(strips_nodma(x8, *args, nb, STRIP, unroll))
        bad = int((out != ref8).sum())
        print(f"{name}: compiled, mismatches={bad}/{out.size}", flush=True)

        def body(x, c, unroll=unroll):
            xi = (x.astype(jnp.int32) + (c * 1e-20).astype(jnp.int32)).astype(jnp.int8)
            o = strips_nodma(xi, *args, nb, STRIP, unroll)
            return jnp.sum(o.astype(jnp.float32)) * 1e-9

        t = marginal(scanner(body), x128)
        print(f"{name}: b128 {t*1e3:.3f} ms", flush=True)
        break  # first working variant is enough; skip the slower compile
    except Exception as e:
        print(f"{name} FAILED: {type(e).__name__}: {str(e)[:250]}", flush=True)

# ---- variant B: DMA + unrolled (only reached if C and D both fail) ---
print("probe_r3e done", flush=True)
