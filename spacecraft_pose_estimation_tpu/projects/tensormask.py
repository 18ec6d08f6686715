"""TensorMask project: the SwapAlign2Nat op (TPU-native).

Semantic contract from the reference
``projects/TensorMask/tensormask/layers/`` (swap_align2nat.py:32-56 +
csrc/SwapAlign2Nat/SwapAlign2Nat_cuda.cu:70-470):

Input X of shape (N, V, U, H, W): a sliding-window ("aligned") mask
representation — per pixel (y, x) a VxU mask window. The op converts it
to the "natural" representation with swapped unit lengths
(arxiv 1903.12174 §4):

* output shape (N, V', U', H', W') with V' = λV, U' = λU,
  H' = ceil(H/λ), W' = ceil(W/λ),
* value at (v, u, y, x) is a quadrilinear (bilinear in the window dims
  AND the spatial dims) resample of X at

    ov = (v + 0.5)/λ - 0.5,   ou = (u + 0.5)/λ - 0.5,
    oy = y·λ + v - λV/2 + 0.5, ox = x·λ + u - λU/2 + 0.5,

  16 taps with out-of-bounds taps reading ``pad_val`` (default -6:
  sigmoid(-6) ≈ 0 — no mask outside the tensor).

TPU-first design: the CUDA kernel's per-thread 16-tap loop becomes one
vectorized 16-term gather expression over the full (V', U', H', W')
grid — fixed shapes, jit- and autodiff-clean (the reference ships a
hand-written backward kernel; here JAX transposes the gathers
automatically).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def swap_align2nat(x: Array, lambda_val: int, pad_val: float = -6.0) -> Array:
    """(N, V, U, H, W) aligned -> (N, λV, λU, ceil(H/λ), ceil(W/λ))
    natural. See module docstring for the exact resampling contract."""
    assert lambda_val >= 1
    n, vin, uin, hin, win = x.shape
    lam = float(lambda_val)
    vout, uout = lambda_val * vin, lambda_val * uin
    hout = -(-hin // lambda_val)  # ceil
    wout = -(-win // lambda_val)
    h_vout, h_uout = vout / 2.0, uout / 2.0

    v = jnp.arange(vout, dtype=jnp.float32)
    u = jnp.arange(uout, dtype=jnp.float32)
    y = jnp.arange(hout, dtype=jnp.float32)
    xg = jnp.arange(wout, dtype=jnp.float32)

    # continuous source positions (cuda kernel lines 82-104)
    ov = (v + 0.5) / lam - 0.5  # (V',)
    ou = (u + 0.5) / lam - 0.5  # (U',)
    oy = y[None, :] * lam + v[:, None] - h_vout + 0.5  # (V', H')
    ox = xg[None, :] * lam + u[:, None] - h_uout + 0.5  # (U', W')

    def taps(o, size):
        f = jnp.floor(o)
        c = jnp.ceil(o)
        wc = o - f
        return (
            f.astype(jnp.int32),
            c.astype(jnp.int32),
            (1.0 - wc).astype(jnp.float32),
            wc.astype(jnp.float32),
            size,
        )

    vf, vc, vwf, vwc, _ = taps(ov, vin)
    uf, uc, uwf, uwc, _ = taps(ou, uin)
    yf, yc, ywf, ywc, _ = taps(oy, hin)
    xf, xc, xwf, xwc, _ = taps(ox, win)

    def gather(vi, ui, yi, xi):
        """vi (V',), ui (U',), yi (V', H'), xi (U', W') index tensors ->
        (N, V', U', H', W') values with pad outside."""
        okv = (vi >= 0) & (vi < vin)
        oku = (ui >= 0) & (ui < uin)
        oky = (yi >= 0) & (yi < hin)
        okx = (xi >= 0) & (xi < win)
        vi_ = jnp.clip(vi, 0, vin - 1)[:, None, None, None]  # V',1,1,1
        ui_ = jnp.clip(ui, 0, uin - 1)[None, :, None, None]
        yi_ = jnp.clip(yi, 0, hin - 1)[:, None, :, None]  # V',1,H',1
        xi_ = jnp.clip(xi, 0, win - 1)[None, :, None, :]  # 1,U',1,W'
        val = x[:, vi_, ui_, yi_, xi_]  # (N, V', U', H', W')
        ok = (
            okv[:, None, None, None]
            & oku[None, :, None, None]
            & oky[:, None, :, None]
            & okx[None, :, None, :]
        )
        return jnp.where(ok[None], val, pad_val)

    out = jnp.zeros((n, vout, uout, hout, wout), jnp.float32)
    for vi, vw in ((vf, vwf), (vc, vwc)):
        for ui, uw in ((uf, uwf), (uc, uwc)):
            for yi, yw in ((yf, ywf), (yc, ywc)):
                for xi, xw in ((xf, xwf), (xc, xwc)):
                    w = (
                        vw[:, None, None, None]
                        * uw[None, :, None, None]
                        * yw[:, None, :, None]
                        * xw[None, :, None, :]
                    )
                    out = out + w[None] * gather(vi, ui, yi, xi)
    return out
