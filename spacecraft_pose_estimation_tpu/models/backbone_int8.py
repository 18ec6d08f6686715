"""Post-training int8 quantization of the detection backbone (ResNe(X)t).

The serving detector's dominant cost is the bf16 X101 backbone (~30 ms
of the 59 ms serving graph at b8 768^2 after MergedGroupConv). FrozenBN
makes PTQ here simpler than the HRNet case: every ConvFrozenBN is
conv -> y*mul+add (a fixed affine, models/resnet_backbone.FrozenBN), so
the affine folds directly into per-channel int8 weights and an f32
requant epilogue. Same scheme as models/hrnet_int8.py: symmetric
per-output-channel int8 weights, per-tensor activation scales calibrated
by abs-max, int32 accumulation, residual adds in f32 from int8 operands.

Grouped 3x3 convs keep the compact kernel layout and are expanded
block-diagonally to 128-wide merged groups at apply time (the int8
twin of MergedGroupConv — narrow groups are as catastrophic for int8
as for bf16).

The stem (C_in=3) stays bf16; stage outputs (res2..res5) dequantize to
bf16 for the FPN. Serving integration: GeneralizedRCNN accepts
``precomputed_feats`` so this backbone's features replace the in-graph
bf16 backbone without touching the rest of the detector.

Structure walked: models/resnet_backbone.ResNetBackbone.__call__
(d2 resnet.py:362-614 semantics).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from flax import linen as nn

from .resnet_backbone import RESNET_STAGE_BLOCKS, ResNetBackbone, ResNetConfig

Array = jax.Array
_EPS = 1e-5


def _structure(cfg: ResNetConfig):
    """Yields (stage_name, block_name, stride, has_shortcut) rows in
    execution order, mirroring ResNetBackbone.__call__."""
    stage_blocks = RESNET_STAGE_BLOCKS[cfg.depth]
    rows = []
    for si, n_blocks in enumerate(stage_blocks):
        stride = 1 if si == 0 else 2
        for bi in range(n_blocks):
            rows.append(
                (f"res{si + 2}", f"res{si + 2}_b{bi}", stride if bi == 0 else 1,
                 bi == 0)
            )
    return rows


def _fold_frozen(p):
    """ConvFrozenBN params {conv: {kernel}, norm: {scale,bias,mean,var}}
    -> (w_folded HWIO f32, bias f32)."""
    norm = p["norm"]
    mul = np.asarray(norm["scale"]) * (
        1.0 / np.sqrt(np.asarray(norm["var"]) + _EPS)
    )
    add = np.asarray(norm["bias"]) - np.asarray(norm["mean"]) * mul
    w = np.asarray(p["conv"]["kernel"], np.float32) * mul
    return w, add


def _backbone_variables(variables) -> dict:
    """Accept either a bare ResNetBackbone tree or a full
    GeneralizedRCNN tree (backbone params under scope 'backbone')."""
    params = variables["params"]
    if "stem" not in params and "backbone" in params:
        return {"params": params["backbone"]}
    return {"params": params}


def collect_backbone_scales(cfg: ResNetConfig, variables, calib_x) -> dict:
    """Per-site activation scales (amax/127) from a bf16 calibration
    forward with captured intermediates."""
    variables = _backbone_variables(variables)
    model = ResNetBackbone(cfg, dtype=jnp.bfloat16)
    _, inter = model.apply(
        variables, calib_x, capture_intermediates=True, mutable=["intermediates"]
    )
    inter = inter["intermediates"]

    def amax(node):
        out = node["__call__"][0]
        if isinstance(out, (tuple, list)):
            out = out[0]
        return max(float(jnp.max(jnp.abs(out.astype(jnp.float32)))), 1e-6) / 127.0

    scales = {"input": max(float(jnp.max(jnp.abs(calib_x))), 1e-6) / 127.0}
    scales["stem"] = amax(inter["stem"])
    for _stage, blk, _stride, has_sc in _structure(cfg):
        node = inter[blk]
        scales[f"{blk}/conv1"] = amax(node["conv1"])
        scales[f"{blk}/conv2"] = amax(node["conv2"])
        scales[f"{blk}/conv3"] = amax(node["conv3"])
        if has_sc:
            scales[f"{blk}/shortcut"] = amax(node["shortcut"])
        scales[blk] = amax(node)  # block output (post residual relu)
    return scales


def quantize_backbone(cfg: ResNetConfig, variables, calib_x) -> dict:
    """-> quantized tree: per-conv {w8, m, b, stride, groups}, add coeffs,
    feature dequant scales."""
    variables = _backbone_variables(variables)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    scales = collect_backbone_scales(cfg, variables, calib_x)

    q: dict = {"convs": {}, "blocks": {}, "stem": {}, "feature_scales": {}}

    def quant_conv(site, p, in_scale, groups=1):
        w, beta = _fold_frozen(p)
        s_w = np.maximum(np.abs(w).reshape(-1, w.shape[-1]).max(0), 1e-12) / 127.0
        w8 = np.clip(np.round(w / s_w), -127, 127).astype(np.int8)
        s_out = scales[site]
        # NOTE: no python ints in q — it must stay a clean jit pytree;
        # group counts are recomputed from cfg at apply time
        q["convs"][site] = {
            "w8": jnp.asarray(w8),
            "m": jnp.asarray(in_scale * s_w / s_out, jnp.float32),
            "b": jnp.asarray(beta / s_out, jnp.float32),
        }
        return s_out

    # stem stays bf16; its output is requantized to int8
    w_stem, b_stem = _fold_frozen(params["stem"])
    q["stem"] = {
        "w_bf16": jnp.asarray(w_stem, jnp.bfloat16),
        "m": jnp.asarray(np.full(w_stem.shape[-1], 1.0 / scales["stem"]), jnp.float32),
        "b": jnp.asarray(b_stem / scales["stem"], jnp.float32),
    }
    s_cur = scales["stem"]  # maxpool preserves the scale

    for stage, blk, _stride, has_sc in _structure(cfg):
        p = params[blk]
        s_in = s_cur
        s1 = quant_conv(f"{blk}/conv1", p["conv1"], s_in)
        s2 = quant_conv(f"{blk}/conv2", p["conv2"], s1, groups=cfg.groups)
        s3 = quant_conv(f"{blk}/conv3", p["conv3"], s2)
        if has_sc:
            ssc = quant_conv(f"{blk}/shortcut", p["shortcut"], s_in)
        else:
            ssc = s_in
        s_out = scales[blk]
        q["blocks"][blk] = {
            "coeffs": jnp.asarray([s3 / s_out, ssc / s_out], jnp.float32)
        }
        s_cur = s_out
        q["feature_scales"][stage] = s_cur
    return q


def _conv_i8(x, c, stride, groups=1):
    """int8 conv with requant epilogue; grouped kernels expand to
    128-wide merged groups (block-diagonal zeros — exact)."""
    w = c["w8"]
    g = groups
    k = w.shape[0]
    if g > 1:
        cgi = w.shape[2]
        cout = w.shape[3]
        cgo = cout // g
        m = min(g, max(1, 128 // cgi))
        while g % m:
            m -= 1
        if m > 1:
            w5 = w.reshape(k, k, cgi, g, cgo)
            sel = (
                (jnp.arange(g) % m)[:, None] == jnp.arange(m)[None, :]
            ).astype(jnp.int8)
            w = jnp.einsum("abcgd,gp->abpcgd", w5, sel).reshape(
                k, k, m * cgi, cout
            )
            g = g // m
    pad = (k - 1) // 2
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=g,
        preferred_element_type=jnp.int32,
    )
    return y.astype(jnp.float32) * c["m"] + c["b"]


def _requant(f):
    return jnp.clip(jnp.round(f), -127, 127).astype(jnp.int8)


def backbone_int8_apply(
    cfg: ResNetConfig, q: dict, x_norm, fold_residual: bool = False
) -> dict:
    """x_norm: (B, H, W, 3) f32 NORMALIZED images ((x - mean) / std, the
    same contract ResNetBackbone sees inside GeneralizedRCNN). Returns
    {res2..res5: bf16 features} for the FPN. ``cfg`` is static (jit with
    functools.partial or static_argnums); ``q`` is a plain pytree.

    fold_residual: conv3/shortcut epilogues feed the residual add as
    pre-round f32 (skips one int8 materialization per — see
    hrnet_int8.py; same closeness-not-bit-exact contract)."""

    y = jax.lax.conv_general_dilated(
        x_norm.astype(jnp.bfloat16), q["stem"]["w_bf16"], (2, 2),
        ((3, 3), (3, 3)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    f = jnp.maximum(y.astype(jnp.float32) * q["stem"]["m"] + q["stem"]["b"], 0.0)
    x = _requant(f)
    x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

    feats = {}
    for stage, blk, stride, has_sc in _structure(cfg):
        convs = q["convs"]
        s1, s3_ = (stride, 1) if cfg.stride_in_1x1 else (1, stride)
        h1 = _requant(jnp.maximum(_conv_i8(x, convs[f"{blk}/conv1"], s1), 0.0))
        h2 = _requant(jnp.maximum(_conv_i8(h1, convs[f"{blk}/conv2"], s3_, groups=cfg.groups), 0.0))
        coeffs = q["blocks"][blk]["coeffs"]
        f3 = _conv_i8(h2, convs[f"{blk}/conv3"], 1)
        if has_sc:
            fsc = _conv_i8(x, convs[f"{blk}/shortcut"], stride)
        else:
            fsc = x.astype(jnp.float32)
        if not fold_residual:
            f3 = _requant(f3).astype(jnp.float32)
            if has_sc:
                fsc = _requant(fsc).astype(jnp.float32)
        x = _requant(jnp.maximum(f3 * coeffs[0] + fsc * coeffs[1], 0.0))
        feats[stage] = x
    out = {}
    for stage in cfg.out_features:
        out[stage] = (
            feats[stage].astype(jnp.float32) * q["feature_scales"][stage]
        ).astype(jnp.bfloat16)
    return out
