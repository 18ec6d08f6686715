"""int8 PTQ detection backbone: fidelity vs the bf16 backbone and
integration through GeneralizedRCNN(precomputed_feats=...)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spacecraft_pose_estimation_tpu.models.backbone_int8 import (
    backbone_int8_apply,
    quantize_backbone,
)
from spacecraft_pose_estimation_tpu.models.resnet_backbone import (
    RESNET_TINY,
    ResNetBackbone,
)

TINY_X = dataclasses.replace(RESNET_TINY, groups=4, width_per_group=4,
                             stride_in_1x1=False)


def setup_backbone(cfg, seed=0):
    rng = np.random.default_rng(seed)
    model = ResNetBackbone(cfg, dtype=jnp.bfloat16)
    variables = model.init(jax.random.key(seed), jnp.zeros((1, 64, 64, 3)))
    # non-trivial frozen-BN stats and weights
    variables = jax.tree_util.tree_map(np.asarray, variables)

    def perturb(path, x):
        name = path[-1].key
        if name == "var":
            return (0.5 + rng.uniform(0.1, 1.5, x.shape)).astype(x.dtype)
        if name == "mean":
            return rng.normal(0, 0.2, x.shape).astype(x.dtype)
        if name in ("kernel", "scale"):
            return (x + rng.normal(0, 0.03, x.shape)).astype(x.dtype)
        if name == "bias":
            return rng.normal(0, 0.05, x.shape).astype(x.dtype)
        return x

    variables = jax.tree_util.tree_map_with_path(perturb, variables)
    calib = jnp.asarray(rng.normal(0, 1.0, (2, 64, 64, 3)), jnp.float32)
    return model, variables, calib, rng


@pytest.mark.parametrize("cfg", [RESNET_TINY, TINY_X], ids=["plain", "grouped"])
def test_int8_backbone_matches_bf16(cfg):
    model, variables, calib, rng = setup_backbone(cfg)
    q = quantize_backbone(cfg, variables, calib)

    x = jnp.asarray(rng.normal(0, 1.0, (2, 64, 64, 3)), jnp.float32)
    ref = model.apply(variables, x)
    out = backbone_int8_apply(cfg, q, x)

    assert set(out.keys()) == set(ref.keys())
    for k in ref:
        a = np.asarray(ref[k], np.float32)
        b = np.asarray(out[k], np.float32)
        assert a.shape == b.shape
        denom = np.abs(a).max() + 1e-6
        rel = np.abs(a - b).max() / denom
        # PTQ noise accumulates across the depth; a few percent of the
        # dynamic range is the expected envelope
        assert rel < 0.15, (k, rel)
        # correlation must be essentially 1
        corr = np.corrcoef(a.reshape(-1), b.reshape(-1))[0, 1]
        assert corr > 0.98, (k, corr)


def test_precomputed_feats_integration():
    """GeneralizedRCNN(precomputed_feats=int8 features) produces
    detections close to the in-graph bf16 backbone path."""
    from spacecraft_pose_estimation_tpu.models.rcnn import RCNN_TINY, GeneralizedRCNN

    model = GeneralizedRCNN(config=RCNN_TINY)
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 40, (1, 64, 64, 3)).astype(np.float32)
    img[0, 20:44, 16:48] += 180.0
    variables = model.init(
        {"params": jax.random.key(0)}, jnp.zeros((1, 64, 64, 3)), train=False
    )

    ref = model.apply(variables, jnp.asarray(img), train=False)

    # int8 backbone over the same normalized input
    mean = jnp.asarray(model.config.pixel_mean, jnp.float32)
    std = jnp.asarray(model.config.pixel_std, jnp.float32)
    x_norm = (jnp.asarray(img) - mean) / std
    bvars = {"params": variables["params"]["backbone"]}
    q = quantize_backbone(RCNN_TINY.backbone, bvars, x_norm)
    feats = backbone_int8_apply(RCNN_TINY.backbone, q, x_norm)

    out = model.apply(
        variables, jnp.asarray(img), train=False, precomputed_feats=feats
    )
    # the top box must stay essentially in place
    ref_top = np.asarray(ref["boxes"])[0, 0]
    out_top = np.asarray(out["boxes"])[0, 0]
    np.testing.assert_allclose(out_top, ref_top, atol=3.0)


@pytest.mark.parametrize("cfg", [RESNET_TINY, TINY_X], ids=["plain", "grouped"])
def test_fold_residual_close_to_walk(cfg):
    """fold_residual (pre-round f32 conv3/shortcut into the residual add)
    stays within quantization noise of the standard walk and at least as
    faithful to bf16."""
    model, variables, calib, rng = setup_backbone(cfg, seed=1)
    q = quantize_backbone(cfg, variables, calib)
    x = jnp.asarray(rng.normal(0, 1.0, (2, 64, 64, 3)), jnp.float32)
    ref = model.apply(variables, x)
    walk = backbone_int8_apply(cfg, q, x)
    fold = backbone_int8_apply(cfg, q, x, fold_residual=True)
    for k in ref:
        a = np.asarray(ref[k], np.float32)
        w = np.asarray(walk[k], np.float32)
        f = np.asarray(fold[k], np.float32)
        denom = np.abs(a).max() + 1e-6
        assert np.abs(f - a).max() / denom < 0.15, k
        assert np.corrcoef(f.reshape(-1), a.reshape(-1))[0, 1] > 0.98, k
        assert np.abs(f - w).max() / denom < 0.1, k
        assert np.corrcoef(f.reshape(-1), w.reshape(-1))[0, 1] > 0.995, k
