"""Detectron2 state_dict -> detector param tree import test (synthetic
state_dict derived from our own init; checks mapping + shapes)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spacecraft_pose_estimation_tpu.models.rcnn import RCNN_TINY, GeneralizedRCNN
from spacecraft_pose_estimation_tpu.utils.torch_import import (
    detectron2_torch_to_flax,
    merge_pretrained,
)


def build_synthetic_sd(params):
    """Construct a d2-style state_dict from our initialised tree."""
    sd = {}

    def conv_t(k):
        return np.transpose(np.asarray(k), (3, 2, 0, 1))

    def emit_unit(prefix, node):
        sd[prefix + ".weight"] = conv_t(node["conv"]["kernel"])
        for ours, theirs in [("scale", "norm.weight"), ("bias", "norm.bias"),
                             ("mean", "norm.running_mean"), ("var", "norm.running_var")]:
            sd[prefix + "." + theirs] = np.asarray(node["norm"][ours])

    bb = params["backbone"]
    emit_unit("backbone.bottom_up.stem.conv1", bb["stem"])
    for name, node in bb.items():
        if not name.startswith("res"):
            continue
        s, i = name.removeprefix("res").split("_b")
        for unit in node:
            emit_unit(f"backbone.bottom_up.res{s}.{i}.{unit}", node[unit])
    for name, node in params["fpn"].items():
        if name.startswith("lateral_res"):
            l = name.removeprefix("lateral_res")
            sd[f"backbone.fpn_lateral{l}.weight"] = conv_t(node["kernel"])
            sd[f"backbone.fpn_lateral{l}.bias"] = np.asarray(node["bias"])
        elif name.startswith("output_p"):
            l = name.removeprefix("output_p")
            sd[f"backbone.fpn_output{l}.weight"] = conv_t(node["kernel"])
            sd[f"backbone.fpn_output{l}.bias"] = np.asarray(node["bias"])
    rh = params["rpn_head"]
    for ours, theirs in [("conv", "conv"), ("objectness", "objectness_logits"),
                         ("deltas", "anchor_deltas")]:
        sd[f"proposal_generator.rpn_head.{theirs}.weight"] = conv_t(rh[ours]["kernel"])
        sd[f"proposal_generator.rpn_head.{theirs}.bias"] = np.asarray(rh[ours]["bias"])
    bh = params["roi_heads"]["box_head"]
    for k in bh:
        kern = np.asarray(bh[k]["kernel"])
        if k == "fc1":
            # torch flattens pooled features NCHW: emulate d2's
            # FastRCNNConvFCHead weight layout (out, C*P*P) from our
            # NHWC-flatten kernel (P*P*C, out).
            p = 7
            c = kern.shape[0] // (p * p)
            out = kern.shape[1]
            sd[f"roi_heads.box_head.{k}.weight"] = (
                kern.reshape(p, p, c, out).transpose(3, 2, 0, 1).reshape(out, c * p * p)
            )
        else:
            sd[f"roi_heads.box_head.{k}.weight"] = kern.T
        sd[f"roi_heads.box_head.{k}.bias"] = np.asarray(bh[k]["bias"])
    pred = params["roi_heads"]["predictor"]
    for k in pred:
        sd[f"roi_heads.box_predictor.{k}.weight"] = np.asarray(pred[k]["kernel"]).T
        sd[f"roi_heads.box_predictor.{k}.bias"] = np.asarray(pred[k]["bias"])
    return sd


class TestD2Import:
    @pytest.mark.slow
    def test_roundtrip_identity(self):
        model = GeneralizedRCNN(config=RCNN_TINY)
        variables = model.init(
            {"params": jax.random.key(0), "sampling": jax.random.key(1)},
            jnp.zeros((1, 64, 64, 3)),
            train=False,
        )
        rng = np.random.default_rng(0)
        variables = jax.tree_util.tree_map(
            lambda x: x + rng.normal(0, 0.01, x.shape).astype(x.dtype), variables
        )
        params = jax.tree_util.tree_map(np.asarray, dict(variables["params"]))
        sd = build_synthetic_sd(params)
        assert len(sd) > 100

        imported = detectron2_torch_to_flax(sd)
        fresh = model.init(
            {"params": jax.random.key(2), "sampling": jax.random.key(3)},
            jnp.zeros((1, 64, 64, 3)),
            train=False,
        )
        merged = merge_pretrained(fresh, imported, {})
        for path, leaf in jax.tree_util.tree_leaves_with_path(variables["params"]):
            node = merged["params"]
            for p in path:
                node = node[p.key]
            np.testing.assert_allclose(
                np.asarray(node), np.asarray(leaf), atol=1e-6,
                err_msg="/".join(str(p.key) for p in path),
            )


def test_fc1_nchw_flatten_equivalence():
    """The imported fc1 must reproduce torch's NCHW-flatten matmul when our
    BoxHead flattens NHWC (ADVICE r1: plain transpose silently permuted
    fc1's input features)."""
    rng = np.random.default_rng(1)
    r_boxes, p, c, out = 3, 7, 5, 8
    pooled = rng.normal(size=(r_boxes, p, p, c)).astype(np.float32)
    w_torch = rng.normal(size=(out, c * p * p)).astype(np.float32)

    # torch: flatten NCHW then x @ W.T
    torch_out = pooled.transpose(0, 3, 1, 2).reshape(r_boxes, -1) @ w_torch.T

    imported = detectron2_torch_to_flax(
        {"roi_heads.box_head.fc1.weight": w_torch}, pooler_resolution=p
    )
    kernel = imported["roi_heads"]["box_head"]["fc1"]["kernel"]
    ours = pooled.reshape(r_boxes, -1) @ kernel
    np.testing.assert_allclose(ours, torch_out, rtol=1e-5, atol=1e-5)
