"""Caffe2 zoo ``.pkl`` ingestion tests.

Two levels:
1. Name coverage: the full Caffe2 blob list of an X101-FPN zoo detector
   (deterministic given the architecture; grammar per reference
   c2_model_loading.py) maps into the d2 names our importer consumes.
2. End-to-end: a synthetic ``.pkl`` built from a real init (with C2 blob
   names, C2 layouts, background-class conventions, NCHW fc6 flatten)
   round-trips through zoo_pickle_to_flax + merge_pretrained exactly.
"""

import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spacecraft_pose_estimation_tpu.models.rcnn import RCNN_TINY, GeneralizedRCNN
from spacecraft_pose_estimation_tpu.utils.torch_import import merge_pretrained
from spacecraft_pose_estimation_tpu.utils.zoo_import import (
    c2_blob_to_d2_name,
    convert_c2_weights,
    qualify_rcnn_names,
    zoo_pickle_to_flax,
)


def c2_blob_names(stage_blocks):
    """Exact Caffe2 blob list for a ResNe(X)t-FPN Faster R-CNN zoo pickle."""
    names = ["conv1_w", "res_conv1_bn_s", "res_conv1_bn_b"]
    last_block = {}
    for stage, n_blocks in zip((2, 3, 4, 5), stage_blocks):
        last_block[stage] = n_blocks - 1
        for i in range(n_blocks):
            branches = ["branch2a", "branch2b", "branch2c"]
            if i == 0:
                branches.insert(0, "branch1")
            for br in branches:
                names += [
                    f"res{stage}_{i}_{br}_w",
                    f"res{stage}_{i}_{br}_bn_s",
                    f"res{stage}_{i}_{br}_bn_b",
                ]
    for stage in (2, 3, 4):
        names += [
            f"fpn_inner_res{stage}_{last_block[stage]}_sum_lateral_w",
            f"fpn_inner_res{stage}_{last_block[stage]}_sum_lateral_b",
        ]
    # topmost lateral has no "lateral" token in Caffe2 Detectron
    names += [
        f"fpn_inner_res5_{last_block[5]}_sum_w",
        f"fpn_inner_res5_{last_block[5]}_sum_b",
    ]
    for stage in (2, 3, 4, 5):
        names += [
            f"fpn_res{stage}_{last_block[stage]}_sum_w",
            f"fpn_res{stage}_{last_block[stage]}_sum_b",
        ]
    for head in ("conv_rpn_fpn2", "rpn_cls_logits_fpn2", "rpn_bbox_pred_fpn2"):
        names += [f"{head}_w", f"{head}_b"]
    for head in ("fc6", "fc7", "cls_score", "bbox_pred"):
        names += [f"{head}_w", f"{head}_b"]
    return names


EXPECTED_D2 = {
    "conv1_w": "stem.conv1.weight",
    "res_conv1_bn_s": "stem.conv1.norm.weight",
    "res4_22_branch2b_w": "res4.22.conv2.weight",
    "res2_0_branch1_bn_b": "res2.0.shortcut.norm.bias",
    "fpn_inner_res2_2_sum_lateral_w": "fpn_lateral2.weight",
    "fpn_inner_res5_2_sum_w": "fpn_lateral5.weight",
    "fpn_res4_22_sum_b": "fpn_output4.bias",
    "conv_rpn_fpn2_w": "proposal_generator.rpn_head.conv.weight",
    "rpn_cls_logits_fpn2_b": "proposal_generator.rpn_head.objectness_logits.bias",
    "rpn_bbox_pred_fpn2_w": "proposal_generator.rpn_head.anchor_deltas.weight",
    "fc6_w": "box_head.fc1.weight",
    "fc7_b": "box_head.fc2.bias",
    "cls_score_w": "cls_score.weight",
    "bbox_pred_b": "bbox_pred.bias",
}


def test_c2_name_grammar_spot_values():
    for blob, want in EXPECTED_D2.items():
        assert c2_blob_to_d2_name(blob) == want, blob


def test_x101_blob_list_full_coverage():
    """Every blob of the X101-FPN (3,4,23,3) zoo pickle must land on a name
    the flax importer's grammar consumes (after qualification)."""
    blobs = c2_blob_names((3, 4, 23, 3))
    # 33 blocks x 3 branches + 4 shortcuts = 103 convs x 3 blobs, +3 stem
    assert len(blobs) == 3 + (103 * 3) + 16 + 6 + 8
    weights = {b: np.zeros((8, 8, 1, 1), np.float32) for b in blobs}
    for b in blobs:  # fc/cls/bbox are 2-d; biases 1-d
        if b.endswith("_b") or "bn_" in b:
            weights[b] = np.zeros((8,), np.float32)
        elif b.startswith(("fc", "cls_score", "bbox_pred")):
            weights[b] = np.zeros((8, 49), np.float32)
    qualified = qualify_rcnn_names(convert_c2_weights(weights))

    import re

    patterns = [
        r"^backbone\.bottom_up\.stem\.conv1\.",
        r"^backbone\.bottom_up\.res\d\.\d+\.(conv\d|shortcut)\.",
        r"^backbone\.fpn_lateral\d\.",
        r"^backbone\.fpn_output\d\.",
        r"^proposal_generator\.rpn_head\.(conv|objectness_logits|anchor_deltas)\.",
        r"^roi_heads\.box_head\.fc\d\.",
        r"^roi_heads\.box_predictor\.(cls_score|bbox_pred)\.",
    ]
    unmatched = [
        k for k in qualified if not any(re.match(p, k) for p in patterns)
    ]
    assert not unmatched, unmatched


def build_c2_pickle(params, path):
    """Emit a Caffe2-named .pkl from our initialised tree (C2 layouts:
    OIHW convs, absorbed BN affine only, bg-first cls_score, bg rows in
    bbox_pred, NCHW-flatten fc6)."""
    rng = np.random.default_rng(7)
    blobs = {}

    def conv_t(k):
        return np.transpose(np.asarray(k), (3, 2, 0, 1))

    bb = params["backbone"]
    blobs["conv1_w"] = conv_t(bb["stem"]["conv"]["kernel"])
    blobs["res_conv1_bn_s"] = np.asarray(bb["stem"]["norm"]["scale"])
    blobs["res_conv1_bn_b"] = np.asarray(bb["stem"]["norm"]["bias"])
    br_map = {"conv1": "branch2a", "conv2": "branch2b", "conv3": "branch2c",
              "shortcut": "branch1"}
    for name, node in bb.items():
        if not name.startswith("res"):
            continue
        s, i = name.removeprefix("res").split("_b")
        for unit, c2br in br_map.items():
            if unit not in node:
                continue
            blobs[f"res{s}_{i}_{c2br}_w"] = conv_t(node[unit]["conv"]["kernel"])
            blobs[f"res{s}_{i}_{c2br}_bn_s"] = np.asarray(node[unit]["norm"]["scale"])
            blobs[f"res{s}_{i}_{c2br}_bn_b"] = np.asarray(node[unit]["norm"]["bias"])
    for name, node in params["fpn"].items():
        stage = name[-1]
        if name.startswith("lateral_res"):
            tag = (f"fpn_inner_res{stage}_0_sum_lateral"
                   if stage != "5" else f"fpn_inner_res{stage}_0_sum")
        else:
            tag = f"fpn_res{stage}_0_sum"
        blobs[f"{tag}_w"] = conv_t(node["kernel"])
        blobs[f"{tag}_b"] = np.asarray(node["bias"])
    rh = params["rpn_head"]
    for ours, c2 in [("conv", "conv_rpn_fpn2"),
                     ("objectness", "rpn_cls_logits_fpn2"),
                     ("deltas", "rpn_bbox_pred_fpn2")]:
        blobs[f"{c2}_w"] = conv_t(rh[ours]["kernel"])
        blobs[f"{c2}_b"] = np.asarray(rh[ours]["bias"])
    bh = params["roi_heads"]["box_head"]
    fc1 = np.asarray(bh["fc1"]["kernel"])  # (P*P*C, out) NHWC flatten
    p = 7
    c = fc1.shape[0] // (p * p)
    blobs["fc6_w"] = (
        fc1.reshape(p, p, c, -1).transpose(3, 2, 0, 1).reshape(fc1.shape[1], -1)
    )
    blobs["fc6_b"] = np.asarray(bh["fc1"]["bias"])
    blobs["fc7_w"] = np.asarray(bh["fc2"]["kernel"]).T
    blobs["fc7_b"] = np.asarray(bh["fc2"]["bias"])
    pred = params["roi_heads"]["predictor"]
    cls_k = np.asarray(pred["cls_score"]["kernel"]).T  # (num_cls+1, in), bg last
    blobs["cls_score_w"] = np.concatenate([cls_k[-1:], cls_k[:-1]])  # bg first
    cls_b = np.asarray(pred["cls_score"]["bias"])
    blobs["cls_score_b"] = np.concatenate([cls_b[-1:], cls_b[:-1]])
    bbox_k = np.asarray(pred["bbox_pred"]["kernel"]).T
    blobs["bbox_pred_w"] = np.concatenate(
        [rng.normal(size=(4, bbox_k.shape[1])).astype(np.float32), bbox_k]
    )
    bbox_b = np.asarray(pred["bbox_pred"]["bias"])
    blobs["bbox_pred_b"] = np.concatenate(
        [rng.normal(size=4).astype(np.float32), bbox_b]
    )
    with open(path, "wb") as f:
        pickle.dump(
            {"model": blobs, "__author__": "Caffe2", "matching_heuristics": True}, f
        )


def test_zoo_pickle_roundtrip(tmp_path):
    model = GeneralizedRCNN(config=RCNN_TINY)
    variables = model.init(
        {"params": jax.random.key(0), "sampling": jax.random.key(1)},
        jnp.zeros((1, 64, 64, 3)),
        train=False,
    )
    rng = np.random.default_rng(0)
    variables = jax.tree_util.tree_map(
        lambda x: x + rng.normal(0, 0.02, x.shape).astype(x.dtype), variables
    )
    params = jax.tree_util.tree_map(np.asarray, dict(variables["params"]))
    pkl = tmp_path / "model_final.pkl"
    build_c2_pickle(params, pkl)

    imported = zoo_pickle_to_flax(str(pkl))
    fresh = model.init(
        {"params": jax.random.key(2), "sampling": jax.random.key(3)},
        jnp.zeros((1, 64, 64, 3)),
        train=False,
    )
    merged = merge_pretrained(fresh, imported, {})

    checked = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(variables["params"]):
        keys = [str(p.key) for p in path]
        if keys[-1] in ("mean", "var"):  # absorbed BN: stats not in C2 pkls
            continue
        node = merged["params"]
        for k in keys:
            node = node[k]
        np.testing.assert_allclose(
            np.asarray(node), np.asarray(leaf), atol=1e-6, err_msg="/".join(keys)
        )
        checked += 1
    assert checked > 100
