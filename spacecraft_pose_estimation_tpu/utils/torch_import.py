"""Torch checkpoint import: HRNet state_dicts -> our Flax param trees.

The reference initialises its trunks from torch checkpoints — ImageNet
``hrnet_w32`` for the landmark nets (pose_hrnet.py:462-492, filtered by
PRETRAINED_LAYERS) and Caffe2 `.pkl` zoo weights for the detector
(checkpoint/c2_model_loading.py). This module provides the HRNet-family
mapping; conv kernels transpose OIHW -> HWIO, BN splits into params
(scale/bias) + batch_stats (mean/var).

Torch name grammar (lib/models/pose_hrnet.py):
  conv1/bn1/conv2/bn2                       -> stem1/stem2
  layer1.{i}.conv{k}|bn{k}|downsample.{0,1} -> layer1/block{i}/conv{k}|down
  transition{s}.{i}(.{j}).{0,1}             -> transition{s}/adapt{i}|new{i}_{j}
  stage{s}.{m}.branches.{b}.{i}.*           -> stage{s}_m{m}/branch{b}/block{i}
  stage{s}.{m}.fuse_layers.{i}.{j}(.{k}).*  -> stage{s}_m{m}/fuse/up{i}_{j}|down{i}_{j}_{k}
  final_layer                               -> final_layer
"""

from __future__ import annotations

import re
from typing import Any

import numpy as np


def _set(tree: dict, path: list[str], leaf: str, value: np.ndarray) -> None:
    node = tree
    for p in path:
        node = node.setdefault(p, {})
    node[leaf] = value


def _convbn_leaves(torch_key_tail: str, value: np.ndarray):
    """Map one torch leaf inside a conv+bn unit to (flax subpath, leaf)."""
    v = value
    if torch_key_tail == "weight" and v.ndim == 4:
        return ["conv"], "kernel", v.transpose(2, 3, 1, 0)  # OIHW -> HWIO
    if torch_key_tail == "weight":
        return ["bn"], "scale", v
    if torch_key_tail == "bias":
        return ["bn"], "bias", v
    if torch_key_tail == "running_mean":
        return ["bn"], "mean", v
    if torch_key_tail == "running_var":
        return ["bn"], "var", v
    return None


def hrnet_torch_to_flax(
    state_dict: dict[str, Any],
    pretrained_layers: tuple[str, ...] = (
        "conv1", "bn1", "conv2", "bn2", "layer1", "transition1", "stage2",
        "transition2", "stage3", "transition3", "stage4",
    ),
) -> tuple[dict, dict]:
    """Returns (params, batch_stats) partial trees to merge over an
    initialised model (the PRETRAINED_LAYERS filter semantics)."""
    params: dict = {}
    stats: dict = {}

    def put(path, kind, leaf, value):
        # kind: conv kernel / bn affine go to params; bn stats to batch_stats
        if leaf in ("mean", "var"):
            _set(stats, path, leaf, value)
        else:
            _set(params, path, leaf, value)

    def convbn(path_prefix, tail, v):
        m = _convbn_leaves(tail, np.asarray(v))
        if m is None:
            return
        sub, leaf, vv = m
        put(path_prefix + sub, None, leaf, vv)

    for key, value in state_dict.items():
        value = _to_numpy(value)
        root = key.split(".")[0]
        if pretrained_layers and root not in pretrained_layers and pretrained_layers[0] != "*":
            continue

        # stem: conv1/bn1 -> stem1, conv2/bn2 -> stem2
        m = re.match(r"(conv|bn)([12])\.(.+)", key)
        if m:
            unit = f"stem{m.group(2)}"
            convbn([unit], m.group(3), value)
            continue

        # layer1.{i}.(conv{k}|bn{k}|downsample.{0|1}).tail
        m = re.match(r"layer1\.(\d+)\.(.+)", key)
        if m:
            i, rest = int(m.group(1)), m.group(2)
            base = ["layer1", f"block{i}"]
            _block_leaf(base, rest, value, put)
            continue

        # transition{s}.{i}[.{j}].{0|1}.tail
        m = re.match(r"transition(\d)\.(\d+)\.(.+)", key)
        if m:
            s, i, rest = m.group(1), int(m.group(2)), m.group(3)
            # chains for new branches are Sequential(Sequential(conv, bn, relu))
            m2 = re.match(r"(\d+)\.(\d+)\.(.+)", rest)
            if m2:
                j, tail = int(m2.group(1)), m2.group(3)
                convbn([f"transition{s}", f"new{i}_{j}"], tail, value)
                continue
            m2 = re.match(r"(\d+)\.(.+)", rest)
            if m2:
                unit, tail = int(m2.group(1)), m2.group(2)
                convbn([f"transition{s}", f"adapt{i}"], tail, value)
                continue
            continue

        # stage{s}.{m}.branches.{b}.{i}.tail
        m = re.match(r"stage(\d)\.(\d+)\.branches\.(\d+)\.(\d+)\.(.+)", key)
        if m:
            s, mod, b, i, rest = m.groups()
            base = [f"stage{s}_m{mod}", f"branch{b}", f"block{i}"]
            _block_leaf(base, rest, value, put)
            continue

        # stage{s}.{m}.fuse_layers.{i}.{j}.( {k}.{unit} | {unit} ).tail
        m = re.match(r"stage(\d)\.(\d+)\.fuse_layers\.(\d+)\.(\d+)\.(.+)", key)
        if m:
            s, mod, i, j, rest = m.groups()
            i, j = int(i), int(j)
            base = [f"stage{s}_m{mod}", "fuse"]
            if j > i:
                # Sequential(conv, bn, upsample): rest = {0|1}.tail
                m2 = re.match(r"([01])\.(.+)", rest)
                convbn(base + [f"up{i}_{j}"], m2.group(2), value)
            else:
                # chain of k: rest = {k}.{0|1}.tail
                m2 = re.match(r"(\d+)\.([01])\.(.+)", rest)
                k, tail = int(m2.group(1)), m2.group(3)
                convbn(base + [f"down{i}_{j}_{k}"], tail, value)
            continue

        # final_layer.{weight|bias}
        m = re.match(r"final_layer\.(.+)", key)
        if m:
            tail = m.group(1)
            if tail == "weight":
                _set(params, ["final_layer"], "kernel", np.asarray(value).transpose(2, 3, 1, 0))
            elif tail == "bias":
                _set(params, ["final_layer"], "bias", np.asarray(value))
            continue

        # CMS heads (hrnet_cms.py:353-420: final_layer{N}_equal_to_image;
        # hrnet_cms_384.py:353-412: final_layer{N}_4x):
        #   .0 = ConvTranspose2d -> head{i}/deconv
        #   .1 = Conv2d          -> head{i}/conv
        m = re.match(r"final_layer(\d?)_(?:equal_to_image|4x)\.([01])\.(weight|bias)", key)
        if m:
            idx = int(m.group(1)) - 1 if m.group(1) else 0
            unit = "deconv" if m.group(2) == "0" else "conv"
            v = np.asarray(value)
            if m.group(3) == "bias":
                _set(params, [f"head{idx}", unit], "bias", v)
            elif unit == "deconv":
                # torch ConvTranspose2d weight is (in, out, kh, kw) and is
                # applied in flipped orientation relative to XLA's
                # conv_transpose — flip spatially, then to (kh, kw, in, out).
                _set(params, [f"head{idx}", unit], "kernel",
                     v[:, :, ::-1, ::-1].transpose(2, 3, 0, 1))
            else:
                _set(params, [f"head{idx}", unit], "kernel", v.transpose(2, 3, 1, 0))
            continue

    return params, stats


def _block_leaf(base, rest, value, put):
    """BasicBlock/Bottleneck member: conv{k}|bn{k}|downsample.{0|1}."""
    m = re.match(r"conv(\d)\.(.+)", rest)
    if m:
        put(base + [f"conv{m.group(1)}", "conv"], None, "kernel",
            np.asarray(value).transpose(2, 3, 1, 0))
        return
    m = re.match(r"bn(\d)\.(.+)", rest)
    if m:
        k, tail = m.group(1), m.group(2)
        leaf = {"weight": "scale", "bias": "bias", "running_mean": "mean",
                "running_var": "var"}.get(tail)
        if leaf:
            put(base + [f"conv{k}", "bn"], None, leaf, np.asarray(value))
        return
    m = re.match(r"downsample\.0\.(.+)", rest)
    if m and m.group(1) == "weight":
        put(base + ["down", "conv"], None, "kernel", np.asarray(value).transpose(2, 3, 1, 0))
        return
    m = re.match(r"downsample\.1\.(.+)", rest)
    if m:
        leaf = {"weight": "scale", "bias": "bias", "running_mean": "mean",
                "running_var": "var"}.get(m.group(1))
        if leaf:
            put(base + ["down", "bn"], None, leaf, np.asarray(value))


def _to_numpy(v):
    if hasattr(v, "detach"):
        return v.detach().cpu().numpy()
    return np.asarray(v)


# ---------------------------------------------------------------------------
# Detectron2 GeneralizedRCNN state_dict -> our detector tree
# ---------------------------------------------------------------------------


def detectron2_torch_to_flax(
    state_dict: dict[str, Any], pooler_resolution: int = 7
) -> dict:
    """Map a detectron2 GeneralizedRCNN ``model.state_dict()`` (torch
    format, FrozenBN as ``.norm.{weight,bias,running_mean,running_var}``)
    onto our rcnn param tree. Returns a partial params tree for
    `merge_pretrained` (FrozenBN stats live in params here).

    Name grammar:
      backbone.bottom_up.stem.conv1.*            -> backbone/stem
      backbone.bottom_up.res{s}.{i}.conv{k}.*    -> backbone/res{s}_b{i}/conv{k}
      backbone.bottom_up.res{s}.{i}.shortcut.*   -> backbone/res{s}_b{i}/shortcut
      backbone.fpn_lateral{l}.*                  -> fpn/lateral_res{l}
      backbone.fpn_output{l}.*                   -> fpn/output_p{l}
      proposal_generator.rpn_head.{conv|objectness_logits|anchor_deltas}
                                                 -> rpn_head/{conv|objectness|deltas}
      roi_heads.box_head.fc{k}.*                 -> roi_heads/box_head/fc{k}
      roi_heads.box_predictor.{cls_score|bbox_pred}
                                                 -> roi_heads/predictor/...
    """
    params: dict = {}

    def put(path, leaf, v):
        _set(params, path, leaf, v)

    def conv_unit(path_prefix, tail, v):
        v = np.asarray(v)
        if tail == "weight" and v.ndim == 4:
            put(path_prefix + ["conv"], "kernel", v.transpose(2, 3, 1, 0))
        elif tail == "norm.weight":
            put(path_prefix + ["norm"], "scale", v)
        elif tail == "norm.bias":
            put(path_prefix + ["norm"], "bias", v)
        elif tail == "norm.running_mean":
            put(path_prefix + ["norm"], "mean", v)
        elif tail == "norm.running_var":
            put(path_prefix + ["norm"], "var", v)

    def plain_conv(path, tail, v):
        v = np.asarray(v)
        if tail == "weight":
            put(path, "kernel", v.transpose(2, 3, 1, 0))
        elif tail == "bias":
            put(path, "bias", v)

    def dense(path, tail, v, flattens_pooled=False):
        v = np.asarray(v)
        if tail == "weight":
            if flattens_pooled:
                # d2's FastRCNNConvFCHead flattens pooled features in NCHW
                # (C*P*P) order (box_head.py: torch.flatten over NCHW); our
                # BoxHead flattens NHWC (P*P*C) (models/roi_heads.py:63), so
                # the first fc's input axis must be permuted, not just
                # transposed.
                out_dim, in_dim = v.shape
                p = pooler_resolution
                c = in_dim // (p * p)
                if c * p * p == in_dim:
                    v = (
                        v.reshape(out_dim, c, p, p)
                        .transpose(2, 3, 1, 0)
                        .reshape(p * p * c, out_dim)
                    )
                    put(path, "kernel", v)
                    return
            put(path, "kernel", v.T)
        elif tail == "bias":
            put(path, "bias", v)

    for key, value in state_dict.items():
        value = _to_numpy(value)
        m = re.match(r"backbone\.bottom_up\.stem\.conv1\.(.+)", key)
        if m:
            conv_unit(["backbone", "stem"], m.group(1), value)
            continue
        m = re.match(r"backbone\.bottom_up\.res(\d)\.(\d+)\.(conv\d|shortcut)\.(.+)", key)
        if m:
            s, i, unit, tail = m.groups()
            conv_unit(["backbone", f"res{s}_b{i}", unit], tail, value)
            continue
        m = re.match(r"backbone\.fpn_lateral(\d)\.(.+)", key)
        if m:
            plain_conv(["fpn", f"lateral_res{m.group(1)}"], m.group(2), value)
            continue
        m = re.match(r"backbone\.fpn_output(\d)\.(.+)", key)
        if m:
            plain_conv(["fpn", f"output_p{m.group(1)}"], m.group(2), value)
            continue
        m = re.match(r"proposal_generator\.rpn_head\.conv\.(.+)", key)
        if m:
            plain_conv(["rpn_head", "conv"], m.group(1), value)
            continue
        m = re.match(r"proposal_generator\.rpn_head\.objectness_logits\.(.+)", key)
        if m:
            plain_conv(["rpn_head", "objectness"], m.group(1), value)
            continue
        m = re.match(r"proposal_generator\.rpn_head\.anchor_deltas\.(.+)", key)
        if m:
            plain_conv(["rpn_head", "deltas"], m.group(1), value)
            continue
        m = re.match(r"roi_heads\.box_head\.fc(\d)\.(.+)", key)
        if m:
            dense(
                ["roi_heads", "box_head", f"fc{m.group(1)}"],
                m.group(2),
                value,
                flattens_pooled=(m.group(1) == "1"),
            )
            continue
        m = re.match(r"roi_heads\.box_predictor\.(cls_score|bbox_pred)\.(.+)", key)
        if m:
            dense(["roi_heads", "predictor", m.group(1)], m.group(2), value)
            continue

    return params


def merge_pretrained(variables: dict, params: dict, stats: dict) -> dict:
    """Merge imported subtrees over initialised variables, verifying
    shapes; unknown/missing keys are reported and skipped."""
    import jax

    out_params = jax.tree_util.tree_map(lambda x: x, dict(variables["params"]))
    out_stats = jax.tree_util.tree_map(lambda x: x, dict(variables.get("batch_stats", {})))
    skipped: list[str] = []

    def merge_into(dst, src, path=""):
        for k, v in src.items():
            p = f"{path}/{k}"
            if isinstance(v, dict):
                if k not in dst:
                    skipped.append(p)
                    continue
                merge_into(dst[k], v, p)
            else:
                if k not in dst or tuple(dst[k].shape) != tuple(v.shape):
                    skipped.append(p)
                    continue
                dst[k] = v.astype(np.asarray(dst[k]).dtype)

    merge_into(out_params, params)
    merge_into(out_stats, stats)
    result = dict(variables)
    result["params"] = out_params
    if out_stats:
        result["batch_stats"] = out_stats
    if skipped:
        import logging

        logging.getLogger(__name__).info(
            "weight import skipped %d leaves (first: %s)", len(skipped), skipped[:5]
        )
    return result
