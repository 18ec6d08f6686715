#!/usr/bin/env python
"""Import torch checkpoints into framework checkpoints.

Covers the reference's two pretrained entry points:
* HRNet ImageNet/pose state_dicts (hrnet_w32 .pth, PRETRAINED_LAYERS
  filtering) -> landmark TrainState checkpoint,
* detectron2 GeneralizedRCNN .pth state_dicts -> detector checkpoint,
* detectron2/Caffe2 model-zoo ``.pkl`` checkpoints (pickle+numpy, no torch;
  reference: detectron2/checkpoint/detection_checkpoint.py:15,
  c2_model_loading.py) -> detector checkpoint. ``.pkl`` inputs are
  auto-detected; ``--kind detectron2`` covers both.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spacecraft_pose_estimation_tpu.utils import maybe_force_platform

maybe_force_platform()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--torch-checkpoint", required=True)
    ap.add_argument("--kind", choices=["hrnet", "detectron2"], required=True)
    ap.add_argument("--model", default="pose_hrnet")
    ap.add_argument("--num-joints", type=int, default=17)
    ap.add_argument("--image-size", type=int, nargs=2, default=[512, 512])
    ap.add_argument("--output", required=True, help="checkpoint directory")
    ap.add_argument("--all-layers", action="store_true",
                    help="import every layer (PRETRAINED_LAYERS='*')")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from spacecraft_pose_estimation_tpu.train.checkpoint import CheckpointManager
    from spacecraft_pose_estimation_tpu.train.optim import build_optimizer
    from spacecraft_pose_estimation_tpu.utils import torch_import as TI

    is_pkl = args.torch_checkpoint.endswith(".pkl")
    if is_pkl:
        sd = None  # zoo pickle path reads directly below, torch-free
    else:
        import torch

        sd = torch.load(args.torch_checkpoint, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        if isinstance(sd, dict) and "model" in sd and all(
            not hasattr(v, "shape") for v in [sd.get("model")]
        ):
            sd = sd["model"]
        sd = {k.removeprefix("module."): v for k, v in sd.items()}

    if args.kind == "hrnet":
        if is_pkl:
            ap.error("--kind hrnet expects a torch .pth checkpoint, not .pkl")
        from spacecraft_pose_estimation_tpu.models import build_landmark_model
        from spacecraft_pose_estimation_tpu.train.state import TrainState

        model = build_landmark_model(args.model, args.num_joints)
        w, h = args.image_size
        variables = model.init(jax.random.key(0), jnp.zeros((1, h, w, 3)), train=True)
        layers = ("*",) if args.all_layers else (
            "conv1", "bn1", "conv2", "bn2", "layer1", "transition1", "stage2",
            "transition2", "stage3", "transition3", "stage4",
        )
        params, stats = TI.hrnet_torch_to_flax(sd, pretrained_layers=layers)
        merged = TI.merge_pretrained(variables, params, stats)
        state = TrainState.create(model, merged, build_optimizer("adam", 1e-3))
    else:
        from spacecraft_pose_estimation_tpu.models.rcnn import (
            FASTER_RCNN_X101_SPACECRAFT,
            GeneralizedRCNN,
        )
        from spacecraft_pose_estimation_tpu.train.detection_state import DetTrainState

        model = GeneralizedRCNN(config=FASTER_RCNN_X101_SPACECRAFT)
        w, h = args.image_size
        variables = model.init(
            {"params": jax.random.key(0)}, jnp.zeros((1, h, w, 3)), train=False
        )
        if is_pkl:
            from spacecraft_pose_estimation_tpu.utils.zoo_import import (
                zoo_pickle_to_flax,
            )

            params = zoo_pickle_to_flax(args.torch_checkpoint)
        else:
            params = TI.detectron2_torch_to_flax(sd)
        merged = TI.merge_pretrained(variables, params, {})
        state = DetTrainState.create(model, merged, build_optimizer("sgd", 1e-2))

    mgr = CheckpointManager(args.output)
    mgr.save(0, state, {"imported_from": args.torch_checkpoint})
    mgr.close()
    print(f"imported {args.torch_checkpoint} -> {args.output}")


if __name__ == "__main__":
    main()
