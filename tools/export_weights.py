#!/usr/bin/env python
"""Export a trained landmark checkpoint to a reference-style torch
state_dict (.pth) — the inverse of tools/import_weights.py. Lets the
reference's own landmark_regression/tools/test.py run a TPU-trained
model for golden accuracy-parity checks.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spacecraft_pose_estimation_tpu.utils import maybe_force_platform

maybe_force_platform()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True, help="orbax checkpoint dir")
    ap.add_argument("--model", default="pose_hrnet")
    ap.add_argument("--num-joints", type=int, required=True)
    ap.add_argument("--image-size", type=int, nargs=2, default=[512, 512])
    ap.add_argument("--output", required=True, help="output .pth path")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch

    from spacecraft_pose_estimation_tpu.models import build_landmark_model
    from spacecraft_pose_estimation_tpu.train.checkpoint import CheckpointManager
    from spacecraft_pose_estimation_tpu.train.optim import build_optimizer
    from spacecraft_pose_estimation_tpu.train.state import TrainState
    from spacecraft_pose_estimation_tpu.utils.torch_export import hrnet_flax_to_torch

    model = build_landmark_model(args.model, args.num_joints)
    w, h = args.image_size
    variables = model.init(jax.random.key(0), jnp.zeros((1, h, w, 3)), train=True)
    st = TrainState.create(model, variables, build_optimizer("adam", 1e-3))
    restored = CheckpointManager(args.checkpoint).restore(st)
    if restored is None:
        raise FileNotFoundError(f"no checkpoint in {args.checkpoint}")
    st = restored[0]

    params = jax.tree_util.tree_map(np.asarray, dict(st.params))
    stats = jax.tree_util.tree_map(np.asarray, dict(st.batch_stats))
    sd = hrnet_flax_to_torch(params, stats)
    sd = {k: torch.as_tensor(np.ascontiguousarray(v)) for k, v in sd.items()}
    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    torch.save(sd, args.output)
    print(f"exported {len(sd)} tensors -> {args.output}")


if __name__ == "__main__":
    main()
