"""Multi-chip scaling evidence beyond the driver dryrun (VERDICT r1 #10):
per-device batch math, sharding layouts, and gradient-sync equivalence at
n_devices in {1, 2, 8} on the virtual CPU mesh.

The equivalence test is the strongest statement the CPU mesh can make:
a DP-sharded train step over N devices must produce the SAME updated
parameters as the single-device step on the same global batch — i.e.
XLA's inserted psum is exactly the DDP all-reduce.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from spacecraft_pose_estimation_tpu.parallel import mesh as mesh_lib


def make_tiny_landmark_step():
    from spacecraft_pose_estimation_tpu.models.hrnet import HRNET_TINY, HRNet
    from spacecraft_pose_estimation_tpu.train.optim import build_optimizer
    from spacecraft_pose_estimation_tpu.train.state import TrainState, make_train_step

    model = HRNet(config=HRNET_TINY.with_joints(3))
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), train=False)
    # SGD keeps the equivalence theorem tight: the param delta is
    # lr * grad, so a 1e-6 cross-sharding grad difference stays 1e-6.
    # (Adam divides by sqrt(v): on near-zero first-step grads it
    # amplifies reduction-order noise to O(lr) sign flips.)
    state = TrainState.create(model, variables, build_optimizer("sgd", 1e-2))
    return model, state, make_train_step()


def landmark_batch(global_batch, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "image": rng.normal(size=(global_batch, 32, 32, 3)).astype(np.float32),
        "target": rng.uniform(0, 1, (global_batch, 8, 8, 3)).astype(np.float32),
        "target_weight": np.ones((global_batch, 3), np.float32),
    }


@pytest.mark.parametrize("n_devices", [1, 2, 8])
class TestDataParallelScaling:
    def test_batch_sharding_layout(self, n_devices):
        devices = jax.devices()[:n_devices]
        mesh = mesh_lib.make_mesh(devices)
        batch = landmark_batch(16)
        sharded = mesh_lib.shard_batch(batch, mesh)
        img = sharded["image"]
        # per-device shard = global/N on axis 0, full on the rest
        shard_shapes = {s.data.shape for s in img.addressable_shards}
        assert shard_shapes == {(16 // n_devices, 32, 32, 3)}
        assert len(img.addressable_shards) == n_devices
        # params replicate: every device holds the full array
        params = mesh_lib.replicate({"w": jnp.ones((4, 4))}, mesh)
        assert {s.data.shape for s in params["w"].addressable_shards} == {(4, 4)}

    def test_dp_step_matches_single_device(self, n_devices):
        """DP train step over the mesh == single-device step on the same
        global batch (gradient psum == DDP all-reduce)."""
        model, state0, step = make_tiny_landmark_step()
        batch = landmark_batch(16, seed=3)

        # single-device reference
        ref_state, ref_metrics = jax.jit(step)(state0, batch)

        mesh = mesh_lib.make_mesh(jax.devices()[:n_devices])
        sharded_state = mesh_lib.replicate(state0, mesh)
        sharded_batch = mesh_lib.shard_batch(batch, mesh)

        dp_state, dp_metrics = jax.jit(step)(sharded_state, sharded_batch)

        np.testing.assert_allclose(
            float(dp_metrics["loss"]), float(ref_metrics["loss"]), rtol=2e-5
        )
        ref_leaves = jax.tree_util.tree_leaves(ref_state.params)
        dp_leaves = jax.tree_util.tree_leaves(dp_state.params)
        for a, b in zip(ref_leaves, dp_leaves):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)


@pytest.mark.parametrize("n_devices", [1, 2, 8])
def test_detection_infer_scales_and_matches(n_devices):
    """The detection forward sharded over the data axis must produce the
    same boxes as unsharded execution, for every mesh size."""
    from spacecraft_pose_estimation_tpu.models.rcnn import RCNN_TINY, GeneralizedRCNN

    model = GeneralizedRCNN(config=RCNN_TINY)
    rng = np.random.default_rng(0)
    images = rng.uniform(0, 255, size=(8, 64, 64, 3)).astype(np.float32)
    variables = model.init({"params": jax.random.key(0)}, jnp.zeros((1, 64, 64, 3)),
                           train=False)

    infer = jax.jit(lambda v, x: model.apply(v, x, train=False))
    ref = infer(variables, jnp.asarray(images))

    mesh = mesh_lib.make_mesh(jax.devices()[:n_devices])
    v_rep = mesh_lib.replicate(variables, mesh)
    x_sh = jax.device_put(
        images, NamedSharding(mesh, P(mesh_lib.DATA_AXIS, None, None, None))
    )
    out = infer(v_rep, x_sh)

    # output batch axis stays sharded over the data axis
    np.testing.assert_allclose(
        np.asarray(out["boxes"]), np.asarray(ref["boxes"]), atol=1e-3
    )
    np.testing.assert_array_equal(np.asarray(out["valid"]), np.asarray(ref["valid"]))


def test_world_size_lr_scaling_rule():
    """SOLVER.REFERENCE_WORLD_SIZE auto-scaling (defaults.py:633
    auto_scale_workers): lr scales linearly with world size."""
    import dataclasses

    from spacecraft_pose_estimation_tpu import config as C

    cfg = C.get_preset("events")
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, lr=0.01, reference_world_size=8)
    )
    scaled = C.auto_scale_workers(cfg, world_size=16)
    assert scaled.train.lr == pytest.approx(0.02)
    assert scaled.train.reference_world_size == 16
    # no-op when the world matches the reference
    same = C.auto_scale_workers(cfg, world_size=8)
    assert same.train.lr == pytest.approx(0.01)
