"""Adversarial DA step + ensemble eval tests."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from spacecraft_pose_estimation_tpu.models.discriminator import MultiScaleDiscriminator
from spacecraft_pose_estimation_tpu.models.hrnet import HRNET_TINY, HRNet
from spacecraft_pose_estimation_tpu.ops import heatmap as hm_ops
from spacecraft_pose_estimation_tpu.train.adversarial import DAState, make_da_train_step
from spacecraft_pose_estimation_tpu.train.ensemble import make_ensemble_apply, stack_variables
from spacecraft_pose_estimation_tpu.train.optim import build_optimizer


def build_da(num_joints=3, size=32):
    model = HRNet(config=dataclasses.replace(HRNET_TINY, num_joints=num_joints, head="cms"))
    x = jnp.zeros((1, size, size, 3))
    mvars = model.init(jax.random.key(0), x, train=True)
    disc = MultiScaleDiscriminator(stage_blocks=(1, 1, 1, 1))
    outs, _ = model.apply(mvars, x, train=True, mutable=["batch_stats"])
    dvars = disc.init(jax.random.key(1), *outs, train=True)
    state = DAState.create(
        model, mvars, disc, dvars,
        build_optimizer("adam", 1e-3), build_optimizer("adam", 1e-3),
    )
    return model, disc, state


def da_batch(num_joints=3, size=32, ns=2, nt=2):
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.normal(size=(ns, size, size, 3)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(size=(nt, size, size, 3)).astype(np.float32))
    joints = rng.uniform(4, size - 4, size=(ns, num_joints, 2)).astype(np.float32)
    vis = np.ones((ns, num_joints), np.float32)
    batch = {"source_image": src, "target_image": tgt}
    for name, div in [("target", 1), ("target2", 2), ("target3", 4), ("target4", 8)]:
        t, w = jax.vmap(
            lambda j, v: hm_ops.generate_target(
                j, v, (size, size), (size // div, size // div), 2.0
            )
        )(jnp.asarray(joints), jnp.asarray(vis))
        batch[name] = t
        batch["target_weight" + name.removeprefix("target")] = w
    return batch


class TestDATrainStep:
    @pytest.mark.slow
    def test_both_networks_update(self):
        model, disc, state = build_da()
        step = jax.jit(make_da_train_step(beta=2e-4, d_loss_mode=2))
        batch = da_batch()
        new_state, metrics = step(state, batch)
        for k in ("loss", "hm_loss", "d_loss", "adv_loss"):
            assert np.isfinite(float(metrics[k])), k
        g0 = jax.tree_util.tree_leaves(state.gen_params)[0]
        g1 = jax.tree_util.tree_leaves(new_state.gen_params)[0]
        assert not np.allclose(np.asarray(g0), np.asarray(g1))
        d0 = jax.tree_util.tree_leaves(state.disc_params)[0]
        d1 = jax.tree_util.tree_leaves(new_state.disc_params)[0]
        assert not np.allclose(np.asarray(d0), np.asarray(d1))

    @pytest.mark.slow
    def test_d_loss_decreases(self):
        model, disc, state = build_da()
        step = jax.jit(make_da_train_step(beta=0.0, d_loss_mode=1))
        batch = da_batch()
        d_losses = []
        for _ in range(12):
            state, m = step(state, batch)
            d_losses.append(float(m["d_loss"]))
        assert d_losses[-1] < d_losses[0]


class TestEnsemble:
    def test_mean_of_members(self):
        model = HRNet(config=dataclasses.replace(HRNET_TINY, num_joints=2))
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(1, 32, 32, 3)).astype(np.float32)
        )
        vs = [model.init(jax.random.key(i), x, train=False) for i in range(3)]
        stacked = stack_variables(vs)
        run = jax.jit(make_ensemble_apply(model))
        out = run(stacked, x)
        expect = np.mean(
            [np.asarray(model.apply(v, x, train=False)) for v in vs], axis=0
        )
        np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)
