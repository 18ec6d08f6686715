"""Trainer/hooks/metrics/checkpoint/accuracy engine tests."""

import dataclasses
import itertools
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spacecraft_pose_estimation_tpu.models.hrnet import HRNET_TINY, HRNet
from spacecraft_pose_estimation_tpu.ops import heatmap as hm_ops
from spacecraft_pose_estimation_tpu.train.accuracy import pck_accuracy
from spacecraft_pose_estimation_tpu.train.checkpoint import CheckpointManager
from spacecraft_pose_estimation_tpu.train.metrics import (
    JSONWriter,
    MetricStorage,
    TerminalPrinter,
)
from spacecraft_pose_estimation_tpu.train.optim import build_optimizer, multistep_schedule
from spacecraft_pose_estimation_tpu.train.state import TrainState, make_train_step
from spacecraft_pose_estimation_tpu.train.trainer import (
    BestCheckpointer,
    EvalHook,
    IterationTimer,
    PeriodicCheckpointer,
    PeriodicWriter,
    Trainer,
)


def make_state():
    model = HRNet(config=dataclasses.replace(HRNET_TINY, num_joints=4))
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), train=True)
    tx = build_optimizer("adam", multistep_schedule(1e-3, [100], 0.1))
    return model, TrainState.create(model, variables, tx)


def make_batch(b=2, j=4):
    rng = np.random.default_rng(0)
    joints = rng.uniform(4, 28, size=(b, j, 2)).astype(np.float32)
    vis = np.ones((b, j), np.float32)
    tgt, tw = jax.vmap(lambda jt, v: hm_ops.generate_target(jt, v, (32, 32), (8, 8), 2.0))(
        jnp.asarray(joints), jnp.asarray(vis)
    )
    return {
        "image": jnp.asarray(rng.normal(size=(b, 32, 32, 3)).astype(np.float32)),
        "target": tgt,
        "target_weight": tw,
    }


class TestTrainStep:
    def test_loss_decreases_overfit(self):
        model, state = make_state()
        batch = make_batch()
        step = jax.jit(make_train_step())
        losses = []
        for _ in range(30):
            state, m = step(state, batch)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0] * 0.7, losses[:3] + losses[-3:]

    def test_schedule_drops_lr(self):
        sched = multistep_schedule(1.0, [10, 20], 0.1, warmup_steps=4, warmup_factor=0.0)
        assert float(sched(0)) == pytest.approx(0.0)
        assert float(sched(2)) == pytest.approx(0.5)
        assert float(sched(5)) == pytest.approx(1.0)
        assert float(sched(15)) == pytest.approx(0.1)
        assert float(sched(25)) == pytest.approx(0.01)


class TestTrainerLoop:
    def test_hooks_and_writers(self, tmp_path):
        model, state = make_state()
        step = jax.jit(make_train_step())
        batch = make_batch()
        storage = MetricStorage()
        json_path = str(tmp_path / "metrics.json")
        evals = []
        trainer = Trainer(
            step_fn=step,
            state=state,
            data_iter=itertools.repeat(batch),
            hooks=[
                IterationTimer(),
                PeriodicWriter([JSONWriter(json_path), TerminalPrinter(max_iter=6)], period=2),
                EvalHook(3, lambda t: evals.append(t.iteration) or {"eval_metric": 1.0}),
            ],
            storage=storage,
        )
        trainer.train(0, 6)
        assert trainer.iteration == 6
        assert os.path.exists(json_path)
        lines = open(json_path).read().strip().splitlines()
        assert len(lines) >= 3
        assert evals  # eval hook fired
        assert "time" in storage.latest()

    def test_checkpoint_roundtrip_and_resume(self, tmp_path):
        model, state = make_state()
        step = jax.jit(make_train_step())
        batch = make_batch()
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        for _ in range(3):
            state, _ = step(state, batch)
        mgr.save(2, state, {"epoch": 1})
        # fresh state, restore
        _, fresh = make_state()
        restored, meta, step_no = mgr.restore(fresh)
        assert step_no == 2
        assert int(restored.step) == int(state.step)
        p0 = jax.tree_util.tree_leaves(state.params)[0]
        r0 = jax.tree_util.tree_leaves(restored.params)[0]
        np.testing.assert_allclose(np.asarray(p0), np.asarray(r0))
        assert meta.get("epoch") == 1
        mgr.close()

    def test_best_checkpointer(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        assert mgr.save_best(1, 0.5)
        assert not mgr.save_best(2, 0.4)
        assert mgr.save_best(3, 0.6)
        assert mgr.best_perf() == pytest.approx(0.6)
        mgr.close()


class TestAccuracy:
    def test_perfect_prediction(self):
        rng = np.random.default_rng(1)
        joints = rng.uniform(10, 50, size=(3, 5, 2)).astype(np.float32)
        vis = np.ones((3, 5), np.float32)
        tgt, _ = jax.vmap(lambda j, v: hm_ops.generate_target(j, v, (64, 64), (64, 64), 2.0))(
            jnp.asarray(joints), jnp.asarray(vis)
        )
        acc, mean = pck_accuracy(tgt, tgt)
        assert float(mean) == pytest.approx(1.0)

    def test_shifted_prediction_fails(self):
        rng = np.random.default_rng(2)
        joints = rng.uniform(20, 40, size=(2, 4, 2)).astype(np.float32)
        vis = np.ones((2, 4), np.float32)
        mk = lambda jt: jax.vmap(
            lambda j, v: hm_ops.generate_target(j, v, (64, 64), (64, 64), 2.0)
        )(jnp.asarray(jt), jnp.asarray(vis))[0]
        tgt = mk(joints)
        pred = mk(joints + 15.0)  # shift >> threshold (6.4*0.5)
        _, mean = pck_accuracy(pred, tgt)
        assert float(mean) < 0.2
