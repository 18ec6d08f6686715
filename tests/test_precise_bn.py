"""PreciseBN stat recomputation + multichip dryrun (incl. detector)."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from spacecraft_pose_estimation_tpu.models.hrnet import HRNET_TINY, HRNet
from spacecraft_pose_estimation_tpu.train.optim import build_optimizer
from spacecraft_pose_estimation_tpu.train.state import TrainState
from spacecraft_pose_estimation_tpu.train.trainer import recompute_batch_stats


class TestPreciseBN:
    def test_recovers_data_moments(self):
        model = HRNet(config=dataclasses.replace(HRNET_TINY, num_joints=2))
        v = model.init(jax.random.key(0), jnp.zeros((4, 32, 32, 3)), train=True)
        state = TrainState.create(model, v, build_optimizer("adam", 1e-3))
        rng = np.random.default_rng(0)
        # constant-statistics input stream
        batches = [
            {"image": jnp.asarray(rng.normal(2.0, 3.0, (4, 32, 32, 3)).astype(np.float32))}
            for _ in range(4)
        ]
        new_state = recompute_batch_stats(state, batches)
        # stem1 BN mean over raw conv outputs should be far from the
        # zero-init running mean and consistent across recomputation
        m0 = np.asarray(
            jax.tree_util.tree_leaves(state.batch_stats["stem1"]["bn"]["mean"])[0]
        )
        m1 = np.asarray(
            jax.tree_util.tree_leaves(new_state.batch_stats["stem1"]["bn"]["mean"])[0]
        )
        assert not np.allclose(m0, m1)
        # recomputing again from the updated state gives ~the same values
        # (raw moments don't depend on the stored running stats)
        new_state2 = recompute_batch_stats(new_state, batches)
        m2 = np.asarray(
            jax.tree_util.tree_leaves(new_state2.batch_stats["stem1"]["bn"]["mean"])[0]
        )
        np.testing.assert_allclose(m1, m2, rtol=1e-4, atol=1e-5)


class TestDryrunWithDetector:
    @pytest.mark.slow
    def test_dryrun_8_devices_covers_both_models(self, capsys):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)
        out = capsys.readouterr().out
        assert "landmark step ok" in out
        assert "detector step ok" in out
