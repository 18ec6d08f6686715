"""tools/lazyconfig_train.py — the d2 lazyconfig_train_net.py analogue:
a Python LazyCall config file drives model/optimizer instantiation and a
real training loop (reference: detectron2/tools/lazyconfig_train_net.py)."""

import os
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

CONFIG = textwrap.dedent(
    """
    from spacecraft_pose_estimation_tpu.config import LazyCall as L
    from spacecraft_pose_estimation_tpu.models.hrnet import HRNet, HRNET_TINY
    import optax

    model = L(HRNet)(config=HRNET_TINY.with_joints(5))
    optimizer = L(optax.adam)(learning_rate=2e-3)
    train = dict(max_iter=30, batch_size=4, image_size=64, heatmap_size=16,
                 num_joints=5, log_period=10, seed=0)
    """
)


@pytest.mark.smoke
def test_lazyconfig_train_learns_and_overrides(tmp_path):
    import lazyconfig_train as lct

    cfg = tmp_path / "lazy_cfg.py"
    cfg.write_text(CONFIG)
    out = tmp_path / "out"
    final_loss = lct.main(
        [
            "--config-file", str(cfg),
            "max_iter", "30",
            "out_dir", str(out),
        ]
    )
    # the synthetic problem is learnable: loss must drop well below the
    # first-iteration scale (~heatmap MSE of random outputs)
    assert final_loss is not None and final_loss < 0.05
    # checkpoint written
    assert any(out.iterdir())


def test_apply_overrides_literals():
    import lazyconfig_train as lct

    out = lct.apply_overrides(
        {"max_iter": 1}, ["max_iter", "7", "out_dir", "x/y", "lr", "1e-3"]
    )
    assert out["max_iter"] == 7
    assert out["out_dir"] == "x/y"
    assert out["lr"] == 1e-3
