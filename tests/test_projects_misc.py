"""TridentNet, PointSup, Rethinking-BN, TensorMask projects: torch and
brute-force oracles."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from spacecraft_pose_estimation_tpu.projects import pointsup as PS
from spacecraft_pose_estimation_tpu.projects import rethinking_bn as RB
from spacecraft_pose_estimation_tpu.projects import tensormask as TM
from spacecraft_pose_estimation_tpu.projects import tridentnet as TN
from spacecraft_pose_estimation_tpu.projects import point_rend as PR

pytestmark = pytest.mark.smoke


class TestTridentConv:
    def test_matches_torch_per_branch_shared_weight(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 9, 9, 4)).astype(np.float32)
        conv = TN.TridentConv(features=6, dilations=(1, 2, 3))
        xs = jnp.broadcast_to(jnp.asarray(x)[None], (3,) + x.shape)
        vs = conv.init(jax.random.key(0), xs)
        out = np.asarray(conv.apply(vs, xs))  # (3, 2, 9, 9, 6)
        w = np.asarray(vs["params"]["kernel"])  # HWIO
        wt = torch.from_numpy(w.transpose(3, 2, 0, 1))  # OIHW
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        for bi, d in enumerate((1, 2, 3)):
            ref = F.conv2d(xt, wt, None, 1, d, d).numpy().transpose(0, 2, 3, 1)
            np.testing.assert_allclose(out[bi], ref, atol=1e-4)

    def test_single_branch_inference(self):
        conv = TN.TridentConv(features=6, dilations=(1, 2, 3))
        x = jnp.ones((3, 1, 8, 8, 4))
        vs = conv.init(jax.random.key(0), x)
        all_b = conv.apply(vs, x)
        one = conv.apply(vs, x[1:2], branch_idx=1)
        np.testing.assert_allclose(
            np.asarray(one)[0], np.asarray(all_b)[1], atol=1e-6
        )

    def test_stage_concat_and_identical_dilation_branches(self):
        # with all-equal dilations the branches share everything => equal
        stage = TN.TridentStage(
            num_blocks=2, out_channels=16, bottleneck_channels=8,
            stride=2, dilations=(1, 1, 1),
        )
        x = jnp.asarray(
            np.random.default_rng(1).normal(size=(2, 16, 16, 8)), jnp.float32
        )
        vs = stage.init(jax.random.key(0), x)
        out = np.asarray(stage.apply(vs, x))  # (3*2, 8, 8, 16)
        assert out.shape == (6, 8, 8, 16)
        np.testing.assert_allclose(out[:2], out[2:4], atol=1e-5)
        np.testing.assert_allclose(out[:2], out[4:6], atol=1e-5)

    def test_merge_branch_detections(self):
        # 1 image, 2 branches, each with 2 padded slots
        boxes = jnp.asarray(
            [
                [[0, 0, 10, 10], [20, 20, 30, 30]],  # branch 0
                [[0.5, 0, 10.5, 10], [50, 50, 60, 60]],  # branch 1
            ],
            jnp.float32,
        )
        scores = jnp.asarray([[0.9, 0.8], [0.95, 0.7]])
        classes = jnp.zeros((2, 2), jnp.int32)
        valid = jnp.asarray([[1, 1], [1, 0]], jnp.float32)  # (50,50..) padded
        b, s, c, v = TN.merge_branch_detections(
            boxes, scores, classes, valid, num_branch=2, nms_thresh=0.5, topk=3
        )
        # the two overlapping boxes NMS to the higher-scored branch-1 box;
        # the padded branch-1 box must not appear
        got = np.asarray(b)[0][np.asarray(v)[0]]
        assert len(got) == 2
        np.testing.assert_allclose(np.asarray(s)[0][:1], [0.95], atol=1e-6)
        assert not any((r == [50, 50, 60, 60]).all() for r in got)


class TestPointSup:
    def test_box_normalization_and_ignore(self):
        boxes = jnp.asarray([[10.0, 20.0, 30.0, 60.0]])
        pts = jnp.asarray([[[20.0, 40.0], [5.0, 30.0], [10.0, 20.0]]])
        labels = jnp.asarray([[1.0, 1.0, 0.0]])
        wrt, lab = PS.point_labels_from_annotation(boxes, pts, labels)
        np.testing.assert_allclose(np.asarray(wrt)[0, 0], [0.5, 0.5], atol=1e-6)
        assert np.asarray(lab)[0].tolist() == [1.0, -1.0, 0.0]  # outside -> -1

    def test_loss_equals_pointrend_bce_on_sampled_logits(self):
        rng = np.random.default_rng(2)
        mask_logits = jnp.asarray(rng.normal(size=(1, 7, 7, 1)).astype(np.float32))
        boxes = jnp.asarray([[0.0, 0.0, 14.0, 14.0]])
        pts = jnp.asarray(rng.uniform(2, 12, size=(1, 5, 2)).astype(np.float32))
        labels = jnp.asarray(rng.integers(0, 2, (1, 5)).astype(np.float32))
        got = float(
            PS.mask_rcnn_point_sup_loss(mask_logits, boxes, pts, labels, None)
        )
        coords, lab = PS.point_labels_from_annotation(boxes, pts, labels)
        ref = float(
            PR.roi_mask_point_loss(
                PR.point_sample(mask_logits, coords), lab, None, None
            )
        )
        np.testing.assert_allclose(got, ref, rtol=1e-6)


class TestCycleBN:
    def test_domain_stats_are_separate(self):
        bn = RB.CycleBatchNorm(num_domains=2, features=3)
        rng = np.random.default_rng(0)
        x0 = jnp.asarray(rng.normal(5.0, 1.0, (4, 8, 8, 3)).astype(np.float32))
        x1 = jnp.asarray(rng.normal(-5.0, 1.0, (4, 8, 8, 3)).astype(np.float32))
        vs = bn.init(jax.random.key(0), x0, 0, train=True)
        state = vs
        for _ in range(20):
            _, upd = bn.apply(state, x0, 0, train=True, mutable=["batch_stats"])
            state = {"params": state["params"], "batch_stats": upd["batch_stats"]}
            _, upd = bn.apply(state, x1, 1, train=True, mutable=["batch_stats"])
            state = {"params": state["params"], "batch_stats": upd["batch_stats"]}
        m = np.asarray(state["batch_stats"]["mean"])
        assert m[0].mean() > 2 and m[1].mean() < -2
        # eval uses the domain's own stats: both domains normalize to ~0
        y0 = bn.apply(state, x0, 0, train=False)
        y1 = bn.apply(state, x1, 1, train=False)
        assert abs(float(jnp.mean(y0))) < 1.0 and abs(float(jnp.mean(y1))) < 1.0
        # crossing domains mis-normalizes (the bug the layer prevents)
        y_cross = bn.apply(state, x1, 0, train=False)
        assert float(jnp.mean(y_cross)) < -2.0

    def test_train_normalization_matches_torch_bn(self):
        rng = np.random.default_rng(3)
        x = rng.normal(2.0, 3.0, size=(8, 4, 4, 3)).astype(np.float32)
        bn = RB.CycleBatchNorm(num_domains=1, features=3)
        vs = bn.init(jax.random.key(0), jnp.asarray(x), 0, train=True)
        y, _ = bn.apply(vs, jnp.asarray(x), 0, train=True, mutable=["batch_stats"])
        tb = torch.nn.BatchNorm2d(3, eps=1e-5)
        tb.train()
        ref = tb(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
        np.testing.assert_allclose(
            np.asarray(y).transpose(0, 3, 1, 2), ref, atol=2e-4
        )

    def test_tower_variants(self):
        feats = [jnp.ones((1, 8, 8, 4)), jnp.ones((1, 4, 4, 4))]
        for variant in ("cycle", "shared"):
            tower = RB.BNConvTower(
                num_levels=2, features=8, num_convs=2, variant=variant
            )
            vs = tower.init(jax.random.key(0), feats, train=True)
            outs = tower.apply(vs, feats, train=False)
            assert outs[0].shape == (1, 8, 8, 8) and outs[1].shape == (1, 4, 4, 8)
            n_dom = vs["batch_stats"]["norm0"]["mean"].shape[0]
            assert n_dom == (2 if variant == "cycle" else 1)


def _swap_align2nat_bruteforce(x, lam, pad):
    """Independent scalar-loop implementation of the csrc contract
    (SwapAlign2Nat_cuda.cu:70-170) as the oracle."""
    n, vin, uin, hin, win = x.shape
    vout, uout = lam * vin, lam * uin
    hout, wout = -(-hin // lam), -(-win // lam)
    out = np.zeros((n, vout, uout, hout, wout), np.float32)

    def val(b, v, u, y, xx):
        if 0 <= v < vin and 0 <= u < uin and 0 <= y < hin and 0 <= xx < win:
            return x[b, v, u, y, xx]
        return pad

    import math

    for b in range(n):
        for v in range(vout):
            for u in range(uout):
                for y in range(hout):
                    for xx in range(wout):
                        ov = (v + 0.5) / lam - 0.5
                        ou = (u + 0.5) / lam - 0.5
                        oy = y * lam + v - vout / 2.0 + 0.5
                        ox = xx * lam + u - uout / 2.0 + 0.5
                        acc = 0.0
                        for vi, vw in ((math.floor(ov), 1 - (ov - math.floor(ov))),
                                       (math.ceil(ov), ov - math.floor(ov))):
                            for ui, uw in ((math.floor(ou), 1 - (ou - math.floor(ou))),
                                           (math.ceil(ou), ou - math.floor(ou))):
                                for yi, yw in ((math.floor(oy), 1 - (oy - math.floor(oy))),
                                               (math.ceil(oy), oy - math.floor(oy))):
                                    for xi, xw in ((math.floor(ox), 1 - (ox - math.floor(ox))),
                                                   (math.ceil(ox), ox - math.floor(ox))):
                                        acc += vw * uw * yw * xw * val(b, vi, ui, yi, xi)
                        out[b, v, u, y, xx] = acc
    return out


class TestSwapAlign2Nat:
    def test_identity_when_trivial(self):
        x = np.random.default_rng(4).normal(size=(1, 1, 1, 5, 5)).astype(np.float32)
        out = np.asarray(TM.swap_align2nat(jnp.asarray(x), 1))
        np.testing.assert_allclose(out, x, atol=1e-6)

    def test_matches_bruteforce(self):
        rng = np.random.default_rng(5)
        x = rng.normal(size=(1, 2, 2, 4, 4)).astype(np.float32)
        for lam in (1, 2):
            ref = _swap_align2nat_bruteforce(x, lam, -6.0)
            got = np.asarray(TM.swap_align2nat(jnp.asarray(x), lam))
            assert got.shape == ref.shape
            np.testing.assert_allclose(got, ref, atol=1e-4)

    def test_grad_flows(self):
        x = jnp.ones((1, 2, 2, 4, 4))
        g = jax.grad(lambda t: jnp.sum(TM.swap_align2nat(t, 2) ** 2))(x)
        assert np.isfinite(np.asarray(g)).all()


class TestDesktopHelpers:
    def test_headless_noops(self, monkeypatch):
        from spacecraft_pose_estimation_tpu.events import desktop

        for var in ("DISPLAY", "WAYLAND_DISPLAY", "DESKTOP_LAUNCH"):
            monkeypatch.delenv(var, raising=False)
        monkeypatch.setattr("sys.platform", "linux")
        assert desktop.get_desktop() is None
        assert not desktop.is_standard()
        assert desktop.open("/tmp") is None  # no crash, no subprocess
        assert desktop.notify("t", "m") is False

    def test_desktop_launch_override(self, monkeypatch, tmp_path):
        from spacecraft_pose_estimation_tpu.events import desktop

        marker = tmp_path / "opened.txt"
        monkeypatch.setenv("DISPLAY", ":0")
        monkeypatch.setenv("DESKTOP_LAUNCH", f"touch")
        monkeypatch.setattr("sys.platform", "linux")
        assert desktop.get_desktop() is not None
        assert desktop.is_standard()
        pid = desktop.open(str(marker), wait=True)
        assert pid is not None and marker.exists()


class TestCycleBNRunningStats:
    def test_running_stats_match_torch_bn(self):
        """running_var must track the UNBIASED batch variance like
        torch.nn.BatchNorm2d (biased-var EMA drifts low by (n-1)/n)."""
        rng = np.random.default_rng(11)
        xs = [rng.normal(1.5, 2.0, size=(4, 3, 3, 2)).astype(np.float32)
              for _ in range(3)]
        bn = RB.CycleBatchNorm(num_domains=1, features=2, momentum=0.9)
        state = bn.init(jax.random.key(0), jnp.asarray(xs[0]), 0, train=True)
        tb = torch.nn.BatchNorm2d(2, eps=1e-5, momentum=0.1)
        tb.train()
        for x in xs:
            _, upd = bn.apply(state, jnp.asarray(x), 0, train=True,
                              mutable=["batch_stats"])
            state = {"params": state["params"],
                     "batch_stats": upd["batch_stats"]}
            tb(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        np.testing.assert_allclose(
            np.asarray(state["batch_stats"]["mean"][0]),
            tb.running_mean.detach().numpy(), rtol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(state["batch_stats"]["var"][0]),
            tb.running_var.detach().numpy(), rtol=1e-5,
        )
