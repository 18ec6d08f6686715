"""DeepLab + Panoptic-DeepLab projects: torch/reference oracles.

The panoptic post-processing is checked against the reference's own
``post_processing.py`` imported as an oracle module (pure torch, no
detectron2 deps) — same pattern as the golden stage-parity harness.
"""

import importlib.util

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from spacecraft_pose_estimation_tpu.projects import deeplab as DL
from spacecraft_pose_estimation_tpu.projects import panoptic_deeplab as PD

pytestmark = pytest.mark.smoke

REF_PP = (
    "/root/reference/object_detection/detectron2/projects/"
    "Panoptic-DeepLab/panoptic_deeplab/post_processing.py"
)


def _load_ref_pp():
    spec = importlib.util.spec_from_file_location("ref_pp", REF_PP)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestDeepLabCE:
    def _oracle(self, logits, labels, ignore, topk, weights=None):
        crit = torch.nn.CrossEntropyLoss(
            ignore_index=ignore, reduction="none"
        )
        pl = crit(torch.from_numpy(logits.transpose(0, 3, 1, 2)),
                  torch.from_numpy(labels))
        if weights is not None:
            pl = pl * torch.from_numpy(weights)
        pl = pl.contiguous().view(-1)
        if topk >= 1.0:
            return pl.mean().item()
        k = int(topk * pl.numel())
        return torch.topk(pl, k)[0].mean().item()

    def test_matches_torch(self):
        rng = np.random.default_rng(0)
        logits = rng.normal(size=(2, 8, 8, 5)).astype(np.float32)
        labels = rng.integers(0, 5, size=(2, 8, 8))
        labels[0, :2] = -1
        for topk in (1.0, 0.2):
            ref = self._oracle(logits, labels, -1, topk)
            got = float(DL.deeplab_ce_loss(
                jnp.asarray(logits), jnp.asarray(labels), -1, topk))
            np.testing.assert_allclose(got, ref, rtol=1e-5)

    def test_weighted(self):
        rng = np.random.default_rng(1)
        logits = rng.normal(size=(1, 6, 6, 3)).astype(np.float32)
        labels = rng.integers(0, 3, size=(1, 6, 6))
        w = rng.uniform(0.5, 3.0, size=(1, 6, 6)).astype(np.float32)
        ref = self._oracle(logits, labels, -1, 0.2, w)
        got = float(DL.deeplab_ce_loss(
            jnp.asarray(logits), jnp.asarray(labels), -1, 0.2, jnp.asarray(w)))
        np.testing.assert_allclose(got, ref, rtol=1e-5)


class TestWarmupPoly:
    def test_formula(self):
        import math

        sched = DL.warmup_poly_schedule(
            0.01, 1000, warmup_iters=100, warmup_factor=0.1, power=0.9
        )
        # mid-warmup: factor = 0.1*(1-a)+a at a=0.5
        np.testing.assert_allclose(
            float(sched(50)),
            0.01 * (0.1 * 0.5 + 0.5) * (1 - 50 / 1000) ** 0.9,
            rtol=1e-5,
        )
        np.testing.assert_allclose(
            float(sched(500)), 0.01 * math.pow(0.5, 0.9), rtol=1e-5
        )

    def test_constant_ending(self):
        sched = DL.warmup_poly_schedule(
            1.0, 100, warmup_iters=0, power=0.9, constant_ending=0.5
        )
        assert float(sched(99)) == pytest.approx(0.5)
        assert float(sched(10)) > 0.5


class TestBackboneAndHeads:
    def test_deeplab_resnet_output_stride_16(self):
        bb = DL.DeepLabResNet(config=DL.DEEPLAB_TINY)
        x = jnp.zeros((1, 64, 64, 3))
        vs = bb.init(jax.random.key(0), x)
        feats = bb.apply(vs, x)
        # res5 dilated (stride 1): same spatial size as res4 (stride 16)
        assert feats["res4"].shape[1] == 64 // 16
        assert feats["res5"].shape[1] == 64 // 16
        assert feats["res2"].shape[1] == 64 // 4

    def test_v3_head_train_and_infer(self):
        head = DL.DeepLabV3Head(
            num_classes=4, aspp_channels=16, common_stride=16
        )
        feats = {"res5": jnp.zeros((1, 4, 4, 32))}
        tgt = jnp.zeros((1, 64, 64), jnp.int32)
        vs = head.init(jax.random.key(0), feats, tgt, train=True)
        _, losses = head.apply(vs, feats, tgt, train=True)
        assert np.isfinite(float(losses["loss_sem_seg"]))
        y, _ = head.apply(vs, feats, train=False)
        assert y.shape == (1, 64, 64, 4)

    def test_v3plus_head_decoder_shapes(self):
        head = DL.DeepLabV3PlusHead(
            num_classes=3,
            in_features=("res2", "res5"),
            in_strides=(4, 16),
            project_channels=(8,),
            aspp_channels=16,
            decoder_channels=(16, 16),
            common_stride=4,
        )
        feats = {
            "res2": jnp.zeros((1, 16, 16, 8)),
            "res5": jnp.zeros((1, 4, 4, 32)),
        }
        vs = head.init(jax.random.key(0), feats, train=False)
        y, _ = head.apply(vs, feats, train=False)
        assert y.shape == (1, 64, 64, 3)
        tgt = jnp.zeros((1, 64, 64), jnp.int32)
        _, losses = head.apply(vs, feats, tgt, train=True)
        assert np.isfinite(float(losses["loss_sem_seg"]))


class TestPanopticHeads:
    def _feats(self):
        return {
            "res2": jnp.zeros((1, 16, 16, 8)),
            "res5": jnp.zeros((1, 4, 4, 32)),
        }

    def test_sem_head(self):
        head = PD.PanopticDeepLabSemSegHead(
            num_classes=3, decoder_channels=(16, 16), head_channels=8
        )
        tgt = jnp.zeros((1, 64, 64), jnp.int32)
        w = jnp.ones((1, 64, 64))
        vs = head.init(jax.random.key(0), self._feats(), tgt, w, train=True)
        _, losses = head.apply(vs, self._feats(), tgt, w, train=True)
        assert np.isfinite(float(losses["loss_sem_seg"]))
        y, _ = head.apply(vs, self._feats(), train=False)
        assert y.shape == (1, 64, 64, 3)

    def test_ins_head_losses_match_reference_normalization(self):
        head = PD.PanopticDeepLabInsEmbedHead(
            decoder_channels=(16, 16), head_channels=8,
            center_loss_weight=1.0, offset_loss_weight=1.0,
        )
        rng = np.random.default_rng(2)
        ct = jnp.asarray(rng.uniform(0, 1, (1, 64, 64)).astype(np.float32))
        cw = jnp.asarray((rng.uniform(size=(1, 64, 64)) > 0.5).astype(np.float32))
        ot = jnp.asarray(rng.normal(size=(1, 64, 64, 2)).astype(np.float32))
        ow = cw
        vs = head.init(jax.random.key(0), self._feats(), ct, cw, ot, ow, train=True)
        _, _, cl, ol = head.apply(vs, self._feats(), ct, cw, ot, ow, train=True)
        # oracle on the head's own predictions
        center, offset, _, _ = head.apply(vs, self._feats(), train=False)
        ref_c = F.mse_loss(
            torch.from_numpy(np.asarray(center[..., 0])),
            torch.from_numpy(np.asarray(ct)),
            reduction="none",
        ) * torch.from_numpy(np.asarray(cw))
        ref_c = (ref_c.sum() / torch.from_numpy(np.asarray(cw)).sum()).item()
        np.testing.assert_allclose(float(cl["loss_center"]), ref_c, rtol=1e-4)
        ref_o = F.l1_loss(
            torch.from_numpy(np.asarray(offset)),
            torch.from_numpy(np.asarray(ot)),
            reduction="none",
        ) * torch.from_numpy(np.asarray(ow))[..., None]
        ref_o = (ref_o.sum() / torch.from_numpy(np.asarray(ow)).sum()).item()
        np.testing.assert_allclose(float(ol["loss_offset"]), ref_o, rtol=1e-4)


class TestPostProcessing:
    def _scene(self):
        rng = np.random.default_rng(3)
        h = w = 32
        center = np.zeros((h, w), np.float32)
        center[8, 8] = 0.9
        center[20, 24] = 0.7
        center += rng.uniform(0, 0.05, (h, w)).astype(np.float32)
        offsets = np.zeros((h, w, 2), np.float32)
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        # left half points to (8,8), right half to (20,24)
        left = xx < 16
        offsets[..., 0] = np.where(left, 8 - yy, 20 - yy)
        offsets[..., 1] = np.where(left, 8 - xx, 24 - xx)
        sem = np.where(left, 1, 2).astype(np.int64)  # both thing classes
        sem[:4] = 0  # stuff band
        return center, offsets, sem

    def test_find_center_matches_reference(self):
        ref_pp = _load_ref_pp()
        center, _, _ = self._scene()
        ref = ref_pp.find_instance_center(
            torch.from_numpy(center)[None].clone(), threshold=0.3, nms_kernel=3
        ).numpy()
        pts, valid = PD.find_instance_center(
            jnp.asarray(center), threshold=0.3, nms_kernel=3, top_k=10
        )
        got = np.asarray(pts)[np.asarray(valid)]
        assert {tuple(r) for r in got.tolist()} == {tuple(r) for r in ref.tolist()}

    def test_group_pixels_matches_reference(self):
        ref_pp = _load_ref_pp()
        center, offsets, _ = self._scene()
        ref_centers = ref_pp.find_instance_center(
            torch.from_numpy(center)[None].clone(), threshold=0.3, nms_kernel=3
        )
        ref = ref_pp.group_pixels(
            ref_centers, torch.from_numpy(offsets.transpose(2, 0, 1))
        ).numpy()[0]
        pts, valid = PD.find_instance_center(
            jnp.asarray(center), threshold=0.3, nms_kernel=3, top_k=10
        )
        got = np.asarray(PD.group_pixels(pts, valid, jnp.asarray(offsets)))
        # ids may be permuted; require identical partitions with matched centers
        k = int(np.asarray(valid).sum())
        ref_c = ref_centers.numpy()
        got_c = np.asarray(pts)[: k]
        mapping = {}
        for i, rc in enumerate(ref_c):
            j = int(np.argmin(np.abs(got_c - rc).sum(1)))
            mapping[i + 1] = j + 1
        remapped = np.vectorize(lambda v: mapping[v])(ref)
        np.testing.assert_array_equal(remapped, got)

    def test_full_panoptic_matches_reference(self):
        ref_pp = _load_ref_pp()
        center, offsets, sem = self._scene()
        thing_ids = {1, 2}
        ref, _ = ref_pp.get_panoptic_segmentation(
            torch.from_numpy(sem)[None],
            torch.from_numpy(center)[None].clone(),
            torch.from_numpy(offsets.transpose(2, 0, 1)),
            thing_ids,
            label_divisor=1000,
            stuff_area=10,
            void_label=-1,
            threshold=0.3,
            nms_kernel=3,
            top_k=10,
        )
        thing_mask = jnp.asarray([c in thing_ids for c in range(3)])
        pan, _, _ = PD.get_panoptic_segmentation(
            jnp.asarray(sem),
            jnp.asarray(center),
            jnp.asarray(offsets),
            thing_mask,
            num_classes=3,
            label_divisor=1000,
            stuff_area=10,
            void_label=-1,
            threshold=0.3,
            nms_kernel=3,
            top_k=10,
        )
        # instance ids within a class may be permuted between impls;
        # compare class maps and partition structure
        ref = ref.numpy()[0]
        got = np.asarray(pan)
        np.testing.assert_array_equal(ref // 1000, got // 1000)
        # identical instance partitions
        for v in np.unique(ref):
            m = ref == v
            assert len(np.unique(got[m])) == 1

    def test_target_generator_offsets_and_center(self):
        pan = np.zeros((16, 16), np.int64)
        pan[4:8, 4:8] = 5  # thing instance
        pan[10:14, 2:6] = 7  # stuff segment
        segs = [
            {"id": 5, "category_id": 1, "iscrowd": 0},
            {"id": 7, "category_id": 2, "iscrowd": 0},
        ]
        gen = PD.PanopticTargetGenerator(
            ignore_label=255, thing_ids=frozenset({1}), sigma=2.0,
            small_instance_area=0,
        )
        out = gen(pan, segs)
        assert out["sem_seg"][5, 5] == 1 and out["sem_seg"][11, 3] == 2
        assert out["sem_seg"][0, 0] == 255
        # offset at (4,4) points to the centroid (5.5, 5.5)
        np.testing.assert_allclose(out["offset"][4, 4], [1.5, 1.5], atol=1e-6)
        # center heatmap peaks at the rounded centroid
        cy, cx = np.unravel_index(np.argmax(out["center"]), (16, 16))
        assert (cy, cx) == (6, 6)
        assert out["center_weights"][5, 5] == 1 and out["center_weights"][0, 0] == 0
        # stuff is ignored in offset weights by default
        assert out["offset_weights"][11, 3] == 0
