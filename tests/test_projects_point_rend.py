"""PointRend project: torch-oracle parity for the point ops, hand oracle
for selection/scatter, and end-to-end head smoke.

Reference semantics: projects/PointRend/point_rend/ (see module
docstrings for file:line cites).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from spacecraft_pose_estimation_tpu.projects import point_rend as PR

pytestmark = pytest.mark.smoke


class TestPointSample:
    def _oracle(self, feat_nchw, coords):
        t = torch.from_numpy(feat_nchw)
        c = torch.from_numpy(coords).unsqueeze(2)  # (N, P, 1, 2)
        out = F.grid_sample(t, 2.0 * c - 1.0, align_corners=False)
        return out.squeeze(3).numpy()  # (N, C, P)

    def test_matches_torch_grid_sample(self):
        rng = np.random.default_rng(0)
        feat = rng.normal(size=(2, 3, 9, 7)).astype(np.float32)  # NCHW
        coords = rng.uniform(0, 1, size=(2, 17, 2)).astype(np.float32)
        ref = self._oracle(feat, coords)
        got = PR.point_sample(
            jnp.asarray(feat.transpose(0, 2, 3, 1)), jnp.asarray(coords)
        )  # (N, P, C)
        np.testing.assert_allclose(
            np.transpose(np.asarray(got), (0, 2, 1)), ref, atol=1e-5
        )

    def test_out_of_range_zero_padded(self):
        feat = np.ones((1, 1, 4, 4), np.float32)
        coords = np.array([[[-0.5, 0.5], [1.4, 0.5], [0.5, 0.5]]], np.float32)
        ref = self._oracle(feat, coords)
        got = PR.point_sample(
            jnp.asarray(feat.transpose(0, 2, 3, 1)), jnp.asarray(coords)
        )
        np.testing.assert_allclose(np.asarray(got)[0, :, 0], ref[0, 0], atol=1e-6)

    def test_nearest_matches_torch(self):
        rng = np.random.default_rng(1)
        feat = rng.normal(size=(1, 1, 6, 5)).astype(np.float32)
        coords = rng.uniform(0.05, 0.95, size=(1, 13, 2)).astype(np.float32)
        t = torch.from_numpy(feat)
        c = torch.from_numpy(coords).unsqueeze(2)
        ref = (
            F.grid_sample(t, 2.0 * c - 1.0, mode="nearest", align_corners=False)
            .squeeze(3)
            .numpy()
        )
        got = PR.point_sample_nearest(
            jnp.asarray(feat.transpose(0, 2, 3, 1)), jnp.asarray(coords)
        )
        np.testing.assert_allclose(np.asarray(got)[0, :, 0], ref[0, 0], atol=1e-6)

    def test_regular_grid_matches_torch_affine_grid(self):
        side = 5
        aff = torch.tensor([[[0.5, 0.0, 0.5], [0.0, 0.5, 0.5]]])
        r = F.affine_grid(aff, torch.Size((1, 1, side, side)), align_corners=False)
        ref = r.view(1, -1, 2).numpy()
        got = np.asarray(PR.regular_grid_coords(3, side))
        assert got.shape == (3, side * side, 2)
        np.testing.assert_allclose(got[0], ref[0], atol=1e-6)


class TestUpsample:
    def test_matches_torch_interpolate(self):
        rng = np.random.default_rng(2)
        x = rng.normal(size=(2, 4, 5, 3)).astype(np.float32)
        ref = F.interpolate(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            scale_factor=2,
            mode="bilinear",
            align_corners=False,
        ).numpy()
        got = np.asarray(PR.upsample2x_bilinear(jnp.asarray(x)))
        np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref, atol=1e-5)


class TestSelection:
    def test_on_grid_topk(self):
        # hand oracle: put spikes at known cells
        unc = np.full((1, 4, 4, 1), -5.0, np.float32)
        unc[0, 1, 2, 0] = -0.1  # most uncertain
        unc[0, 3, 0, 0] = -0.2
        idx, coords = PR.uncertain_point_coords_on_grid(jnp.asarray(unc), 2)
        idx = np.asarray(idx)[0]
        assert set(idx.tolist()) == {1 * 4 + 2, 3 * 4 + 0}
        coords = np.asarray(coords)[0]
        # cell centers: x = (col + .5)/W, y = (row + .5)/H
        lut = {6: (2.5 / 4, 1.5 / 4), 12: (0.5 / 4, 3.5 / 4)}
        for i, c in zip(idx, coords):
            np.testing.assert_allclose(c, lut[int(i)], atol=1e-6)

    def test_with_randomness_biased_to_uncertain(self):
        # coarse logits: left half confident (+10), right half uncertain (0)
        logits = np.full((2, 8, 8, 1), 10.0, np.float32)
        logits[:, :, 4:, :] = 0.0
        coords = PR.uncertain_point_coords_with_randomness(
            jax.random.key(0), jnp.asarray(logits), None, 64, 4.0, 0.75
        )
        assert coords.shape == (2, 64, 2)
        # the 48 importance points (first 3/4) must lie in the uncertain half
        imp = np.asarray(coords)[:, :48, 0]
        assert (imp > 0.45).mean() > 0.95

    def test_coords_wrt_image(self):
        boxes = jnp.asarray([[10.0, 20.0, 30.0, 60.0]])
        pts = jnp.asarray([[[0.0, 0.0], [1.0, 1.0], [0.5, 0.25]]])
        out = np.asarray(PR.point_coords_wrt_image(boxes, pts))[0]
        np.testing.assert_allclose(out, [[10, 20], [30, 60], [20, 30]], atol=1e-6)


class TestLosses:
    def test_point_loss_matches_torch_bce(self):
        rng = np.random.default_rng(3)
        logits = rng.normal(size=(4, 9, 1)).astype(np.float32)
        labels = rng.integers(0, 2, size=(4, 9)).astype(np.float32)
        labels[0, :3] = -1  # ignore
        ref = F.binary_cross_entropy_with_logits(
            torch.from_numpy(logits[..., 0]),
            torch.from_numpy(np.clip(labels, 0, 1)),
            weight=torch.from_numpy((labels != -1).astype(np.float32)),
            reduction="mean",
        ).item()
        got = float(
            PR.roi_mask_point_loss(
                jnp.asarray(logits), jnp.asarray(labels), None, None
            )
        )
        np.testing.assert_allclose(got, ref, rtol=1e-5)

    def test_point_loss_padded_rows_masked(self):
        rng = np.random.default_rng(4)
        logits = rng.normal(size=(3, 5, 1)).astype(np.float32)
        labels = rng.integers(0, 2, size=(3, 5)).astype(np.float32)
        valid = jnp.asarray([1.0, 1.0, 0.0])
        got = float(
            PR.roi_mask_point_loss(
                jnp.asarray(logits), jnp.asarray(labels), None, valid
            )
        )
        ref = float(
            PR.roi_mask_point_loss(
                jnp.asarray(logits[:2]), jnp.asarray(labels[:2]), None, None
            )
        )
        np.testing.assert_allclose(got, ref, rtol=1e-6)

    def test_sem_seg_point_loss_matches_torch_ce(self):
        rng = np.random.default_rng(5)
        logits = rng.normal(size=(2, 7, 5)).astype(np.float32)
        targets = rng.integers(0, 5, size=(2, 7))
        targets[0, :2] = 255
        ref = F.cross_entropy(
            torch.from_numpy(logits.transpose(0, 2, 1)),
            torch.from_numpy(targets),
            reduction="mean",
            ignore_index=255,
        ).item()
        got = float(
            PR.sem_seg_point_loss(jnp.asarray(logits), jnp.asarray(targets), 255)
        )
        np.testing.assert_allclose(got, ref, rtol=1e-5)


class TestHeads:
    def _feats_boxes(self):
        rng = np.random.default_rng(6)
        feats = [jnp.asarray(rng.normal(size=(32, 32, 16)).astype(np.float32))]
        boxes = jnp.asarray(
            [[8.0, 8.0, 72.0, 96.0], [0.0, 0.0, 128.0, 128.0], [0.0] * 4]
        )
        return feats, boxes

    def test_standard_point_head_shapes(self):
        head = PR.StandardPointHead(num_classes=1, fc_dim=32, num_fc=2)
        fine = jnp.zeros((4, 10, 16))
        coarse = jnp.ones((4, 10, 1))
        vs = head.init(jax.random.key(0), fine, coarse)
        out = head.apply(vs, fine, coarse)
        assert out.shape == (4, 10, 1)

    def test_mask_head_train_and_infer(self):
        cfg = PR.PointRendConfig(
            coarse_resolution=7,
            coarse_output_side=7,
            train_num_points=16,
            subdivision_steps=2,
            subdivision_num_points=64,
            fc_dim=32,
            num_fc=2,
        )
        head = PR.PointRendMaskHead(cfg=cfg)
        feats, boxes = self._feats_boxes()
        gt_masks = jnp.zeros((3, 128, 128)).at[:, 20:90, 20:60].set(1.0)
        valid = jnp.asarray([1.0, 1.0, 0.0])
        vs = head.init(
            jax.random.key(0),
            feats,
            boxes,
            gt_masks=gt_masks,
            gt_classes=None,
            valid=valid,
            rng=jax.random.key(1),
            train=True,
        )
        coarse, pl, lab = head.apply(
            vs,
            feats,
            boxes,
            gt_masks=gt_masks,
            gt_classes=None,
            valid=valid,
            rng=jax.random.key(1),
            train=True,
        )
        assert coarse.shape == (3, 7, 7, 1)
        assert pl.shape == (3, 16, 1) and lab.shape == (3, 16)
        loss = PR.roi_mask_point_loss(pl, jnp.round(lab), None, valid)
        assert np.isfinite(float(loss))
        # inference: subdivision output side = init_res * 2^steps
        mask = head.apply(vs, feats, boxes, train=False)
        side = cfg.init_resolution * 2**cfg.effective_steps
        assert mask.shape == (3, side, side, 1)
        # reference optimization: 4*init² ≤ N ⇒ resolution doubles
        assert cfg.init_resolution >= 7

    def test_subdivision_scatter_places_point_logits(self):
        # directly test the scatter: after one step the selected indices
        # hold the fresh point logits, others the upsampled ones
        mask = jnp.zeros((1, 2, 2, 1)).at[0, 0, 0, 0].set(5.0)
        up = PR.upsample2x_bilinear(mask)
        unc = PR.calculate_uncertainty(up, None)
        idx, coords = PR.uncertain_point_coords_on_grid(unc, 3)
        flat = up.reshape(1, 16, 1)
        ridx = jax.lax.broadcasted_iota(jnp.int32, idx.shape, 0)
        out = flat.at[ridx, idx].set(jnp.full((1, 3, 1), -9.0)).reshape(1, 4, 4, 1)
        got = np.asarray(out).reshape(16)
        assert (got[np.asarray(idx)[0]] == -9.0).all()
        assert (got != -9.0).sum() == 13

    def test_implicit_head_matches_manual_mlp(self):
        head = PR.ImplicitPointHead(
            num_classes=1,
            channels=8,
            num_layers=2,
            in_channels=4,
            image_feature_enabled=True,
            positional_encoding_enabled=False,
        )
        rng = np.random.default_rng(7)
        fine = jnp.asarray(rng.normal(size=(2, 5, 4)).astype(np.float32))
        coords = jnp.asarray(rng.uniform(0, 1, size=(2, 5, 2)).astype(np.float32))
        # params: layer0 w (8,4) b(8); layer1 w (1,8) b(1)
        nparams = 8 * 4 + 8 + 1 * 8 + 1
        params = jnp.asarray(rng.normal(size=(2, nparams)).astype(np.float32))
        vs = head.init(jax.random.key(0), fine, coords, params)
        out = np.asarray(head.apply(vs, fine, coords, params))
        # manual: x @ w0.T + b0 -> relu -> @ w1.T + b1
        p = np.asarray(params)
        w0 = p[:, : 8 * 4].reshape(2, 8, 4)
        w1 = p[:, 8 * 4 : 8 * 4 + 8].reshape(2, 1, 8)
        b0 = p[:, 8 * 4 + 8 : 8 * 4 + 8 + 8].reshape(2, 1, 8)
        b1 = p[:, -1:].reshape(2, 1, 1)
        x = np.asarray(fine)
        h = np.maximum(np.einsum("rpc,rdc->rpd", x, w0) + b0, 0)
        ref = np.einsum("rpc,rdc->rpd", h, w1) + b1
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_implicit_mask_head_smoke(self):
        cfg = PR.PointRendConfig(
            coarse_resolution=7,
            train_num_points=16,
            subdivision_steps=1,
            subdivision_num_points=16,
            fc_dim=16,
            num_fc=1,
        )
        head = PR.ImplicitPointRendMaskHead(cfg=cfg, in_channels=16)
        feats, boxes = self._feats_boxes()
        gt = jnp.zeros((3, 128, 128))
        vs = head.init(
            jax.random.key(0), feats, boxes, gt_masks=gt, rng=jax.random.key(1),
            train=True,
        )
        logits, labels, l2 = head.apply(
            vs, feats, boxes, gt_masks=gt, rng=jax.random.key(1), train=True
        )
        assert logits.shape == (3, 16, 1) and labels.shape == (3, 16)
        assert float(l2) >= 0
        mask = head.apply(vs, feats, boxes, train=False)
        assert mask.shape[1] == mask.shape[2] == 8  # sqrt(16) * 2^1

    def test_sem_seg_head_train_and_infer(self):
        head = PR.PointRendSemSegHead(
            num_classes=3,
            train_num_points=32,
            subdivision_steps=2,
            subdivision_num_points=64,
            fc_dim=16,
            num_fc=2,
        )
        rng = np.random.default_rng(8)
        coarse = jnp.asarray(rng.normal(size=(2, 16, 16, 3)).astype(np.float32))
        fine = [jnp.asarray(rng.normal(size=(2, 32, 32, 8)).astype(np.float32))]
        targets = jnp.asarray(rng.integers(0, 3, size=(2, 64, 64)))
        vs = head.init(
            jax.random.key(0), coarse, fine, targets=targets,
            rng=jax.random.key(1), train=True,
        )
        _, loss = head.apply(
            vs, coarse, fine, targets=targets, rng=jax.random.key(1), train=True
        )
        assert np.isfinite(float(loss))
        sem, _ = head.apply(vs, coarse, fine, train=False)
        assert sem.shape == (2, 64, 64, 3)


class TestInterpolateBilinear:
    @pytest.mark.parametrize("out_hw", [(4, 6), (16, 16), (24, 5), (7, 7)])
    def test_matches_torch_up_and_down(self, out_hw):
        """interpolate_bilinear == F.interpolate(bilinear, antialias=False)
        in BOTH directions — jax.image.resize('linear') antialiases on
        downscale and would diverge."""
        rng = np.random.default_rng(21)
        x = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
        got = np.asarray(PR.interpolate_bilinear(jnp.asarray(x), out_hw))
        ref = (
            torch.nn.functional.interpolate(
                torch.from_numpy(x.transpose(0, 3, 1, 2)),
                size=out_hw, mode="bilinear", align_corners=False,
            ).numpy().transpose(0, 2, 3, 1)
        )
        np.testing.assert_allclose(got, ref, atol=1e-5)


class TestImplicitHeadBuffer:
    def test_pos_matrix_is_buffer_not_param(self):
        """The Fourier-features matrix is a fixed buffer (reference
        register_buffer, point_head.py:177) — it must not receive
        optimizer updates via the params collection."""
        head = PR.ImplicitPointHead(
            num_classes=1, channels=8, num_layers=2, in_channels=4,
            image_feature_enabled=True, positional_encoding_enabled=True,
        )
        rng = np.random.default_rng(22)
        fine = jnp.asarray(rng.normal(size=(2, 5, 4)).astype(np.float32))
        coords = jnp.asarray(rng.uniform(0, 1, (2, 5, 2)).astype(np.float32))
        cin = 4 + 256
        nparams = 8 * cin + 8 + 1 * 8 + 1
        params = jnp.asarray(rng.normal(size=(2, nparams)).astype(np.float32))
        vs = head.init(jax.random.key(0), fine, coords, params)
        assert "buffers" in vs
        assert "positional_encoding_gaussian_matrix" in vs["buffers"]
        flat_params = jax.tree_util.tree_leaves(vs.get("params", {}))
        assert all(p.shape != (2, 128) for p in flat_params)
        out = head.apply(vs, fine, coords, params)
        assert out.shape == (2, 5, 1)


class TestImplicitMaskHeadClasses:
    def test_non_agnostic_inference_requires_classes(self):
        cfg = PR.PointRendConfig(
            coarse_resolution=7, train_num_points=16, subdivision_steps=1,
            subdivision_num_points=16, fc_dim=16, num_fc=1,
            cls_agnostic=False, num_classes=3,
        )
        head = PR.ImplicitPointRendMaskHead(cfg=cfg, in_channels=16)
        feats = [jnp.zeros((32, 32, 16))]
        boxes = jnp.asarray([[4.0, 4.0, 20.0, 20.0]])
        gt = jnp.zeros((1, 128, 128))
        vs = head.init(jax.random.key(0), feats, boxes, gt_masks=gt,
                       rng=jax.random.key(1), train=True)
        with pytest.raises(ValueError, match="classes"):
            head.apply(vs, feats, boxes, train=False)
        mask = head.apply(vs, feats, boxes, train=False,
                          classes=jnp.asarray([1], jnp.int32))
        assert mask.shape[0] == 1 and mask.shape[-1] == 3
