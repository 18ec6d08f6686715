"""DensePose project: parity vs torch oracles and the reference's own
loss/converter source files (loaded standalone with import stubs).

Reference files under
/root/reference/object_detection/detectron2/projects/DensePose/densepose/:
  modeling/losses/utils.py (interpolation + resample_data),
  modeling/predictors/chart.py, modeling/roi_heads/v1convx.py,
  converters/segm_to_mask.py + chart_output_to_chart_result.py.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
F = torch.nn.functional

from spacecraft_pose_estimation_tpu.projects import densepose as dp

DP_ROOT = (
    "/root/reference/object_detection/detectron2/projects/DensePose/densepose"
)


def _load_ref_losses_utils():
    """Load modeling/losses/utils.py standalone: its module-level imports
    (detectron2.structures, densepose) are stubbed — the functions under
    test (_linear_interpolation_utilities, resample_data) touch neither."""
    path = os.path.join(DP_ROOT, "modeling", "losses", "utils.py")
    if not os.path.exists(path):
        pytest.skip("reference checkout not available")
    saved = {k: sys.modules.get(k) for k in
             ("detectron2", "detectron2.structures", "densepose")}
    d2 = types.ModuleType("detectron2")
    st = types.ModuleType("detectron2.structures")
    st.BoxMode = type("BoxMode", (), {})
    st.Instances = type("Instances", (), {})
    d2.structures = st
    dpm = types.ModuleType("densepose")
    dpm.DensePoseDataRelative = type("DensePoseDataRelative", (), {})
    sys.modules.update(
        {"detectron2": d2, "detectron2.structures": st, "densepose": dpm}
    )
    try:
        spec = importlib.util.spec_from_file_location("ref_dp_losses_utils", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mod


@pytest.fixture(scope="module")
def ref_utils():
    return _load_ref_losses_utils()


class TestInterpolationUtilities:
    def test_matches_reference(self, ref_utils):
        rng = np.random.default_rng(0)
        n = 64
        v_norm = rng.uniform(-20, 276, n).astype(np.float32)  # incl. oob
        v0_src = rng.uniform(0, 50, n).astype(np.float32)
        size_src = rng.uniform(10, 120, n).astype(np.float32)
        v0_dst = rng.uniform(0, 50, n).astype(np.float32)
        size_dst = rng.uniform(10, 120, n).astype(np.float32)
        size_z = 28

        r_lo, r_hi, r_w, r_valid = ref_utils._linear_interpolation_utilities(
            torch.from_numpy(v_norm), torch.from_numpy(v0_src),
            torch.from_numpy(size_src), torch.from_numpy(v0_dst),
            torch.from_numpy(size_dst), size_z,
        )
        j_lo, j_hi, j_w, j_valid = dp._linear_interpolation_utilities(
            jnp.asarray(v_norm), jnp.asarray(v0_src), jnp.asarray(size_src),
            jnp.asarray(v0_dst), jnp.asarray(size_dst), size_z,
        )
        np.testing.assert_array_equal(np.asarray(j_lo), r_lo.numpy())
        np.testing.assert_array_equal(np.asarray(j_hi), r_hi.numpy())
        np.testing.assert_allclose(np.asarray(j_w), r_w.numpy(), atol=1e-5)
        np.testing.assert_array_equal(
            np.asarray(j_valid), r_valid.numpy().astype(bool)
        )

    def test_resample_data_nearest(self, ref_utils):
        rng = np.random.default_rng(1)
        n, h, w = 3, 16, 16
        z = rng.integers(0, 5, (n, 1, h, w)).astype(np.float32)
        src = np.stack(
            [rng.uniform(0, 10, n), rng.uniform(0, 10, n),
             rng.uniform(20, 40, n), rng.uniform(20, 40, n)], axis=1
        ).astype(np.float32)
        dst = np.stack(
            [rng.uniform(0, 20, n), rng.uniform(0, 20, n),
             rng.uniform(15, 45, n), rng.uniform(15, 45, n)], axis=1
        ).astype(np.float32)
        ref = ref_utils.resample_data(
            torch.from_numpy(z), torch.from_numpy(src), torch.from_numpy(dst),
            12, 12, mode="nearest", padding_mode="zeros",
        ).numpy()
        got = dp.resample_data_nearest(
            jnp.asarray(z.transpose(0, 2, 3, 1)), jnp.asarray(src),
            jnp.asarray(dst), (12, 12),
        )
        np.testing.assert_array_equal(
            np.asarray(got)[..., 0], ref[:, 0]
        )


def _torch_chart_predictor(x_nchw, params, k=4, up=2):
    """chart.py:34-96 oracle: ConvTranspose2d(k, 2, k/2-1) + bilinear."""
    outs = {}
    for name in ("ann_index_lowres", "index_uv_lowres", "u_lowres", "v_lowres"):
        wt, bt = params[name]
        y = F.conv_transpose2d(x_nchw, wt, bt, stride=2, padding=k // 2 - 1)
        outs[name] = F.interpolate(
            y, scale_factor=up, mode="bilinear", align_corners=False
        )
    return outs


class TestChartPredictor:
    def test_matches_torch(self):
        rng = np.random.default_rng(2)
        cfg = dp.DensePoseConfig(num_patches=4, num_coarse_segm_channels=2)
        cin, s = 8, 7
        x = rng.normal(size=(2, s, s, cin)).astype(np.float32)

        model = dp.DensePoseChartPredictor(cfg)
        variables = model.init(jax.random.key(0), jnp.asarray(x))
        out = model.apply(variables, jnp.asarray(x))

        tp = {}
        for name in ("ann_index_lowres", "index_uv_lowres", "u_lowres",
                     "v_lowres"):
            kern = np.asarray(variables["params"][name]["kernel"])
            # flax ConvTranspose (kh, kw, in, out) -> torch (in, out, kh, kw)
            # with spatial flip (inverse of utils/torch_import.py mapping)
            wt = torch.from_numpy(
                np.ascontiguousarray(
                    kern.transpose(2, 3, 0, 1)[:, :, ::-1, ::-1]
                )
            )
            bt = torch.from_numpy(np.asarray(variables["params"][name]["bias"]))
            tp[name] = (wt, bt)
        ref = _torch_chart_predictor(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), tp,
            k=cfg.deconv_kernel, up=cfg.up_scale,
        )
        for got, name in (
            (out.coarse_segm, "ann_index_lowres"),
            (out.fine_segm, "index_uv_lowres"),
            (out.u, "u_lowres"),
            (out.v, "v_lowres"),
        ):
            np.testing.assert_allclose(
                np.asarray(got).transpose(0, 3, 1, 2), ref[name].numpy(),
                atol=2e-5,
            )


class TestHeads:
    def test_v1convx_matches_torch(self):
        rng = np.random.default_rng(3)
        cfg = dp.DensePoseConfig(num_stacked_convs=3, conv_head_dim=6)
        x = rng.normal(size=(2, 5, 5, 4)).astype(np.float32)
        model = dp.DensePoseV1ConvXHead(cfg)
        variables = model.init(jax.random.key(0), jnp.asarray(x))
        got = model.apply(variables, jnp.asarray(x))

        t = torch.from_numpy(x.transpose(0, 3, 1, 2))
        for i in range(cfg.num_stacked_convs):
            p = variables["params"][f"body_conv_fcn{i + 1}"]
            wt = torch.from_numpy(
                np.ascontiguousarray(np.asarray(p["kernel"]).transpose(3, 2, 0, 1))
            )
            bt = torch.from_numpy(np.asarray(p["bias"]))
            t = F.relu(F.conv2d(t, wt, bt, padding=1))
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), t.numpy(), atol=2e-5
        )

    def test_deeplab_head_shapes_and_grads(self):
        cfg = dp.DensePoseConfig(
            num_stacked_convs=2, conv_head_dim=64, head="deeplab"
        )
        x = jnp.ones((1, 8, 8, 16))
        model = dp.DensePoseDeepLabHead(cfg)
        variables = model.init(jax.random.key(0), x)
        y = model.apply(variables, x)
        assert y.shape == (1, 8, 8, 64)

    def test_decoder_merges_fpn(self):
        cfg = dp.DensePoseConfig(decoder_channels=8)
        feats = [jnp.ones((1, 16 // (2 ** i), 16 // (2 ** i), 4))
                 for i in range(4)]
        model = dp.DensePoseDecoder(cfg)
        variables = model.init(jax.random.key(0), feats)
        y = model.apply(variables, feats)
        assert y.shape == (1, 16, 16, 8)


def _pack_annotations(rng, n, p, hg=16, wg=16, c=5):
    x_gt = rng.uniform(0, 256, p).astype(np.float32)
    y_gt = rng.uniform(0, 256, p).astype(np.float32)
    u_gt = rng.uniform(0, 1, p).astype(np.float32)
    v_gt = rng.uniform(0, 1, p).astype(np.float32)
    labels = rng.integers(0, c, p).astype(np.int32)
    inst = rng.integers(0, n, p).astype(np.int32)
    valid = rng.uniform(size=p) > 0.2
    bb_gt = np.stack(
        [rng.uniform(0, 10, n), rng.uniform(0, 10, n),
         rng.uniform(20, 60, n), rng.uniform(20, 60, n)], axis=1
    ).astype(np.float32)
    bb_est = bb_gt + rng.uniform(-4, 4, (n, 4)).astype(np.float32)
    seg_gt = rng.integers(0, 2, (n, hg, wg)).astype(np.int32)
    return dp.PackedChartAnnotations(
        x_gt=jnp.asarray(x_gt), y_gt=jnp.asarray(y_gt),
        u_gt=jnp.asarray(u_gt), v_gt=jnp.asarray(v_gt),
        fine_segm_labels_gt=jnp.asarray(labels),
        point_instance=jnp.asarray(inst),
        point_valid=jnp.asarray(valid),
        bbox_xywh_gt=jnp.asarray(bb_gt), bbox_xywh_est=jnp.asarray(bb_est),
        coarse_segm_gt=jnp.asarray(seg_gt),
        instance_valid=jnp.ones(n, bool),
    )


class TestChartLoss:
    def test_matches_torch_reference_math(self, ref_utils):
        """Recompute the chart.py:113-290 loss with torch + the
        reference's own interpolation code and compare."""
        rng = np.random.default_rng(4)
        n, p, s, c, k = 3, 40, 14, 5, 2
        cfg = dp.DensePoseConfig(
            num_patches=c - 1, num_coarse_segm_channels=k, heatmap_size=s
        )
        out = dp.DensePoseChartPredictorOutput(
            coarse_segm=jnp.asarray(rng.normal(size=(n, s, s, k)), jnp.float32),
            fine_segm=jnp.asarray(rng.normal(size=(n, s, s, c)), jnp.float32),
            u=jnp.asarray(rng.normal(size=(n, s, s, c)), jnp.float32),
            v=jnp.asarray(rng.normal(size=(n, s, s, c)), jnp.float32),
        )
        ann = _pack_annotations(rng, n, p, c=c)
        got = jax.jit(dp.densepose_chart_loss, static_argnums=2)(out, ann, cfg)

        # ---- torch oracle (chart.py order of operations) ----
        tt = lambda a: torch.from_numpy(np.asarray(a))
        inst = tt(ann.point_instance).long()
        bbg, bbe = tt(ann.bbox_xywh_gt), tt(ann.bbox_xywh_est)
        x0g, y0g, wg_, hg_ = bbg[inst].unbind(dim=1)
        x0e, y0e, we_, he_ = bbe[inst].unbind(dim=1)
        x_lo, x_hi, x_w, jx = ref_utils._linear_interpolation_utilities(
            tt(ann.x_gt), x0g, wg_, x0e, we_, s
        )
        y_lo, y_hi, y_w, jy = ref_utils._linear_interpolation_utilities(
            tt(ann.y_gt), y0g, hg_, y0e, he_, s
        )
        j_valid = (jx.bool() & jy.bool() & tt(ann.point_valid).bool())
        w00 = (1 - x_w) * (1 - y_w)
        w01 = x_w * (1 - y_w)
        w10 = (1 - x_w) * y_w
        w11 = x_w * y_w
        fg = j_valid & (tt(ann.fine_segm_labels_gt) > 0)

        def extract(z_nchw, ch):
            zz = z_nchw
            vals = (
                zz[inst, ch, y_lo, x_lo] * w00 + zz[inst, ch, y_lo, x_hi] * w01
                + zz[inst, ch, y_hi, x_lo] * w10 + zz[inst, ch, y_hi, x_hi] * w11
            )
            return vals

        label = tt(ann.fine_segm_labels_gt).long()
        u_t = tt(np.asarray(out.u).transpose(0, 3, 1, 2))
        v_t = tt(np.asarray(out.v).transpose(0, 3, 1, 2))
        loss_u = F.smooth_l1_loss(
            extract(u_t, label)[fg], tt(ann.u_gt)[fg], reduction="sum"
        ) * cfg.point_regression_weights
        loss_v = F.smooth_l1_loss(
            extract(v_t, label)[fg], tt(ann.v_gt)[fg], reduction="sum"
        ) * cfg.point_regression_weights

        fs_t = tt(np.asarray(out.fine_segm).transpose(0, 3, 1, 2))
        fse = (
            fs_t[inst, :, y_lo, x_lo] * w00[:, None]
            + fs_t[inst, :, y_lo, x_hi] * w01[:, None]
            + fs_t[inst, :, y_hi, x_lo] * w10[:, None]
            + fs_t[inst, :, y_hi, x_hi] * w11[:, None]
        )
        loss_i = F.cross_entropy(fse[j_valid], label[j_valid]) * cfg.part_weights

        cs_t = tt(np.asarray(out.coarse_segm).transpose(0, 3, 1, 2))
        seg_gt_t = ref_utils.resample_data(
            tt(ann.coarse_segm_gt).float().unsqueeze(1), bbg, bbe, s, s,
            mode="nearest", padding_mode="zeros",
        ).squeeze(1)
        seg_gt_t = (seg_gt_t > 0).long()
        loss_s = F.cross_entropy(cs_t, seg_gt_t) * cfg.index_weights

        np.testing.assert_allclose(
            float(got["loss_densepose_U"]), float(loss_u), rtol=2e-4
        )
        np.testing.assert_allclose(
            float(got["loss_densepose_V"]), float(loss_v), rtol=2e-4
        )
        np.testing.assert_allclose(
            float(got["loss_densepose_I"]), float(loss_i), rtol=2e-4
        )
        np.testing.assert_allclose(
            float(got["loss_densepose_S"]), float(loss_s), rtol=2e-4
        )

    def test_no_valid_points_gives_zero(self):
        rng = np.random.default_rng(5)
        n, p, s, c = 2, 8, 6, 4
        cfg = dp.DensePoseConfig(num_patches=c - 1, heatmap_size=s)
        out = dp.DensePoseChartPredictorOutput(
            coarse_segm=jnp.asarray(rng.normal(size=(n, s, s, 2)), jnp.float32),
            fine_segm=jnp.asarray(rng.normal(size=(n, s, s, c)), jnp.float32),
            u=jnp.asarray(rng.normal(size=(n, s, s, c)), jnp.float32),
            v=jnp.asarray(rng.normal(size=(n, s, s, c)), jnp.float32),
        )
        ann = _pack_annotations(rng, n, p, c=c)
        ann = ann._replace(point_valid=jnp.zeros(p, bool))
        losses = dp.densepose_chart_loss(out, ann, cfg)
        for v in losses.values():
            assert float(v) == 0.0


class TestChartResult:
    def test_matches_torch_converters(self):
        """Static-grid twin of segm_to_mask.py:34-69 +
        chart_output_to_chart_result.py:18-47 on a same-size box."""
        rng = np.random.default_rng(6)
        n, s, c, k = 2, 8, 5, 2
        h, w = 21, 17
        out = dp.DensePoseChartPredictorOutput(
            coarse_segm=jnp.asarray(rng.normal(size=(n, s, s, k)), jnp.float32),
            fine_segm=jnp.asarray(rng.normal(size=(n, s, s, c)), jnp.float32),
            u=jnp.asarray(rng.normal(size=(n, s, s, c)), jnp.float32),
            v=jnp.asarray(rng.normal(size=(n, s, s, c)), jnp.float32),
        )
        labels, uv = jax.jit(
            dp.chart_result_for_grid, static_argnums=1
        )(out, (h, w))

        for i in range(n):
            cs = torch.from_numpy(
                np.asarray(out.coarse_segm[i:i + 1]).transpose(0, 3, 1, 2)
            )
            fs = torch.from_numpy(
                np.asarray(out.fine_segm[i:i + 1]).transpose(0, 3, 1, 2)
            )
            coarse = F.interpolate(
                cs, (h, w), mode="bilinear", align_corners=False
            ).argmax(dim=1)
            ref_labels = (
                F.interpolate(fs, (h, w), mode="bilinear", align_corners=False)
                .argmax(dim=1) * (coarse > 0).long()
            )[0]
            np.testing.assert_array_equal(
                np.asarray(labels[i]), ref_labels.numpy()
            )
            u_b = F.interpolate(
                torch.from_numpy(np.asarray(out.u[i:i + 1]).transpose(0, 3, 1, 2)),
                (h, w), mode="bilinear", align_corners=False,
            )
            v_b = F.interpolate(
                torch.from_numpy(np.asarray(out.v[i:i + 1]).transpose(0, 3, 1, 2)),
                (h, w), mode="bilinear", align_corners=False,
            )
            ref_uv = torch.zeros(2, h, w)
            for part in range(1, c):
                m = ref_labels == part
                ref_uv[0][m] = u_b[0, part][m]
                ref_uv[1][m] = v_b[0, part][m]
            np.testing.assert_allclose(
                np.asarray(uv[i]).transpose(2, 0, 1), ref_uv.numpy(), atol=2e-5
            )


class TestROIIntegration:
    def test_roi_forward_decoder_and_multilevel(self):
        cfg = dp.DensePoseConfig(
            num_stacked_convs=1, conv_head_dim=8, num_patches=3,
            decoder_channels=8,
        )
        feats = [jnp.ones((1, 32 // (2 ** i), 32 // (2 ** i), 4)) * (i + 1)
                 for i in range(4)]
        boxes = jnp.asarray([[4.0, 4.0, 20.0, 20.0], [0.0, 0.0, 8.0, 8.0]])
        head = dp.DensePoseHead(cfg)
        hv = head.init(jax.random.key(0), jnp.ones((2, 28, 28, 8)))
        dec = dp.DensePoseDecoder(cfg)
        dv = dec.init(jax.random.key(1), feats)
        out = dp.densepose_roi_forward(
            head, hv, feats, boxes, decoder=dec, decoder_variables=dv,
            pooler_resolution=28, strides=(4, 8, 16, 32),
        )
        assert out.fine_segm.shape == (2, 112, 112, 4)

        hv2 = head.init(jax.random.key(2), jnp.ones((2, 14, 14, 4)))
        out2 = dp.densepose_roi_forward(
            head, hv2, feats, boxes, pooler_resolution=14,
            strides=(4, 8, 16, 32),
        )
        assert out2.u.shape == (2, 56, 56, 4)


class TestFullHead:
    def test_head_predictor_end_to_end(self):
        cfg = dp.DensePoseConfig(
            num_stacked_convs=2, conv_head_dim=8, num_patches=3
        )
        x = jnp.ones((2, 7, 7, 4))
        model = dp.DensePoseHead(cfg)
        variables = model.init(jax.random.key(0), x)
        out = model.apply(variables, x)
        assert out.coarse_segm.shape == (2, 28, 28, 2)
        assert out.fine_segm.shape == (2, 28, 28, 4)

        # losses differentiate through the head
        rng = np.random.default_rng(7)
        ann = _pack_annotations(rng, 2, 10, c=4)

        def loss_fn(params):
            o = model.apply({"params": params}, x)
            losses = dp.densepose_chart_loss(
                o, ann, dataclasses_replace_heatmap(cfg, o.u.shape[1])
            )
            return sum(losses.values())

        g = jax.grad(loss_fn)(variables["params"])
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def dataclasses_replace_heatmap(cfg, s):
    import dataclasses

    return dataclasses.replace(cfg, heatmap_size=s)
