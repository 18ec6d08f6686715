"""ViTDet + MViTv2 project backbones: math oracles (plain-attention
equivalence, brute-force rel-pos bias), window roundtrips, stride/shape
contracts, FPN integration, gradient flow."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spacecraft_pose_estimation_tpu.projects import mvitv2, vitdet


class TestWindows:
    def test_roundtrip_exact_multiple(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 8, 12, 5)), jnp.float32)
        w, padded = vitdet.window_partition(x, 4)
        assert w.shape == (2 * 2 * 3, 4, 4, 5)
        back = vitdet.window_unpartition(w, 4, padded, (8, 12))
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    def test_roundtrip_with_padding(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(1, 7, 10, 3)), jnp.float32)
        w, padded = vitdet.window_partition(x, 4)
        assert padded == (8, 12)
        back = vitdet.window_unpartition(w, 4, padded, (7, 10))
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


class TestRelPos:
    def test_decomposed_bias_bruteforce(self):
        """attn[b, qy*qw+qx, ky*kw+kx] += q[b,qy,qx,:]·Rh[qy-ky+off] +
        q·Rw[qx-kx+off] — brute-force loops vs the einsum path."""
        rng = np.random.default_rng(2)
        qh = qw = kh = kw = 3
        d = 4
        q = rng.normal(size=(2, qh * qw, d)).astype(np.float32)
        rel_h = rng.normal(size=(2 * qh - 1, d)).astype(np.float32)
        rel_w = rng.normal(size=(2 * qw - 1, d)).astype(np.float32)
        attn0 = rng.normal(size=(2, qh * qw, kh * kw)).astype(np.float32)

        got = vitdet.add_decomposed_rel_pos(
            jnp.asarray(attn0), jnp.asarray(q), jnp.asarray(rel_h),
            jnp.asarray(rel_w), (qh, qw), (kh, kw),
        )

        want = attn0.copy().reshape(2, qh, qw, kh, kw)
        qr = q.reshape(2, qh, qw, d)
        for b in range(2):
            for qy in range(qh):
                for qx in range(qw):
                    for ky in range(kh):
                        for kx in range(kw):
                            want[b, qy, qx, ky, kx] += qr[b, qy, qx] @ rel_h[
                                qy - ky + kh - 1
                            ] + qr[b, qy, qx] @ rel_w[qx - kx + kw - 1]
        np.testing.assert_allclose(
            np.asarray(got).reshape(2, qh, qw, kh, kw), want, atol=1e-5
        )


def _plain_attention_oracle(x, params, num_heads):
    """numpy softmax attention from the qkv/proj Dense params."""
    b, h, w, c = x.shape
    hd = c // num_heads
    qkv = x.reshape(-1, c) @ np.asarray(params["qkv"]["kernel"]) + np.asarray(
        params["qkv"]["bias"]
    )
    qkv = qkv.reshape(b, h * w, 3, num_heads, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = (q * hd ** -0.5) @ k.transpose(0, 1, 3, 2)
    attn = np.exp(attn - attn.max(-1, keepdims=True))
    attn = attn / attn.sum(-1, keepdims=True)
    out = (attn @ v).transpose(0, 2, 1, 3).reshape(b, h * w, c)
    out = out @ np.asarray(params["proj"]["kernel"]) + np.asarray(
        params["proj"]["bias"]
    )
    return out.reshape(b, h, w, c)


class TestViTDet:
    def test_attention_matches_plain_softmax(self):
        rng = np.random.default_rng(3)
        x = rng.normal(size=(2, 5, 5, 8)).astype(np.float32)
        attn = vitdet.Attention(num_heads=2, use_rel_pos=False)
        variables = attn.init(jax.random.key(0), jnp.asarray(x))
        got = attn.apply(variables, jnp.asarray(x))
        want = _plain_attention_oracle(x, variables["params"], 2)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)

    def test_backbone_strides_and_fpn(self):
        from spacecraft_pose_estimation_tpu.models.fpn import FPN

        cfg = vitdet.VITDET_TINY
        model = vitdet.ViTDetBackbone(config=cfg)
        x = jnp.ones((1, 64, 64, 3))
        variables = model.init(jax.random.key(0), x)
        feats = model.apply(variables, x)
        assert feats["res2"].shape == (1, 16, 16, cfg.out_channels)
        assert feats["res3"].shape == (1, 8, 8, cfg.out_channels)
        assert feats["res4"].shape == (1, 4, 4, cfg.out_channels)
        assert feats["res5"].shape == (1, 2, 2, cfg.out_channels)

        fpn = FPN(16)
        fvars = fpn.init(jax.random.key(1), feats)
        pyr = fpn.apply(fvars, feats)
        assert set(pyr.keys()) >= {"p2", "p3", "p4", "p5"}

    def test_global_vs_window_blocks_differ_and_grads_flow(self):
        cfg = vitdet.VITDET_TINY
        model = vitdet.ViTDetBackbone(config=cfg)
        x = jnp.ones((1, 32, 32, 3))
        variables = model.init(jax.random.key(0), x)

        def loss(p):
            f = model.apply({"params": p}, x)
            return sum(jnp.sum(v ** 2) for v in f.values())

        g = jax.grad(loss)(variables["params"])
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        # rel-pos tables exist for both windowed and global blocks
        assert "rel_pos_h" in variables["params"]["block0"]["attn"]

    def test_pos_embed_interpolates(self):
        cfg = vitdet.VITDET_TINY  # pretrain_grid=4
        model = vitdet.ViTDetBackbone(config=cfg)
        x = jnp.ones((1, 128, 128, 3))  # 8x8 grid != 4x4 table
        variables = model.init(jax.random.key(0), x)
        feats = model.apply(variables, x)
        assert feats["res4"].shape[1] == 8


class TestMViTv2:
    def test_backbone_strides_and_channel_doubling(self):
        cfg = mvitv2.MVITV2_TINY
        model = mvitv2.MViTv2Backbone(config=cfg)
        x = jnp.ones((1, 64, 64, 3))
        variables = model.init(jax.random.key(0), x)
        feats = model.apply(variables, x)
        d = cfg.embed_dim
        assert feats["res2"].shape == (1, 16, 16, d)
        assert feats["res3"].shape == (1, 8, 8, 2 * d)
        assert feats["res4"].shape == (1, 4, 4, 4 * d)
        assert feats["res5"].shape == (1, 2, 2, 8 * d)

    def test_attention_identity_pool_matches_plain(self):
        """With identity pooling kernels (delta depthwise taps) and no
        rel-pos, pooled attention == plain attention + residual q."""
        rng = np.random.default_rng(4)
        dim, heads = 8, 2
        hd = dim // heads
        x = rng.normal(size=(1, 4, 4, dim)).astype(np.float32)
        attn = mvitv2.MultiScaleAttention(
            dim_out=dim, num_heads=heads, q_stride=1, kv_stride=1,
            use_rel_pos=False, residual_pooling=True,
        )
        variables = attn.init(jax.random.key(0), jnp.asarray(x))
        params = jax.tree_util.tree_map(np.array, variables["params"])
        # delta kernels: (3, 3, 1, hd) with 1 at the center tap
        for nm in ("pool_q", "pool_k", "pool_v"):
            kern = np.zeros_like(params[nm]["kernel"])
            kern[1, 1, 0, :] = 1.0
            params[nm]["kernel"] = kern
            params[f"norm_{nm[-1]}"]["scale"] = np.ones_like(
                params[f"norm_{nm[-1]}"]["scale"]
            )
        got = attn.apply({"params": params}, jnp.asarray(x))

        # oracle: LN(q/k/v) after identity pool, then softmax attention,
        # + residual q, then proj
        def ln(y):
            mu = y.mean(-1, keepdims=True)
            var = y.var(-1, keepdims=True)
            return (y - mu) / np.sqrt(var + 1e-6)

        b, h, w, _ = x.shape
        qkv = x.reshape(-1, dim) @ params["qkv"]["kernel"] + params["qkv"]["bias"]
        qkv = qkv.reshape(b, h, w, 3, heads, hd).transpose(3, 0, 4, 1, 2, 5)
        qkv = qkv.reshape(3, b * heads, h, w, hd)
        q, k, v = ln(qkv[0]), ln(qkv[1]), ln(qkv[2])
        qf, kf, vf = (t.reshape(b * heads, h * w, hd) for t in (q, k, v))
        a = (qf * hd ** -0.5) @ kf.transpose(0, 2, 1)
        a = np.exp(a - a.max(-1, keepdims=True))
        a = a / a.sum(-1, keepdims=True)
        out = a @ vf + qf
        out = out.reshape(b, heads, h * w, hd).transpose(0, 2, 1, 3)
        out = out.reshape(b, h, w, dim)
        want = out.reshape(-1, dim) @ params["proj"]["kernel"] + params["proj"]["bias"]
        np.testing.assert_allclose(
            np.asarray(got).reshape(-1, dim), want, atol=1e-4
        )

    def test_grads_flow(self):
        cfg = mvitv2.MVITV2_TINY
        model = mvitv2.MViTv2Backbone(config=cfg)
        x = jnp.ones((1, 32, 32, 3))
        variables = model.init(jax.random.key(0), x)

        def loss(p):
            f = model.apply({"params": p}, x)
            return sum(jnp.sum(v ** 2) for v in f.values())

        g = jax.grad(loss)(variables["params"])
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


torch = pytest.importorskip("torch")


class TestTorchInterpOracles:
    @pytest.mark.parametrize("out_hw", [(5, 9), (14, 14), (20, 6)])
    def test_bicubic_matches_torch(self, out_hw):
        """interpolate_bicubic == F.interpolate(bicubic, A=-0.75) up AND
        down (jax.image.resize uses Keys A=-0.5 and antialiases)."""
        rng = np.random.default_rng(2)
        x = rng.normal(size=(2, 10, 10, 3)).astype(np.float32)
        got = np.asarray(vitdet.interpolate_bicubic(jnp.asarray(x), out_hw))
        ref = (
            torch.nn.functional.interpolate(
                torch.from_numpy(x.transpose(0, 3, 1, 2)),
                size=out_hw, mode="bicubic", align_corners=False,
            )
            .numpy().transpose(0, 2, 3, 1)
        )
        np.testing.assert_allclose(got, ref, atol=2e-5)

    @pytest.mark.parametrize("out_len", [7, 31])
    def test_rel_pos_resize_matches_torch_linear(self, out_len):
        rng = np.random.default_rng(3)
        table = rng.normal(size=(15, 4)).astype(np.float32)
        q = k = (out_len + 1) // 2
        got = np.asarray(vitdet.get_rel_pos(q, k, jnp.asarray(table)))
        ref_t = (
            torch.nn.functional.interpolate(
                torch.from_numpy(table.T[None]), size=out_len, mode="linear",
                align_corners=False,
            )[0].numpy().T
        )
        coords = np.arange(q)[:, None] - np.arange(k)[None, :] + (k - 1)
        np.testing.assert_allclose(got, ref_t[coords], atol=2e-6)


class TestMViTBlockSemantics:
    def test_transition_block_constant_shift_invariant(self):
        """The stage-transition shortcut projects norm1(x) (upstream
        mvit.py `x = self.proj(x_norm)`), so a constant input shift —
        which LayerNorm removes — must not change the block output.
        (Projecting the RAW input, the old bug, breaks this.)"""
        blk = mvitv2.MultiScaleBlock(
            dim_out=8, num_heads=1, q_stride=2, kv_stride=1, mlp_ratio=1.0,
            use_rel_pos=False, residual_pooling=True,
        )
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32))
        vs = blk.init(jax.random.key(0), x)
        a = np.asarray(blk.apply(vs, x))
        b = np.asarray(blk.apply(vs, x + 3.7))
        np.testing.assert_allclose(a, b, atol=1e-4)

    @pytest.mark.parametrize("hw", [(8, 8), (7, 9)])
    def test_pool_skip_matches_torch_maxpool(self, hw):
        """Shortcut pooling = MaxPool2d(kernel=3, stride=2, padding=1,
        ceil_mode=False): verify shapes on even AND odd maps (torch
        floor((H+2-3)/2)+1) and values via a direct torch oracle on the
        flax pool used in the block."""
        from flax import linen as fnn

        rng = np.random.default_rng(5)
        x = rng.normal(size=(1, *hw, 4)).astype(np.float32)
        got = np.asarray(fnn.max_pool(
            jnp.asarray(x), (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
        ))
        ref = (
            torch.nn.MaxPool2d(3, 2, 1, ceil_mode=False)(
                torch.from_numpy(x.transpose(0, 3, 1, 2))
            ).numpy().transpose(0, 2, 3, 1)
        )
        np.testing.assert_allclose(got, ref)

    def test_transition_block_output_shape_odd(self):
        blk = mvitv2.MultiScaleBlock(
            dim_out=8, num_heads=1, q_stride=2, kv_stride=1, mlp_ratio=1.0,
            use_rel_pos=False, residual_pooling=True,
        )
        x = jnp.zeros((1, 7, 9, 4))
        vs = blk.init(jax.random.key(0), x)
        out = blk.apply(vs, x)
        # q conv pool SAME stride2 -> ceil(7/2)=4, ceil(9/2)=5; the
        # 3x3/s2/p1 skip pool gives the same floor((n-1)/2)+1 sizes
        assert out.shape == (1, 4, 5, 8)
