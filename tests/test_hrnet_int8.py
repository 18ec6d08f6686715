"""int8 PTQ HRNet: structural completeness + numerical fidelity vs bf16/f32."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spacecraft_pose_estimation_tpu.models.hrnet import (
    HRNET_TINY,
    HRNet,
    POSE_HRNET_W32,
)
from spacecraft_pose_estimation_tpu.models.hrnet_int8 import (
    HRNetInt8,
    hrnet_int8_apply,
    quantize_hrnet,
)


def _conv_sites(params, prefix=()):
    """All ConvBN sites (have conv+bn children) in the param tree."""
    out = []
    for k, v in params.items():
        if not isinstance(v, dict):
            continue
        if "conv" in v and "bn" in v:
            out.append("/".join(prefix + (k,)))
        else:
            out.extend(_conv_sites(v, prefix + (k,)))
    return out


@pytest.fixture(scope="module")
def tiny_setup():
    model = HRNet(config=HRNET_TINY.with_joints(5))
    rng = np.random.default_rng(0)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False)
    # non-trivial BN stats + weights so quantization is actually exercised
    variables = jax.tree_util.tree_map(np.asarray, variables)

    def perturb(path, x):
        name = path[-1].key
        if name == "var":
            return (0.5 + rng.uniform(0.1, 2.0, x.shape)).astype(x.dtype)
        if name == "mean":
            return rng.normal(0, 0.3, x.shape).astype(x.dtype)
        if name in ("kernel", "scale"):
            return (x + rng.normal(0, 0.05, x.shape)).astype(x.dtype)
        if name == "bias":
            return rng.normal(0, 0.1, x.shape).astype(x.dtype)
        return x

    variables = jax.tree_util.tree_map_with_path(perturb, variables)
    calib = jnp.asarray(rng.normal(0, 1.2, (4, 64, 64, 3)), jnp.float32)
    # s2d=True: the packed-twin coverage tests below need the s2d tree
    # (serving default is False — probe-measured slower in situ)
    q = quantize_hrnet(model, variables, calib, s2d=True)
    return model, variables, q, rng


def test_walk_consumes_every_convbn(tiny_setup):
    model, variables, q, _ = tiny_setup
    sites = set(_conv_sites(variables["params"]))
    consumed = set(q["convs"].keys())
    assert sites == consumed, (sites - consumed, consumed - sites)
    assert q["final"], "final layer missing"


def test_int8_matches_f32(tiny_setup):
    model, variables, q, rng = tiny_setup
    x = jnp.asarray(rng.normal(0, 1.2, (2, 64, 64, 3)), jnp.float32)
    ref = np.asarray(model.apply(variables, x, train=False))
    got = np.asarray(hrnet_int8_apply(model.config, q, x))
    assert got.shape == ref.shape
    rng_ref = np.abs(ref).max() + 1e-9
    rel_err = np.abs(got - ref).max() / rng_ref
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert rel_err < 0.2, rel_err
    assert corr > 0.97, corr


def test_int8_jits_and_is_deterministic(tiny_setup):
    model, variables, q, rng = tiny_setup
    x = jnp.asarray(rng.normal(0, 1.2, (2, 64, 64, 3)), jnp.float32)
    f = jax.jit(lambda q, x: hrnet_int8_apply(model.config, q, x))
    a = np.asarray(f(q, x))
    b = np.asarray(f(q, x))
    np.testing.assert_array_equal(a, b)


def test_w32_walk_completeness():
    """The production config's param tree is fully consumed (no calib run:
    synthesize a scale table from the walk itself via a quick capture on a
    small input)."""
    model = HRNet(config=POSE_HRNET_W32.with_joints(11))
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False)
    calib = jnp.zeros((1, 64, 64, 3), jnp.float32) + 0.5
    q = quantize_hrnet(model, variables, calib)
    sites = set(_conv_sites(jax.tree_util.tree_map(np.asarray, variables)["params"]))
    assert sites == set(q["convs"].keys())


@pytest.mark.slow
def test_int8_peak_fidelity_on_trained_model():
    """On a trained model (peaked heatmaps), int8 argmax peaks must match
    f32 within 1 heatmap pixel (flat random-init heatmaps are NOT a valid
    fidelity probe: the argmax there is noise)."""
    from spacecraft_pose_estimation_tpu.ops import heatmap as hm
    from spacecraft_pose_estimation_tpu.train.optim import build_optimizer
    from spacecraft_pose_estimation_tpu.train.state import TrainState, make_train_step

    rng = np.random.default_rng(0)
    J = 3
    model = HRNet(config=HRNET_TINY.with_joints(J))
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=True)
    state = TrainState.create(model, variables, build_optimizer("adam", 2e-3))
    step = jax.jit(make_train_step())

    def make_batch(n):
        joints = rng.uniform(12, 52, size=(n, J, 2)).astype(np.float32)
        imgs = np.zeros((n, 64, 64, 3), np.float32)
        for b in range(n):
            for j in range(J):
                x, y = joints[b, j]
                imgs[b, int(y) - 2 : int(y) + 3, int(x) - 2 : int(x) + 3, j] = 4.0
        vis = np.ones((n, J), np.float32)
        tgt, tw = jax.vmap(
            lambda jj, v: hm.generate_target(jj, v, (64, 64), (16, 16), 1.5)
        )(jnp.asarray(joints), jnp.asarray(vis))
        return {"image": jnp.asarray(imgs), "target": tgt, "target_weight": tw}

    for _ in range(120):
        state, metrics = step(state, make_batch(16))
    assert float(metrics["loss"]) < 0.01

    ev = {"params": state.params, "batch_stats": state.batch_stats}
    batch = make_batch(32)
    q = quantize_hrnet(model, ev, batch["image"][:8])
    hm_f32 = np.asarray(model.apply(ev, batch["image"], train=False))
    hm_i8 = np.asarray(hrnet_int8_apply(model.config, q, batch["image"]))

    def peaks(h):
        B, H, W, Jj = h.shape
        flat = h.reshape(B, H * W, Jj).argmax(1)
        return np.stack([flat % W, flat // W], -1)

    d = np.abs(peaks(hm_f32) - peaks(hm_i8))
    assert d.max() <= 1, d.max()
    assert np.corrcoef(hm_f32.ravel(), hm_i8.ravel())[0, 1] > 0.99


def test_fused_blocks_match_per_op_walk(tiny_setup):
    """The Pallas fused branch-chain path (interpret mode on CPU) must
    reproduce the per-op int8 walk on the full tiny model."""
    model, variables, q, rng = tiny_setup
    x = jnp.asarray(rng.normal(0, 1.0, (2, 64, 64, 3)), jnp.float32)
    ref = hrnet_int8_apply(model.config, q, x, fused_blocks=False)
    out = hrnet_int8_apply(model.config, q, x, fused_blocks=True)
    assert out.shape == ref.shape
    # identical int8 dataflow; only f32 rounding ties may differ
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2, rtol=1e-3)


def test_fused_min_width_matches_per_op_walk(tiny_setup):
    """Selective chain fusion (only branches with channel width >= the
    threshold run the Pallas kernel; branch0 stays per-op) must
    reproduce the plain walk."""
    model, variables, q, rng = tiny_setup
    x = jnp.asarray(rng.normal(0, 1.0, (2, 64, 64, 3)), jnp.float32)
    ref = hrnet_int8_apply(model.config, q, x)
    widths = sorted(
        c * 1 for c in model.config.stage2.num_channels
    )
    out = hrnet_int8_apply(model.config, q, x, fused_min_width=widths[-1])
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2, rtol=1e-3)


@pytest.mark.smoke
def test_s2d_walk_bit_exact(tiny_setup):
    """The space-to-depth packed branch0 (ops/s2d.py) is a pure weight
    re-scatter: its int8 walk must equal the standard walk EXACTLY."""
    model, variables, q, rng = tiny_setup
    assert q.get("convs_s2d"), "packed twins missing from quantize_hrnet"
    x = jnp.asarray(rng.normal(0, 1.2, (2, 64, 64, 3)), jnp.float32)
    std = np.asarray(hrnet_int8_apply(model.config, q, x, s2d=False))
    packed = np.asarray(hrnet_int8_apply(model.config, q, x, s2d=True))
    np.testing.assert_array_equal(packed, std)


def test_s2d_sites_cover_branch0(tiny_setup):
    from spacecraft_pose_estimation_tpu.models.hrnet_int8 import _s2d_sites

    model, variables, q, _ = tiny_setup
    sites = _s2d_sites(model.config)
    assert sites["transition1/adapt0"] == "entry"
    # every branch0 block conv of every module is covered
    for name in q["convs"]:
        if "/branch0/" in name and name.endswith(("conv1", "conv2")):
            assert name in sites, name


@pytest.mark.smoke
def test_merge_fuse_bit_exact(tiny_setup):
    """merge_fuse concatenates same-source fuse-exchange convs into one
    conv + static slices — pure op packing, so the walk must equal the
    standard int8 walk EXACTLY (per-channel accumulate/requant unchanged,
    mixed relu handled as a per-channel lower clip bound)."""
    model, variables, q, rng = tiny_setup
    x = jnp.asarray(rng.normal(0, 1.2, (2, 64, 64, 3)), jnp.float32)
    std = np.asarray(hrnet_int8_apply(model.config, q, x, s2d=False))
    merged = np.asarray(
        hrnet_int8_apply(model.config, q, x, s2d=False, merge_fuse=True)
    )
    np.testing.assert_array_equal(merged, std)
    # the tiny config's stage3 exchange has real >=2-member families
    # (ups j=2: {up0_2, up1_2}; downs j=0: {down1_0_0, down2_0_0}) — make
    # sure the merge path actually fired rather than falling through
    from spacecraft_pose_estimation_tpu.models.hrnet_int8 import (
        _Handle,
        _Int8Ops,
    )

    ops = _Int8Ops(q, x, q["in_scale"], s2d=False, merge_fuse=True)
    got = ops._merged_fuse_conv(
        "stage3_m0/fuse/up0_2",
        _Handle(jnp.zeros((1, 16, 16, 16), jnp.int8), None, "t", "std"),
        1, False,
    )
    assert got is not None and len(ops._merge_cache) >= 2


def test_fold_residual_close_to_walk_and_f32(tiny_setup):
    """fold_residual skips the int8 materialization between a conv and
    its residual add (the add consumes the pre-round f32 epilogue). Not
    bit-identical to the per-op walk — one intermediate quantization is
    skipped, which can only move the result TOWARD the f32 model — so
    assert closeness to both."""
    model, variables, q, rng = tiny_setup
    x = jnp.asarray(rng.normal(0, 1.2, (2, 64, 64, 3)), jnp.float32)
    ref_f32 = np.asarray(model.apply(variables, x, train=False))
    walk = np.asarray(hrnet_int8_apply(model.config, q, x, s2d=False))
    fold = np.asarray(
        hrnet_int8_apply(model.config, q, x, s2d=False, fold_residual=True)
    )
    scale = np.abs(ref_f32).max() + 1e-9
    # folded output must stay at least as faithful to f32 as the walk
    assert np.abs(fold - ref_f32).max() / scale < 0.2
    assert np.corrcoef(fold.ravel(), ref_f32.ravel())[0, 1] > 0.97
    # and must agree with the standard int8 walk to quantization noise
    assert np.abs(fold - walk).max() / scale < 0.1
    assert np.corrcoef(fold.ravel(), walk.ravel())[0, 1] > 0.995


def test_fold_residual_w32_jits():
    """The flagship config must trace cleanly with folding on (every
    relu=False non-fuse-up site hands f32 to its add)."""
    model = HRNet(config=POSE_HRNET_W32.with_joints(11))
    variables = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 64, 64, 3)), train=False),
        jax.random.key(0),
    )
    # shape-level walk: quantize needs real arrays, so run a tiny real init
    model_t = HRNet(config=HRNET_TINY.with_joints(5))
    rng = np.random.default_rng(3)
    vt = model_t.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False)
    calib = jnp.asarray(rng.normal(0, 1.0, (2, 64, 64, 3)), jnp.float32)
    qt = quantize_hrnet(model_t, vt, calib)
    x = jnp.asarray(rng.normal(0, 1.0, (1, 64, 64, 3)), jnp.float32)
    out = jax.jit(
        lambda q, x: hrnet_int8_apply(model_t.config, q, x, fold_residual=True)
    )(qt, x)
    assert out.shape == (1, 16, 16, 5)


def test_fold_fuse_up_close_to_walk(tiny_setup):
    """fold_fuse_up extends folding through the fuse-layer upsample
    (broadcast fuses into the add). Same closeness contract."""
    model, variables, q, rng = tiny_setup
    x = jnp.asarray(rng.normal(0, 1.2, (2, 64, 64, 3)), jnp.float32)
    ref_f32 = np.asarray(model.apply(variables, x, train=False))
    walk = np.asarray(hrnet_int8_apply(model.config, q, x, s2d=False))
    fold = np.asarray(hrnet_int8_apply(
        model.config, q, x, s2d=False, fold_residual=True, fold_fuse_up=True
    ))
    scale = np.abs(ref_f32).max() + 1e-9
    assert np.abs(fold - ref_f32).max() / scale < 0.2
    assert np.corrcoef(fold.ravel(), ref_f32.ravel())[0, 1] > 0.97
    assert np.abs(fold - walk).max() / scale < 0.1
    assert np.corrcoef(fold.ravel(), walk.ravel())[0, 1] > 0.995


def test_fold_normalize_close_to_standard_walk(tiny_setup):
    """fold_normalize absorbs ImageNet (x-mean)/std into stem1's bf16
    weights so the model consumes raw [0,255] crops (saves the f32
    normalized-crop HBM round trip in serving). Interior stem outputs
    match to bf16 rounding; only the 1-px zero-pad ring changes meaning
    (raw-black vs mean-gray) — so assert closeness, not bit equality."""
    from spacecraft_pose_estimation_tpu.pipeline import normalize_crops

    model, variables, q, rng = tiny_setup
    raw = jnp.asarray(rng.uniform(0, 255, (2, 64, 64, 3)), jnp.float32)
    std_walk = np.asarray(
        hrnet_int8_apply(model.config, q, normalize_crops(raw), s2d=False)
    )
    folded = np.asarray(
        hrnet_int8_apply(model.config, q, raw, s2d=False, fold_normalize=True)
    )
    scale = np.abs(std_walk).max() + 1e-9
    assert np.abs(folded - std_walk).max() / scale < 0.1
    assert np.corrcoef(folded.ravel(), std_walk.ravel())[0, 1] > 0.995


def test_fold_normalize_pipeline_feeds_raw_crops(tiny_setup):
    """make_landmark_stage must skip normalize_crops when the model
    declares consumes_raw_pixels, and decode keypoints close to the
    standard int8 path's."""
    from spacecraft_pose_estimation_tpu.pipeline import (
        PipelineConfig,
        make_landmark_stage,
    )

    model, variables, q, _ = tiny_setup
    rng = np.random.default_rng(42)
    frames = jnp.asarray(rng.uniform(0, 255, (2, 96, 96, 3)), jnp.float32)
    boxes = jnp.asarray([[16.0, 16.0, 64.0, 64.0]] * 2)
    cfg = PipelineConfig(image_size=(64, 64), solver="none")
    std_stage = make_landmark_stage(HRNetInt8(model.config), cfg)
    nf_stage = make_landmark_stage(
        HRNetInt8(model.config, fold_normalize=True), cfg
    )
    out_std = std_stage(q, frames, boxes)
    out_nf = nf_stage(q, frames, boxes)
    # near-identical heatmaps. (Decoded keypoints are NOT compared:
    # argmax over an untrained net's near-flat noise is chaotic; the
    # trained-net pose-error budget lives in test_e2e_accuracy.)
    hs = np.asarray(out_std["heatmaps"])
    hn = np.asarray(out_nf["heatmaps"])
    assert np.corrcoef(hs.ravel(), hn.ravel())[0, 1] > 0.995
