"""Post-training int8 quantization of the HRNet trunk (classic head).

TPU-native serving path: v5e's MXU runs int8 at ~2x bf16 throughput and
int8 activations halve HBM traffic — and the bf16 HRNet is HBM-bound
(measured ~100 GB of activation traffic per 128-batch at bf16). Measured
end-to-end: 1533 fps vs 1086 fps bf16 on a single v5e chip at batch 128.

Scheme (standard PTQ, reference model: lib/models/pose_hrnet.py:274-460):
  * BatchNorm folded into conv weights (eval mode, running stats),
  * symmetric per-output-channel int8 weights,
  * symmetric per-tensor int8 activations, scales calibrated from a
    bf16 forward (abs-max over a calibration batch),
  * int32 accumulation (``preferred_element_type``), f32 requant epilogue
    fused by XLA into the conv,
  * residual/fuse sums computed in f32 from int8 operands, requantized,
  * stem1 (C_in=3) kept in bf16 — int8 convs with 3 input channels are
    slower than bf16 on the MXU — and the final 1x1 head emits f32.

Single-source topology: ``_forward`` walks the exact structure of
``HRNet.__call__`` (classic head) once, driven by an ops object — the
quantizer (_QuantizeOps) and the int8 executor (_Int8Ops) both run the
same walk, so the two can never drift structurally.
"""

from __future__ import annotations

import os
import re
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .hrnet import HRNet, HRNetConfig
from .layers import BN_EPS, block_expansion


class _Handle(NamedTuple):
    """Dataflow token threaded through the walk."""

    value: Any  # int8 tensor (_Int8Ops) or None (_QuantizeOps)
    scale: Any  # f32 activation scale of `value`
    site: str
    # activation layout: 'std', or the s2d cell packings 'even'/'odd'
    # (ops/s2d.py — the 32ch 128^2 branch runs 2x2-cell-packed so its
    # convs fill all 128 MXU lanes instead of 32)
    layout: str = "std"


def _upsample_i8(x, factor: int):
    b, h, w, c = x.shape
    y = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, factor, w, factor, c))
    return y.reshape(b, h * factor, w * factor, c)


class _QuantizeOps:
    """Walk in 'collect' mode: folds BN, quantizes weights, precomputes
    requant multipliers from the calibrated activation-scale table."""

    def branch_chain(self, prefix, branch, nblocks, h):
        return None  # collect mode visits every per-op site

    def layer1_chain(self, nblocks, h):
        return None

    def fuse_exchange(self, prefix, i, ys, downs):
        return None

    def __init__(self, params, stats, scales):
        self.params = params
        self.stats = stats
        self.scales = scales  # site -> activation scale (amax/127)
        self.q: dict = {"convs": {}, "adds": {}, "final": {}}

    def _node(self, tree, name):
        node = tree
        for part in name.split("/"):
            node = node[part]
        return node

    def has(self, name):
        try:
            self._node(self.params, name)
            return True
        except KeyError:
            return False

    def _fold_bn(self, name):
        p = self._node(self.params, name)
        st = self._node(self.stats, name)["bn"]
        bn = p["bn"]
        gamma_hat = np.asarray(bn["scale"]) / np.sqrt(np.asarray(st["var"]) + BN_EPS)
        beta = np.asarray(bn["bias"]) - np.asarray(st["mean"]) * gamma_hat
        w = np.asarray(p["conv"]["kernel"], np.float32) * gamma_hat  # HWIO * (O,)
        return w, beta

    def input_(self, x=None):
        return _Handle(None, float(self.scales["input"]), "input")

    def stem_conv_bf16(self, name, h):
        """First conv stays bf16; output requantized to int8."""
        w, beta = self._fold_bn(name)
        s_out = float(self.scales[name])
        self.q["convs"][name] = {
            "w_bf16": jnp.asarray(w, jnp.bfloat16),
            "m": jnp.asarray(np.full(w.shape[-1], 1.0 / s_out), jnp.float32),
            "b": jnp.asarray(beta / s_out, jnp.float32),
        }
        if name == "stem1":
            # Normalize-folded variant: consumes raw [0,255] crops, the
            # ImageNet (x-mean)/std absorbed into weights/bias. Interior
            # outputs match the normalized path to bf16 rounding; only
            # the 1-px zero-pad border ring changes meaning (raw-black
            # vs mean-gray). Executed when fold_normalize=True; stored
            # under its own key so a flag/tree mismatch raises KeyError
            # instead of silently mis-scaling.
            from ..pipeline import IMAGENET_MEAN, IMAGENET_STD

            mean = np.asarray(IMAGENET_MEAN, np.float32) * 255.0
            std = np.asarray(IMAGENET_STD, np.float32) * 255.0
            wr = w / std[None, None, :, None]
            br = beta - (wr * mean[None, None, :, None]).sum((0, 1, 2))
            self.q.setdefault("convs_raw", {})[name] = {
                "w_bf16": jnp.asarray(wr, jnp.bfloat16),
                "m": jnp.asarray(np.full(w.shape[-1], 1.0 / s_out), jnp.float32),
                "b": jnp.asarray(br / s_out, jnp.float32),
            }
        return _Handle(None, s_out, name)

    def convbn(self, name, h, stride, relu):
        w, beta = self._fold_bn(name)
        s_w = np.maximum(np.abs(w).reshape(-1, w.shape[-1]).max(0), 1e-12) / 127.0
        w8 = np.clip(np.round(w / s_w), -127, 127).astype(np.int8)
        s_out = float(self.scales[name])
        self.q["convs"][name] = {
            "w8": jnp.asarray(w8),
            "m": jnp.asarray(h.scale * s_w / s_out, jnp.float32),
            "b": jnp.asarray(beta / s_out, jnp.float32),
        }
        return _Handle(None, s_out, name)

    def add(self, name, hs, relu):
        s_out = float(self.scales[name])
        self.q["adds"][name] = {
            "coeffs": jnp.asarray([h.scale / s_out for h in hs], jnp.float32)
        }
        return _Handle(None, s_out, name)

    def upsample(self, h, factor, like=None):
        return h

    def final(self, name, h):
        p = self._node(self.params, name)
        w = np.asarray(p["kernel"], np.float32)
        s_w = np.maximum(np.abs(w).reshape(-1, w.shape[-1]).max(0), 1e-12) / 127.0
        w8 = np.clip(np.round(w / s_w), -127, 127).astype(np.int8)
        self.q["final"] = {
            "w8": jnp.asarray(w8),
            "m": jnp.asarray(h.scale * s_w, jnp.float32),
            "b": jnp.asarray(p["bias"], jnp.float32),
        }
        return None


class _Int8Ops:
    """Walk in 'execute' mode over the quantized tree."""

    def __init__(self, q, x, in_scale, fused_blocks: bool = False,
                 s2d: bool | None = None, layer1_strips: bool | None = None,
                 fused_even3: bool | None = None,
                 fused_min_width: int | None = None,
                 fold_residual: bool = False,
                 fold_fuse_up: bool = False,
                 merge_fuse: bool = False,
                 fold_normalize: bool = False):
        self.q = q
        self.x = x
        self.in_scale = in_scale
        # fold_normalize: stem1 executes the 'stem1_raw' weights (ImageNet
        # normalize folded in); ``x`` must then be RAW [0,255] crops.
        self.fold_normalize = fold_normalize
        self.fused_blocks = fused_blocks
        # merge_fuse: concatenate same-source fuse-exchange convs (the
        # up{i}_{j} 1x1s and down{i}_{j}_0 stride-2 3x3s that all read
        # branch j) into one full(er)-lane conv + static output slices.
        # The 32/64-out-lane sites are under the 128-lane MXU tile; the
        # merged conv runs at 96-224 lanes and reads the source
        # activation from HBM once instead of per-target. Bit-exact vs
        # the per-op walk (probe_r11). Mutually exclusive with
        # s2d/fold_residual, which re-route the same sites.
        self.merge_fuse = merge_fuse
        self._merge_cache: dict[str, _Handle] = {}
        # fold_fuse_up: also hand the fuse-layer up-1x1 conv outputs to
        # their adds as pre-round f32 THROUGH the nearest upsample — the
        # upsample is a broadcast+reshape XLA fuses into the add's read,
        # so neither the int8 low-res tensor nor the upsampled f32 is
        # materialized. Separate knob: if XLA materializes the broadcast
        # after all, f32 costs 4x the int8 bytes. Requires fold_residual.
        self.fold_fuse_up = fold_fuse_up
        # fold_residual: convs that feed ONLY a residual/fuse add
        # (relu=False sites except the fuse up-1x1s, whose output is
        # upsampled first) skip their int8 materialization — the add
        # consumes the pre-round f32 epilogue, so XLA can fuse
        # conv->requant->add->requant into ONE output fusion instead of
        # paying an int8 write+read of the activation per block. NOT
        # bit-identical to the per-op walk (one intermediate quantization
        # is skipped — strictly CLOSER to the f32 model); gated by the
        # pose-error acceptance test.
        self.fold_residual = fold_residual
        # Selective chain fusion: fuse only branches whose channel width
        # is >= this (the wide low-res branches, where the in-kernel dots
        # run at N>=64 lanes AND the per-op walk pays ~35 us/site
        # dispatch overhead on tiny grids — stage3/4 measure ~28% over
        # their static rooflines with ~200 op sites each). branch0
        # (N=32-starved dots) stays per-op.
        self.fused_min_width = fused_min_width
        # s2d branch0: auto-on when the packed weights are present
        self.s2d = bool(q.get("convs_s2d")) if s2d is None else s2d
        # even3-packed fused branch chains (full-lane in-kernel dots +
        # VMEM residency); requires s2d. Default OFF: the kernel measured
        # 5.57 ms/branch-chain vs 2.82 for the direct per-op walk
        # (probe_r3g) — the packed dots fill the lanes but the kernel is
        # still dot-issue-bound vs XLA's pipelined int8 convs.
        self.fused_even3 = False if fused_even3 is None else fused_even3
        # strip-mined fused layer1 (the ~14.5 ms/b128 HBM item): default
        # OFF — the kernel's slab-DMA form still crashes the Mosaic
        # remote compile helper (HTTP 500, probe_r3c) even with the
        # lane-tile cin pad; opt in explicitly once it compiles
        self.layer1_strips = bool(layer1_strips)

    def branch_chain(self, prefix, branch, nblocks, h):
        """Whole-branch BasicBlock chain as ONE Pallas kernel
        (ops/pallas_blocks.py): activation tile resident in VMEM across
        2*nblocks convs + nblocks residual adds — the per-op XLA walk is
        HBM-roofline-bound (see module docstring).

        even3-packed variant: when branch0 runs space-to-depth packed,
        the SAME kernel gets (3,3,4C,4C) packed weights — in-kernel dots
        are K=384/N=128 (full MXU lanes) instead of the starved K=96/
        N=32 std shapes that made the round-2 std chains 3x slower."""
        if h.layout == "even" and self.fused_even3:
            from ..ops.pallas_blocks import (
                chain_params_even3_from_q,
                fused_basic_block_chain,
            )

            packed = chain_params_even3_from_q(self.q, prefix, branch, nblocks)
            if packed is not None:
                w, m, b, cf = packed
                out = fused_basic_block_chain(h.value, w, m, b, cf, nblocks)
                return _Handle(
                    out, None, f"{prefix}/branch{branch}/fused_e3", "even"
                )
        if h.layout != "std":
            return None
        width_ok = (
            self.fused_min_width is not None
            and h.value is not None
            and h.value.shape[-1] >= self.fused_min_width
        )
        if not (self.fused_blocks or width_ok):
            return None
        from ..ops.pallas_blocks import (
            chain_params_from_q,
            fused_basic_block_chain,
        )

        packed = chain_params_from_q(self.q, prefix, branch, nblocks)
        if packed is None:
            return None
        w, m, b, cf = packed
        out = fused_basic_block_chain(h.value, w, m, b, cf, nblocks)
        return _Handle(out, None, f"{prefix}/branch{branch}/fused")

    def layer1_chain(self, nblocks, h):
        """layer1's Bottleneck x4 as one VMEM-resident Pallas kernel —
        the largest single IO item in the per-op roofline (~16 ms at
        b128; see ops/pallas_blocks.fused_bottleneck_chain)."""
        if self.layer1_strips and h.layout == "std":
            from ..ops.pallas_blocks import (
                bottleneck_params_from_q,
                fused_bottleneck_chain_strips,
            )

            p = bottleneck_params_from_q(self.q, nblocks)
            if p is not None and h.value.shape[1] % 32 == 0:
                out = fused_bottleneck_chain_strips(
                    h.value,
                    p["w1"], p["m1"], p["b1"],
                    p["w2"], p["m2"], p["b2"],
                    p["w3"], p["m3"], p["b3"],
                    p["wd"], p["md"], p["bd"],
                    p["coeffs"],
                    nblocks,
                    strip=32,
                )
                return _Handle(out, None, "layer1/strips")
        if not self.fused_blocks:
            return None
        from ..ops.pallas_blocks import (
            bottleneck_params_from_q,
            fused_bottleneck_chain,
        )

        p = bottleneck_params_from_q(self.q, nblocks)
        if p is None:
            return None
        # VMEM guard (row-chunked kernel): besides the int8 scratch refs
        # and ~4 MB of widened row-chunk values, Mosaic double-buffers
        # the in/out grid blocks (2x (hw*cin + hw*cout) int8). Measured:
        # 20.2 MB scoped at 128^2x256 — still over the 16 MB budget, so
        # full-res layer1 stays per-op for now.
        hw = h.value.shape[1] * h.value.shape[2]
        cout = p["w3"].shape[-1]
        cm = p["w2"].shape[-1]
        if hw * (cout + 2 * cm) > 4_000_000:
            return None
        out = fused_bottleneck_chain(
            h.value,
            p["w1"], p["m1"], p["b1"],
            p["w2"], p["m2"], p["b2"],
            p["w3"], p["m3"], p["b3"],
            p["wd"], p["md"], p["bd"],
            p["coeffs"],
            nblocks,
        )
        return _Handle(out, None, "layer1/fused")

    def fuse_exchange(self, prefix, i, ys, downs):
        """Fuse-layer exchange output i: up 1x1 convs + nearest upsample
        + n-way weighted add + relu in one VMEM pass
        (ops/pallas_blocks.fused_up_exchange).

        DISABLED pending a Mosaic fix: the 5-D broadcast-add upsample
        crashes the TPU compile helper (HTTP 500 from remote_compile;
        interpret mode and the other two kernels are fine). The per-op
        exchange is used instead; re-enable via _SPE_FUSE_EXCHANGE=1 to
        debug."""
        import os

        if os.environ.get("_SPE_FUSE_EXCHANGE") != "1":
            return None
        if not self.fused_blocks or any(y.layout != "std" for y in ys):
            return None
        from ..ops.pallas_blocks import fused_up_exchange

        n = len(ys)
        ups = []
        for j in range(i + 1, n):
            c = self.q["convs"].get(f"{prefix}/fuse/up{i}_{j}")
            if c is None:
                return None
            ups.append((ys[j].value, c["w8"][0, 0], c["m"], c["b"]))
        coeffs = jnp.asarray(
            self.q["adds"][f"{prefix}/fuse/out{i}"]["coeffs"], jnp.float32
        )
        out = fused_up_exchange(
            ys[i].value, [d.value for d in downs], ups, coeffs
        )
        return _Handle(out, None, f"{prefix}/fuse/out{i}/fused")

    def has(self, name):
        return name in self.q["convs"]

    def input_(self, x=None):
        return _Handle(self.x, None, "input")

    def stem_conv_bf16(self, name, h):
        c = (self.q["convs_raw"] if self.fold_normalize else self.q["convs"])[name]
        y = jax.lax.conv_general_dilated(
            h.value.astype(jnp.bfloat16),
            c["w_bf16"],
            (2, 2),
            [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        f = jnp.maximum(y.astype(jnp.float32) * c["m"] + c["b"], 0)
        return _Handle(
            jnp.clip(jnp.round(f), -127, 127).astype(jnp.int8), None, name
        )

    def convbn(self, name, h, stride, relu):
        if self.merge_fuse:
            mh = self._merged_fuse_conv(name, h, stride, relu)
            if mh is not None:
                return mh
        if self.s2d:
            c2 = self.q["convs_s2d"].get(name)
            if c2 is not None:
                return self._convbn_s2d(name, h, stride, relu, c2)
        c = self.q["convs"][name]
        k = c["w8"].shape[0]
        y = jax.lax.conv_general_dilated(
            h.value if h.layout == "std" else self._requant(h).value,
            c["w8"],
            (stride, stride),
            [(k // 2, k // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        f = y.astype(jnp.float32) * c["m"] + c["b"]
        if relu:
            f = jnp.maximum(f, 0)
        if (
            self.fold_residual
            and not relu
            and ("/fuse/up" not in name or self.fold_fuse_up)
            and h.layout == "std"
        ):
            # consumer is a residual/fuse add at the same resolution:
            # hand it the pre-round f32 epilogue (value in s_out units)
            return _Handle(f, None, name, "f32pre")
        return _Handle(
            jnp.clip(jnp.round(f), -127, 127).astype(jnp.int8), None, name
        )

    _UP_RE = re.compile(r"^(?P<p>.+)/fuse/up(?P<i>\d+)_(?P<j>\d+)$")
    _DN0_RE = re.compile(r"^(?P<p>.+)/fuse/down(?P<i>\d+)_(?P<j>\d+)_0$")

    def _merged_fuse_conv(self, name, h, stride, relu):
        """One concatenated conv for all fuse convs reading branch j.

        Bit-exact vs the per-op walk: each output channel keeps its own
        int32 accumulation and requant scale/bias; a family's mixed relu
        flags (a down chain's k=0 conv is relu unless it is also the
        last) become a per-channel lower clip bound — relu-before-round
        equals clip-at-0-after-round (only the sign matters).
        Returns None (fall through to the per-op path) for non-fuse
        sites, single-member families, and the s2d/fold_residual modes
        that re-route these sites."""
        if self.s2d or self.fold_residual or h.layout != "std":
            return None
        cached = self._merge_cache.get(name)
        if cached is not None:
            return cached
        m_up = self._UP_RE.match(name)
        m_dn = None if m_up else self._DN0_RE.match(name)
        m = m_up or m_dn
        if m is None:
            return None
        p, j = m.group("p"), int(m.group("j"))
        if m_up:
            fam = [(f"{p}/fuse/up{i}_{j}", False) for i in range(j)
                   if f"{p}/fuse/up{i}_{j}" in self.q["convs"]]
        else:
            fam = [(f"{p}/fuse/down{i}_{j}_0", i - j > 1)
                   for i in range(j + 1, j + 9)
                   if f"{p}/fuse/down{i}_{j}_0" in self.q["convs"]]
        if len(fam) < 2:
            return None
        assert dict(fam)[name] == relu, (name, relu)
        convs = [self.q["convs"][s] for s, _ in fam]
        wcat = jnp.concatenate([c["w8"] for c in convs], axis=-1)
        mcat = jnp.concatenate([c["m"] for c in convs])
        bcat = jnp.concatenate([c["b"] for c in convs])
        lo = jnp.concatenate([
            jnp.full(c["w8"].shape[-1], 0.0 if r else -127.0, jnp.float32)
            for c, (_, r) in zip(convs, fam)
        ])
        k = wcat.shape[0]
        y = jax.lax.conv_general_dilated(
            h.value, wcat, (stride, stride), [(k // 2, k // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        q8 = jnp.clip(
            jnp.round(y.astype(jnp.float32) * mcat + bcat), lo, 127.0
        ).astype(jnp.int8)
        off = 0
        for (s, _), c in zip(fam, convs):
            n = c["w8"].shape[-1]
            self._merge_cache[s] = _Handle(q8[..., off:off + n], None, s)
            off += n
        return self._merge_cache[name]

    def _requant(self, h):
        """Round a pre-round f32pre handle back to int8 (safety net for
        consumers other than `add`; unused on the standard walk)."""
        assert h.layout == "f32pre", h
        return _Handle(
            jnp.clip(jnp.round(h.value), -127, 127).astype(jnp.int8),
            None, h.site,
        )

    def _convbn_s2d(self, name, h, stride, relu, c2):
        """Space-to-depth-packed conv sites (ops/s2d.py): branch0 runs
        with 2x2 cells packed into channels so every conv is 128 lanes
        wide (bit-exact vs the std int8 walk). The conv kind follows
        from (layout, stride): std input = entry (k=4 s2 packed-out);
        packed input at stride 2 = down (std half-res out); packed input
        at stride 1 alternates even<->odd."""
        from ..ops import s2d as s2d_ops

        if h.layout == "std":
            assert c2["w8p"].shape[0] == 4, name  # entry
            y = s2d_ops.conv_std_to_even(h.value, c2["w8p"])
            out_layout = "even"
        elif stride == 2:
            assert h.layout == "even", h
            y = s2d_ops.conv_even_down(h.value, c2["w8p"])
            out_layout = "std"
        elif h.layout == "even" and c2["w8p"].shape[0] == 3:
            y = s2d_ops.conv_even3(h.value, c2["w8p"])  # even3 scheme
            out_layout = "even"
        elif h.layout == "even":
            y = s2d_ops.conv_even_to_odd(h.value, c2["w8p"])
            out_layout = "odd"
        else:
            assert h.layout == "odd", h
            y = s2d_ops.conv_odd_to_even(h.value, c2["w8p"])
            out_layout = "even"
        f = y.astype(jnp.float32) * c2["m"] + c2["b"]
        if relu:
            f = jnp.maximum(f, 0)
        if out_layout == "odd" and os.environ.get("_SPE_S2D_NO_MASK") != "1":
            # fold the structural-slot zeroing into the pre-round value
            # (same fusion group as the requant epilogue — a separate
            # int8 `where` pass costs an extra HBM round trip per conv)
            _, hp, wp, c4 = f.shape
            f = f * s2d_ops.odd_zero_mask(hp, wp, c4 // 4, dtype=jnp.float32)
        q8 = jnp.clip(jnp.round(f), -127, 127).astype(jnp.int8)
        return _Handle(q8, None, name, out_layout)

    def add(self, name, hs, relu):
        coeffs = self.q["adds"][name]["coeffs"]
        # f32pre operands are already real-valued in their site's scale
        # units (pre-round conv epilogues — fold_residual); int8 operands
        # widen on the fly. Both multiply by the same calibrated coeff.
        f = sum(
            (h.value if h.layout == "f32pre" else h.value.astype(jnp.float32))
            * coeffs[i]
            for i, h in enumerate(hs)
        )
        if relu:
            f = jnp.maximum(f, 0)
        out_layout = next(
            (h.layout for h in hs if h.layout != "f32pre"), "std"
        )
        return _Handle(
            jnp.clip(jnp.round(f), -127, 127).astype(jnp.int8), None, name,
            out_layout,
        )

    def upsample(self, h, factor, like=None):
        if like is not None and like.layout == "even":
            from ..ops import s2d as s2d_ops

            return _Handle(
                s2d_ops.upsample_std_to_even(h.value, factor), None, h.site, "even"
            )
        # f32pre passes through: the broadcast fuses into the consuming
        # add (fold_fuse_up), keeping the layout tag so the add skips the
        # int8 widening
        out_layout = "f32pre" if h.layout == "f32pre" else "std"
        return _Handle(_upsample_i8(h.value, factor), None, h.site, out_layout)

    def final(self, name, h):
        if h.layout == "even":
            from ..ops import s2d as s2d_ops

            c = self.q["final_s2d"]
            y = s2d_ops.conv_even_1x1(h.value, c["w8p"])
            f = y.astype(jnp.float32) * c["m"] + c["b"]
            return s2d_ops.unpack_even(f)
        assert h.layout == "std"
        c = self.q["final"]
        y = jax.lax.conv_general_dilated(
            h.value,
            c["w8"],
            (1, 1),
            "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        return y.astype(jnp.float32) * c["m"] + c["b"]


def _forward(ops, cfg: HRNetConfig, x=None):
    """The classic-head HRNet structure (mirrors HRNet.__call__)."""
    h = ops.input_(x)
    h = ops.stem_conv_bf16("stem1", h)
    h = ops.convbn("stem2", h, 2, True)
    fused_l1 = ops.layer1_chain(cfg.stage1_blocks, h)
    if fused_l1 is not None:
        h = fused_l1
    else:
        for i in range(cfg.stage1_blocks):
            hin = h
            y = ops.convbn(f"layer1/block{i}/conv1", hin, 1, True)
            y = ops.convbn(f"layer1/block{i}/conv2", y, 1, True)
            y = ops.convbn(f"layer1/block{i}/conv3", y, 1, False)
            r = (
                ops.convbn(f"layer1/block{i}/down", hin, 1, False)
                if ops.has(f"layer1/block{i}/down")
                else hin
            )
            h = ops.add(f"layer1/block{i}", [y, r], True)
    xs = [h]
    for si, spec in enumerate((cfg.stage2, cfg.stage3, cfg.stage4)):
        exp = block_expansion(spec.block)
        widths = [c * exp for c in spec.num_channels]
        n_pre = len(xs)
        new_xs = []
        for i in range(len(widths)):
            if i < n_pre:
                name = f"transition{si + 1}/adapt{i}"
                new_xs.append(
                    ops.convbn(name, xs[i], 1, True) if ops.has(name) else xs[i]
                )
            else:
                y = xs[-1]
                for j in range(i + 1 - n_pre):
                    y = ops.convbn(f"transition{si + 1}/new{i}_{j}", y, 2, True)
                new_xs.append(y)
        xs = new_xs
        last_stage = si == 2
        for m in range(spec.num_modules):
            multi = not (last_stage and m == spec.num_modules - 1)
            prefix = f"stage{si + 2}_m{m}"
            ys = []
            for bi in range(len(xs)):
                hcur = xs[bi]
                fused = ops.branch_chain(prefix, bi, spec.num_blocks[bi], hcur)
                if fused is not None:
                    ys.append(fused)
                    continue
                for k in range(spec.num_blocks[bi]):
                    bn = f"{prefix}/branch{bi}/block{k}"
                    y = ops.convbn(f"{bn}/conv1", hcur, 1, True)
                    y = ops.convbn(f"{bn}/conv2", y, 1, False)
                    if ops.has(f"{bn}/down"):
                        hcur = ops.convbn(f"{bn}/down", hcur, 1, False)
                    hcur = ops.add(bn, [y, hcur], True)
                ys.append(hcur)
            if len(ys) == 1:
                xs = ys
                continue
            out_n = len(ys) if multi else 1
            outs = []
            for i in range(out_n):
                # down chains stay per-op (strided convs, small outputs);
                # the up 1x1s + upsamples + n-way add can fuse into one
                # kernel pass at the destination resolution
                downs = []
                for j in range(i):
                    y = ys[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        y = ops.convbn(
                            f"{prefix}/fuse/down{i}_{j}_{k}", y, 2, not last
                        )
                    downs.append(y)
                fused_out = ops.fuse_exchange(prefix, i, ys, downs)
                if fused_out is not None:
                    outs.append(fused_out)
                    continue
                acc = [ys[i]]
                ai = 0
                for j in range(len(ys)):
                    if j == i:
                        continue
                    if j > i:
                        y = ops.convbn(f"{prefix}/fuse/up{i}_{j}", ys[j], 1, False)
                        y = ops.upsample(y, 2 ** (j - i), like=ys[i])
                    else:
                        y = downs[ai]
                        ai += 1
                    acc.append(y)
                outs.append(ops.add(f"{prefix}/fuse/out{i}", acc, True))
            xs = outs
    return ops.final("final_layer", xs[0])


def _s2d_sites(cfg: HRNetConfig) -> dict[str, str]:
    """name -> kind of every conv site the s2d-packed branch0 touches.

    Kinds: 'entry' (std input, even-packed output, k=4 s2),
    'alt' (the alternating even<->odd 2x2 convs inside BasicBlocks),
    'down' (even-packed input, std half-res output).
    Must mirror the structure of :func:`_forward` exactly.
    """
    sites: dict[str, str] = {"transition1/adapt0": "entry"}
    specs = (cfg.stage2, cfg.stage3, cfg.stage4)
    for si, spec in enumerate(specs):
        last_stage = si == 2
        for m in range(spec.num_modules):
            prefix = f"stage{si + 2}_m{m}"
            for k in range(spec.num_blocks[0]):
                sites[f"{prefix}/branch0/block{k}/conv1"] = "alt"
                sites[f"{prefix}/branch0/block{k}/conv2"] = "alt"
            multi = not (last_stage and m == spec.num_modules - 1)
            n_br = len(spec.num_channels)
            if n_br > 1:
                out_n = n_br if multi else 1
                for i in range(1, out_n):
                    sites[f"{prefix}/fuse/down{i}_0_0"] = "down"
    return sites


def s2d_pack_quantized(q: dict, cfg: HRNetConfig, scheme: str = "even3") -> dict:
    """Add packed-weight twins for the branch0 sites (ops/s2d.py weight
    scatters — the packed convs are bit-exact vs the per-op int8 walk).
    Host-side numpy; idempotent.

    scheme='even3': every branch conv is a 3x3 even->even packed conv
    (4x MACs at 4x lane utilization, clean 64^2 shapes — measured faster
    on v5e than both the direct conv and the alternating 2x2 scheme).
    scheme='alt': the alternating even<->odd 2x2 scheme (1.78x MACs but
    odd-aligned 65^2 intermediates; kept for experimentation)."""
    from ..ops import s2d as s2d_ops

    if cfg.head != "classic":
        raise NotImplementedError("s2d packing covers the classic head only")
    packed: dict = {}
    for name, kind in _s2d_sites(cfg).items():
        c = q["convs"].get(name)
        if c is None:
            continue
        w8 = np.asarray(c["w8"])
        if kind == "entry":
            wp = s2d_ops.w3_pack_from_std(w8)
        elif kind == "alt":
            wp = (s2d_ops.w3_pack_even3(w8) if scheme == "even3"
                  else s2d_ops.w3_pack_alt(w8))
        else:  # down
            wp = s2d_ops.w3_pack_down(w8)
        # NOTE: no 'kind' string in the tree — q rides through jit as an
        # argument, so every leaf must be an array; the executor derives
        # the conv kind from the handle layout + stride instead.
        ent = {"w8p": jnp.asarray(wp)}
        if kind in ("entry", "alt"):  # packed output: tile requant vectors
            ent["m"] = jnp.asarray(s2d_ops.tile_vec(np.asarray(c["m"])), jnp.float32)
            ent["b"] = jnp.asarray(s2d_ops.tile_vec(np.asarray(c["b"])), jnp.float32)
        else:
            ent["m"], ent["b"] = c["m"], c["b"]
        packed[name] = ent
    fin = q.get("final")
    if fin:
        packed_final = {
            "w8p": jnp.asarray(s2d_ops.w1_pack(np.asarray(fin["w8"]))),
            "m": jnp.asarray(s2d_ops.tile_vec(np.asarray(fin["m"])), jnp.float32),
            "b": jnp.asarray(s2d_ops.tile_vec(np.asarray(fin["b"])), jnp.float32),
        }
        q = dict(q)
        q["final_s2d"] = packed_final
    q["convs_s2d"] = packed
    return q


def _collect_scales(model: HRNet, variables, calib_x) -> dict[str, float]:
    """Run a captured forward; abs-max activation scale per requant site."""
    _, inter = model.apply(
        variables, calib_x, train=False, capture_intermediates=True,
        mutable=["intermediates"],
    )
    inter = inter["intermediates"]

    def amax(v):
        return float(jnp.max(jnp.abs(v.astype(jnp.float32))))

    def node(path):
        n = inter
        for p in path:
            n = n[p]
        return n["__call__"][0]

    scales: dict[str, float] = {"input": amax(calib_x) / 127.0}

    def visit(prefix, tree):
        for key, sub in tree.items():
            if key == "__call__":
                continue
            path = prefix + [key]
            name = "/".join(path)
            if "__call__" in sub:
                out = sub["__call__"][0]
                if isinstance(out, (tuple, list)):
                    # FuseLayer returns the per-branch output list
                    for i, o in enumerate(out):
                        scales[f"{name}/out{i}"] = max(amax(o) / 127.0, 1e-12)
                else:
                    scales[name] = max(amax(out) / 127.0, 1e-12)
            visit(path, sub)

    visit([], inter)
    # fuse output sites are stored under '<stage>/fuse/out{i}'; the walk
    # names adds '<stage>/fuse/out{i}' as well -- consistent. Block-level
    # add sites use the block path itself (captured as the block's output).
    return scales


def quantize_hrnet(model: HRNet, variables, calib_x, s2d: bool = False) -> dict:
    """Calibrate + quantize. Returns a pytree of int8 kernels and f32
    requant vectors consumable by :func:`hrnet_int8_apply`.

    ``s2d``: also emit the space-to-depth packed twins for the high-res
    branch (bit-exact — ops/s2d.py). Default OFF for serving: although
    the isolated packed convs measure 25% faster, the packed WALK
    measured slower end to end on v5e (111 vs 83.6 ms/b128, probe_r3d);
    kept for experimentation and covered by tests."""
    if model.config.head != "classic":
        raise NotImplementedError("int8 path covers the classic head only")
    scales = _collect_scales(model, variables, calib_x)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables.get("batch_stats", {}))
    ops = _QuantizeOps(params, stats, scales)
    _forward(ops, model.config)
    ops.q["in_scale"] = jnp.float32(scales["input"])
    q = ops.q
    if s2d:
        q = s2d_pack_quantized(q, model.config)
    return q


def hrnet_int8_apply(
    cfg: HRNetConfig, q: dict, x, fused_blocks: bool | None = None,
    s2d: bool | None = None, layer1_strips: bool | None = None,
    fused_even3: bool | None = None, fused_min_width: int | None = None,
    fold_residual: bool = False, fold_fuse_up: bool = False,
    merge_fuse: bool = False, fold_normalize: bool = False,
) -> jnp.ndarray:
    """int8 forward. ``x``: (B, H, W, 3) normalized f32 (same contract as
    the bf16 model), or RAW [0,255] crops when ``fold_normalize=True``
    (the ImageNet normalize is folded into stem1's bf16 weights — saves
    the f32 normalized-crop HBM round trip in serving).
    Returns f32 heatmaps (B, H/4, W/4, J).

    fused_blocks: run each module-branch's BasicBlock chain as one
    Pallas kernel; default = on when the first device is a TPU (the
    interpreter fallback is correct but slow on CPU).
    s2d: run branch0 space-to-depth packed (default: auto — on when the
    q tree carries packed weights, see quantize_hrnet)."""
    if fused_blocks is None:
        # default OFF: the per-op XLA walk measures 1332 fps e2e vs 436
        # with the fused chains — XLA's int8 conv codegen beats the
        # VMEM-constrained Pallas formulation (see DEVNOTES round 2);
        # the kernels remain available for experimentation.
        fused_blocks = False
    ops = _Int8Ops(q, x, q["in_scale"], fused_blocks=fused_blocks, s2d=s2d,
                   layer1_strips=layer1_strips, fused_even3=fused_even3,
                   fused_min_width=fused_min_width,
                   fold_residual=fold_residual, fold_fuse_up=fold_fuse_up,
                   merge_fuse=merge_fuse, fold_normalize=fold_normalize)
    return _forward(ops, cfg, x)


class HRNetInt8:
    """Duck-typed stand-in for :class:`HRNet` in the serving pipeline:
    ``apply(qtree, x, train=False)`` — so ``make_pose_pipeline`` and the
    landmark stage work unchanged with the quantized tree as 'variables'."""

    def __init__(self, config: HRNetConfig, fused_blocks: bool | None = None,
                 s2d: bool | None = None, layer1_strips: bool | None = None,
                 fused_even3: bool | None = None,
                 fused_min_width: int | None = None,
                 fold_residual: bool = False,
                 fold_fuse_up: bool = False,
                 merge_fuse: bool = False,
                 fold_normalize: bool = False):
        self.config = config
        self.fused_blocks = fused_blocks
        self.s2d = s2d
        self.layer1_strips = layer1_strips
        self.fused_even3 = fused_even3
        self.fused_min_width = fused_min_width
        self.fold_residual = fold_residual
        self.fold_fuse_up = fold_fuse_up
        self.merge_fuse = merge_fuse
        self.fold_normalize = fold_normalize

    @property
    def consumes_raw_pixels(self) -> bool:
        """True when apply() expects raw [0,255] crops (normalize folded
        into stem1); the pipeline skips normalize_crops accordingly."""
        return self.fold_normalize

    def apply(self, q, x, train: bool = False):
        del train  # inference-only
        return hrnet_int8_apply(
            self.config, q, x, fused_blocks=self.fused_blocks, s2d=self.s2d,
            layer1_strips=self.layer1_strips, fused_even3=self.fused_even3,
            fused_min_width=self.fused_min_width,
            fold_residual=self.fold_residual, fold_fuse_up=self.fold_fuse_up,
            merge_fuse=self.merge_fuse, fold_normalize=self.fold_normalize,
        )
