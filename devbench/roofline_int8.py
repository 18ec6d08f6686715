"""Static roofline for the int8 HRNet walk: per-site ops/bytes and the
binding ceiling (N-lane compute vs HBM), summed per segment.

v5e: int8 peak ~788 TOP/s prorated by min(Cout,128)/128; HBM ~819 GB/s.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from spacecraft_pose_estimation_tpu.models.hrnet import HRNet, POSE_HRNET_W32
from spacecraft_pose_estimation_tpu.models import hrnet_int8 as hi
from spacecraft_pose_estimation_tpu.pipeline import normalize_crops

B = 128
PEAK = 788e12
BW = 819e9

model = HRNet(config=POSE_HRNET_W32.with_joints(11))
variables = jax.eval_shape(lambda k: model.init(k, jnp.zeros((1, 512, 512, 3)), train=False), jax.random.key(0))

class RooflineOps:
    """Duck-types _QuantizeOps' walk interface but only tracks shapes."""
    def __init__(self, params, stats):
        self.params = params
        self.segments = {}
        self.seg = "stem+layer1"

    def _track(self, name):
        if name.startswith("stage2") or name.startswith("transition1"):
            self.seg = "stage2"
        if name.startswith("stage3") or name.startswith("transition2"):
            self.seg = "stage3"
        if name.startswith("stage4") or name.startswith("transition3"):
            self.seg = "stage4"

    def add_cost(self, ops, bytes_):
        t = max(ops and ops or 0, 0)
        d = self.segments.setdefault(self.seg, [0.0, 0.0, 0.0])
        d[0] += ops
        d[1] += bytes_

import dataclasses
from spacecraft_pose_estimation_tpu.models.layers import block_expansion

cfg = model.config

# walk shapes manually (mirror of _forward, shape-only)
segments = {}
def cost(seg, cin, cout, hw_out, k, in_hw=None, extra_read=0):
    in_hw = in_hw or hw_out
    ops = 2 * B * hw_out * hw_out * k * k * cin * cout
    bytes_ = B * (in_hw * in_hw * cin + hw_out * hw_out * cout) + extra_read
    n_factor = min(cout, 128) / 128
    t_compute = ops / (PEAK * n_factor)
    t_io = bytes_ / BW
    d = segments.setdefault(seg, [0.0, 0.0])
    d[0] += max(t_compute, t_io)
    d[1] += 1

def add_cost(seg, c, hw, n_in):
    bytes_ = B * hw * hw * c * (n_in + 1)
    d = segments.setdefault(seg, [0.0, 0.0])
    d[0] += bytes_ / BW
    d[1] += 1

# stem (bf16 first conv) + stem2
cost("stem", 3, 64, 256, 3, in_hw=512)
cost("stem", 64, 64, 128, 3, in_hw=256)
# layer1: 4 bottlenecks at 128^2
for i in range(4):
    cin = 64 if i == 0 else 256
    cost("layer1", cin, 64, 128, 1)
    cost("layer1", 64, 64, 128, 3)
    cost("layer1", 64, 256, 128, 1)
    if i == 0:
        cost("layer1", 64, 256, 128, 1)  # shortcut
    add_cost("layer1", 256, 128, 2)

widths_per_stage = [(32, 64), (32, 64, 128), (32, 64, 128, 256)]
mods = [1, 4, 3]
res = [128, 64, 32, 16]
prev_w = (256,)
for si in range(3):
    seg = f"stage{si+2}"
    widths = widths_per_stage[si]
    # transition
    for i, w in enumerate(widths):
        if i < len(prev_w):
            if prev_w[i] != w:
                cost(seg, prev_w[i], w, res[i], 3)
        else:
            cost(seg, prev_w[-1] if i == len(prev_w) else widths[i-1], w, res[i], 3, in_hw=res[i-1])
    for m in range(mods[si]):
        nb = len(widths)
        for bi in range(nb):
            for k in range(4):  # 4 BasicBlocks
                cost(seg, widths[bi], widths[bi], res[bi], 3)
                cost(seg, widths[bi], widths[bi], res[bi], 3)
                add_cost(seg, widths[bi], res[bi], 2)
        # fuse
        last = si == 2 and m == mods[si] - 1
        out_n = 1 if last else nb
        for i in range(out_n):
            n_sum = 1
            for j in range(nb):
                if j == i: continue
                if j > i:
                    cost(seg, widths[j], widths[i], res[j], 1)
                    add_cost(seg, widths[i], res[i], 0)  # upsample write
                else:
                    for k2 in range(i - j):
                        cost(seg, widths[j + k2] if k2 == 0 else widths[i],
                             widths[i] if k2 == i - j - 1 else widths[j],
                             res[j + k2 + 1], 3, in_hw=res[j + k2])
                n_sum += 1
            add_cost(seg, widths[i], res[i], n_sum)
# head
cost("head", 32, 11, 128, 1)

total = 0
for seg, (t, n) in segments.items():
    print(f"{seg:12s}: {t*1e3:7.2f} ms roofline  ({int(n)} sites)")
    total += t
print(f"{'TOTAL':12s}: {total*1e3:7.2f} ms  ({B/total:7.1f} fps ceiling)")
