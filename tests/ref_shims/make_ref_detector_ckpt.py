"""Random-init the REFERENCE config_N detector (vendored detectron2,
CPU) and save its torch state_dict — the torch-born weights for the
stage-1 golden-parity test. Run via run_ref_cpu.py so the numpy/PIL/
cuda compat patches apply.

Usage: run_ref_cpu.py make_ref_detector_ckpt.py <image_size> <out.pth> [config_name] [seed]
"""

import sys

import torch

import object_detection_utils as odu
from detectron2.modeling import build_model

size = int(sys.argv[1])
out = sys.argv[2]
config_name = sys.argv[3] if len(sys.argv) > 3 else "config_4"
seed = int(sys.argv[4]) if len(sys.argv) > 4 else 3

cfg = getattr(odu, config_name)(size)
cfg.MODEL.DEVICE = "cpu"
torch.manual_seed(seed)
model = build_model(cfg)
sd = model.state_dict()

# Make the scoring heads DECISIVE: random-init heads give near-uniform
# scores (all ~0.495), so NMS/topk rankings are fp-noise ties and the
# argmax box is not reproducible across frameworks. Content-driven
# constant rows make rankings follow image content with gaps >> fp
# noise while the full inference path (anchors, delta decode, NMS,
# topk, score filter) still runs for real.
with torch.no_grad():
    w = sd["proposal_generator.rpn_head.objectness_logits.weight"]  # (A,C,1,1)
    for a in range(w.shape[0]):
        w[a] = 1e-3 * (1.0 + 0.2 * a)
    sd["proposal_generator.rpn_head.objectness_logits.bias"].zero_()
    cls_w = sd["roi_heads.box_predictor.cls_score.weight"]  # (K+1, D)
    g = torch.randn(cls_w.shape[1], generator=torch.Generator().manual_seed(11))
    cls_w[0] = 0.05 * g  # fg logit = 0.05 * g.h: wide content-driven spread
    cls_w[1:] = -0.05 * g
    sd["roi_heads.box_predictor.cls_score.bias"].zero_()

torch.save(sd, out)
print(f"saved {out}")
