"""Stage-1 golden-parity debugger: same torch-born config_4 weights,
same 160^2 image, compare REFERENCE detectron2 (CPU, ref_shims) vs our
JAX RCNN at each stage: backbone/FPN feats -> RPN proposals -> final
detections.

Usage: python devbench/debug_golden_det.py <workdir>
(writes ref_det.pth + the image on first run, reuses after)
"""

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHIMS = os.path.join(REPO, "tests", "ref_shims")
REF_DET = "/root/reference/object_detection"
S = 160

work = sys.argv[1]
os.makedirs(work, exist_ok=True)
ckpt = os.path.join(work, "ref_det.pth")
img_npy = os.path.join(work, "img.npy")
ref_out = os.path.join(work, "ref_stages.npz")

if not os.path.exists(img_npy):
    rng = np.random.default_rng(7)
    img = rng.integers(0, 70, (S, S, 3)).astype(np.uint8)
    import cv2

    cv2.circle(img, (80, 90), 22, (210, 190, 230), -1)
    cv2.rectangle(img, (66, 82), (94, 98), (60, 230, 80), -1)
    np.save(img_npy, img)

env = dict(os.environ)
env["PYTHONPATH"] = os.pathsep.join(
    [SHIMS, os.path.join(REF_DET, "detectron2"), REF_DET]
)

if not os.path.exists(ckpt):
    subprocess.run(
        [sys.executable, os.path.join(SHIMS, "run_ref_cpu.py"),
         os.path.join(SHIMS, "make_ref_detector_ckpt.py"), str(S), ckpt],
        cwd=work, env=env, check=True,
    )

REF_SCRIPT = r"""
import sys, numpy as np, torch
import object_detection_utils as odu
from detectron2.modeling import build_model
from detectron2.checkpoint import DetectionCheckpointer

work = sys.argv[1]; S = int(sys.argv[2])
cfg = odu.config_4(S); cfg.MODEL.DEVICE = "cpu"
cfg.TEST.DETECTIONS_PER_IMAGE = 2
model = build_model(cfg); model.eval()
DetectionCheckpointer(model).load(work + "/ref_det.pth")
img = np.load(work + "/img.npy")  # BGR HWC uint8
t = torch.as_tensor(img.astype("float32").transpose(2, 0, 1))
inputs = [{"image": t, "height": S, "width": S}]
with torch.no_grad():
    images = model.preprocess_image(inputs)
    feats = model.backbone(images.tensor)
    proposals, _ = model.proposal_generator(images, feats, None)
    results, _ = model.roi_heads(images, feats, proposals, None)
out = {}
for k, v in feats.items():
    out["feat_" + k] = v.numpy()
out["prop_boxes"] = proposals[0].proposal_boxes.tensor.numpy()
out["prop_logits"] = proposals[0].objectness_logits.numpy()
out["det_boxes"] = results[0].pred_boxes.tensor.numpy()
out["det_scores"] = results[0].scores.numpy()
np.savez(work + "/ref_stages.npz", **out)
print("ref stages saved")
"""

with open(os.path.join(work, "_ref_stages.py"), "w") as f:
    f.write(REF_SCRIPT)
subprocess.run(
    [sys.executable, os.path.join(SHIMS, "run_ref_cpu.py"),
     os.path.join(work, "_ref_stages.py"), work, str(S)],
    cwd=work, env=env, check=True,
)

# ---- our side ----
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, REPO)

import torch  # noqa: E402

from spacecraft_pose_estimation_tpu.models.rcnn import (  # noqa: E402
    FASTER_RCNN_X101_SPACECRAFT,
    GeneralizedRCNN,
)
from spacecraft_pose_estimation_tpu.utils import torch_import as TI  # noqa: E402

sd = torch.load(ckpt, map_location="cpu", weights_only=False)
params = TI.detectron2_torch_to_flax(sd)

model = GeneralizedRCNN(config=FASTER_RCNN_X101_SPACECRAFT, dtype=jnp.float32)
template = model.init(
    {"params": jax.random.key(0)}, jnp.zeros((1, S, S, 3)), train=False
)
merged = TI.merge_pretrained(template, params, {})

# leaf-coverage report: how much of the template was actually replaced?
import jax.tree_util as jtu

t_leaves = {jtu.keystr(k): v for k, v in jtu.tree_leaves_with_path(template)}
m_leaves = {jtu.keystr(k): v for k, v in jtu.tree_leaves_with_path(merged)}
n_same = sum(
    1 for k in t_leaves
    if np.asarray(t_leaves[k]).shape == np.asarray(m_leaves[k]).shape
    and np.allclose(np.asarray(t_leaves[k]), np.asarray(m_leaves[k]))
)
print(f"leaves unchanged by import: {n_same}/{len(t_leaves)}")
unchanged = [
    k for k in t_leaves
    if np.allclose(np.asarray(t_leaves[k]), np.asarray(m_leaves[k]))
]
for k in unchanged[:20]:
    print("  unchanged:", k, np.asarray(t_leaves[k]).shape)

img = np.load(img_npy)
x = jnp.asarray(img.astype(np.float32))[None]  # NHWC BGR

ref = np.load(ref_out)

dets, inter = model.apply(
    merged, x, train=False, capture_intermediates=True, mutable=["intermediates"]
)
fpn_out = inter["intermediates"]["fpn"]["__call__"][0]
for lvl in sorted(fpn_out.keys()):
    if "feat_" + lvl not in ref.files:
        print(f"feat {lvl}: (not in ref dump)")
        continue
    r = ref["feat_" + lvl]  # (1,C,H,W)
    o = np.asarray(fpn_out[lvl]).transpose(0, 3, 1, 2)
    d = np.abs(r - o)
    print(f"feat {lvl}: ref|max|={np.abs(r).max():.4f} diff max={d.max():.6f} "
          f"mean={d.mean():.8f}")
ours_boxes = np.asarray(dets["boxes"][0])[np.asarray(dets["valid"][0])]
ours_scores = np.asarray(dets["scores"][0])[np.asarray(dets["valid"][0])]
print("ref det:", ref["det_boxes"], ref["det_scores"])
print("our det:", ours_boxes, ours_scores)
print("ref proposals top5:", ref["prop_boxes"][:5], ref["prop_logits"][:5])

# proposal-set agreement: fraction of ref proposals with an (almost)
# exact twin in ours, and logit agreement on the matched pairs
pb = inter["intermediates"].get("proposals")
our_pb, our_pl, our_pv = dets.get("_prop_boxes"), None, None
# find_top_proposals isn't a module; recompute via the public API if the
# model exposes proposals in its output dict, else match on det level.
for key in ("prop_boxes", "proposals"):
    if key in dets:
        our_pb = np.asarray(dets[key][0])
if our_pb is None:
    print("(model output has no proposal dump; skipping proposal compare)")
else:
    rpb = ref["prop_boxes"]
    d = np.abs(rpb[:, None, :] - our_pb[None, :, :]).max(-1)
    matched = (d.min(1) < 0.05).mean()
    print(f"proposal twin fraction (ref->ours, <0.05px): {matched:.3f} "
          f"(ref {len(rpb)}, ours {len(our_pb)})")
