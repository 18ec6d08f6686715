"""Launcher: run a reference stage script unmodified on this CPU-only box.

Usage: python run_ref_cpu.py <script.py> [script args...]

Patches applied BEFORE the script runs (no reference code is edited):
* numpy 2.x compat: restore the removed np.float/np.int/np.bool aliases
  the 2021-era reference uses (pure aliases — identical semantics).
* CPU-only torch: .cuda() becomes identity on Tensor/Module, and
  torch.nn.DataParallel becomes a passthrough wrapper (same .module
  attribute, same forward) — the reference hardcodes CUDA placement
  (tools/test.py:98, core/function.py:368) but its math is device-
  agnostic.
"""

import sys
import runpy

import numpy as np

for _name, _alias in (("float", float), ("int", int), ("bool", bool), ("object", object)):
    if not hasattr(np, _name):
        setattr(np, _name, _alias)

try:  # Pillow 10 removed the pre-9 resample aliases the 2021-era code uses
    from PIL import Image

    for _name, _modern in (("LINEAR", "BILINEAR"), ("CUBIC", "BICUBIC"),
                           ("ANTIALIAS", "LANCZOS")):
        if not hasattr(Image, _name):
            setattr(Image, _name, getattr(Image, _modern))
except ImportError:
    pass

import torch

torch.Tensor.cuda = lambda self, *a, **k: self
torch.nn.Module.cuda = lambda self, *a, **k: self


def _cpu_args(args, kwargs):
    args = tuple(
        "cpu" if isinstance(a, (str, torch.device)) and "cuda" in str(a) else a
        for a in args
    )
    dev = kwargs.get("device")
    if dev is not None and "cuda" in str(dev):
        kwargs["device"] = "cpu"
    return args, kwargs


# the detectron2 stage scripts place the model with .to(cfg.MODEL.DEVICE)
# (engine/defaults.py DefaultPredictor; MODEL.DEVICE defaults to "cuda")
_module_to = torch.nn.Module.to
_tensor_to = torch.Tensor.to


def _module_to_cpu(self, *a, **k):
    a, k = _cpu_args(a, k)
    return _module_to(self, *a, **k)


def _tensor_to_cpu(self, *a, **k):
    a, k = _cpu_args(a, k)
    return _tensor_to(self, *a, **k)


torch.nn.Module.to = _module_to_cpu
torch.Tensor.to = _tensor_to_cpu


class _DataParallel(torch.nn.Module):
    def __init__(self, module, device_ids=None, **kwargs):
        super().__init__()
        self.module = module

    def forward(self, *args, **kwargs):
        return self.module(*args, **kwargs)


torch.nn.DataParallel = _DataParallel
torch.nn.parallel.DataParallel = _DataParallel

script = sys.argv[1]
sys.argv = sys.argv[1:]
sys.path.insert(0, __import__("os").path.dirname(script))
runpy.run_path(script, run_name="__main__")
