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

import torch

torch.Tensor.cuda = lambda self, *a, **k: self
torch.nn.Module.cuda = lambda self, *a, **k: self


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
