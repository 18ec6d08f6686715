"""Model analysis: parameter counts and compiled-graph FLOP estimates.

Replaces detectron2 utils/analysis.py (fvcore FlopCountAnalysis) and
HRNet's get_model_summary (lib/utils/utils.py:87-203) with XLA's own
cost model: `flops_of` lowers + compiles the jitted forward and reads
cost_analysis() — the number the hardware will actually run.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import numpy as np


def parameter_count(params: Any) -> int:
    return int(sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params)))


def parameter_count_table(params: Any, depth: int = 1) -> str:
    """Grouped parameter counts, detectron2-style table."""
    groups: dict[str, int] = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        key = "/".join(str(p.key) for p in path[:depth])
        groups[key] = groups.get(key, 0) + int(np.prod(leaf.shape))
    total = sum(groups.values())
    lines = [f"{'module':40s} {'#params':>12s}"]
    for k in sorted(groups, key=groups.get, reverse=True):
        lines.append(f"{k:40s} {groups[k]:12,d}")
    lines.append(f"{'TOTAL':40s} {total:12,d}")
    return "\n".join(lines)


def flops_of(fn: Callable, *example_args) -> dict[str, float]:
    """Compile fn on the example args and return XLA's cost analysis
    (flops, bytes accessed, ...)."""
    compiled = jax.jit(fn).lower(*example_args).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0] if cost else {}
    return dict(cost or {})


def model_summary(model, variables, example_input, train: bool = False) -> str:
    """Param count + compiled FLOPs one-liner (get_model_summary)."""
    n = parameter_count(variables["params"])
    try:
        cost = flops_of(lambda v, x: model.apply(v, x, train=train), variables, example_input)
        flops = cost.get("flops", float("nan"))
    except Exception:
        flops = float("nan")
    return (
        f"params: {n / 1e6:.2f}M  "
        f"forward flops: {flops / 1e9:.2f} GFLOP  "
        f"input: {tuple(example_input.shape)}"
    )
