"""Threshold estimation: binary-search pos/neg thresholds so simulated
event counts match a real recording (v2e/v2ecore/thres_estimator.py:18-149).

Functional version: given a frame sequence and a target ON/OFF event
count, bisect the nominal threshold over a fixed number of steps (the
emulator scan re-runs per probe — all compiled)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .emulator import EmulatorConfig, emulate_sequence, init_state


def count_events(frames, timestamps, threshold: float, key, base_cfg: EmulatorConfig):
    cfg = dataclasses.replace(base_cfg, pos_thres=float(threshold), neg_thres=float(threshold))
    state = init_state(frames[0], key, cfg)
    _, out = emulate_sequence(state, frames[1:], timestamps[1:], cfg)
    return int(jnp.sum(out["num_events"]))


def estimate_threshold(
    frames,
    timestamps,
    target_count: int,
    key,
    base_cfg: EmulatorConfig = EmulatorConfig(),
    lo: float = 0.02,
    hi: float = 1.0,
    steps: int = 12,
) -> float:
    """Bisect nominal threshold so the event count matches target
    (monotone decreasing in threshold)."""
    for _ in range(steps):
        mid = 0.5 * (lo + hi)
        c = count_events(frames, timestamps, mid, key, base_cfg)
        if c > target_count:
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi)
