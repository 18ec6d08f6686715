"""Orbax-backed checkpointing with the reference's resume semantics.

Covers both reference flavours:
* detectron2 DetectionCheckpointer: periodic saves + `last_checkpoint`
  resume (checkpoint/detection_checkpoint.py:15, engine/defaults.py:398).
* HRNet save_checkpoint dict {epoch/state/perf/optimizer} + model_best +
  AUTO_RESUME (lib/utils/utils.py:79-84, tools/train.py:166-176).

Stores the flax TrainState pytree (params, batch_stats, opt_state, step)
plus a small metadata dict (epoch, best_perf).
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )
        self._best_path = os.path.join(self.directory, "best.json")

    def save(self, step: int, state: Any, metadata: dict | None = None) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave({"state": to_saveable(state)}))
        self._mgr.wait_until_finished()
        # Metadata (epoch, best perf, ...) rides in a sidecar json — keeps
        # the orbax tree structure independent of what callers attach.
        with open(os.path.join(self.directory, f"meta_{step}.json"), "w") as f:
            json.dump(metadata or {}, f)

    def save_best(self, step: int, perf: float, state: Any = None) -> bool:
        """Track best perf (higher is better); returns True if improved.

        ``state``: when given, the improved state is ALSO persisted to a
        dedicated ``best/`` manager (max_to_keep=1) — the rolling
        max_to_keep window on the main manager would otherwise
        garbage-collect a best step more than max_to_keep saves old
        (the reference copies model_best.pth permanently,
        lib/utils/utils.py save_checkpoint)."""
        best = self.best_perf()
        if best is None or perf > best:
            with open(self._best_path, "w") as f:
                json.dump({"step": step, "perf": perf}, f)
            if state is not None:
                if not hasattr(self, "_best_mgr"):
                    self._best_mgr = CheckpointManager(
                        os.path.join(self.directory, "best"), max_to_keep=1
                    )
                self._best_mgr.save(step, state, {"perf": perf})
            return True
        return False

    def restore_best(self, state_template: Any):
        """Restore the permanently-kept best state (None if absent)."""
        best_dir = os.path.join(self.directory, "best")
        if not os.path.isdir(best_dir):
            return None
        return CheckpointManager(best_dir, max_to_keep=1).restore(state_template)

    def best_perf(self) -> float | None:
        if os.path.exists(self._best_path):
            with open(self._best_path) as f:
                return json.load(f)["perf"]
        return None

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, state_template: Any, step: int | None = None):
        """Restore into the template's structure (resume_or_load)."""
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        try:
            payload = self._mgr.restore(
                step, args=ocp.args.StandardRestore({"state": to_saveable(state_template)})
            )
            restored = from_saveable(state_template, payload["state"])
        except ValueError:
            # Optimizer structure differs from the saved one (e.g. eval
            # tools restore with a placeholder optimizer): restore raw and
            # take params/batch_stats/step, keep the template's opt_state.
            payload = self._mgr.restore(step)
            raw = payload["state"]
            kwargs = {"step": jax.numpy.asarray(raw["step"]), "params": raw["params"]}
            if hasattr(state_template, "batch_stats") and "batch_stats" in raw:
                kwargs["batch_stats"] = raw["batch_stats"]
            restored = state_template.replace(**kwargs)
        meta_path = os.path.join(self.directory, f"meta_{step}.json")
        metadata = {}
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                metadata = json.load(f)
        return restored, metadata, step

    def close(self):
        self._mgr.close()


def to_saveable(state: Any):
    """TrainState (or pytree) -> plain dict of arrays orbax can store."""
    if hasattr(state, "params"):
        out = {"step": state.step, "params": state.params, "opt_state": state.opt_state}
        if hasattr(state, "batch_stats"):
            out["batch_stats"] = state.batch_stats
        return out
    return state


def from_saveable(template: Any, payload):
    if hasattr(template, "params"):
        kwargs = {
            "step": payload["step"],
            "params": payload["params"],
            "opt_state": payload["opt_state"],
        }
        if hasattr(template, "batch_stats") and "batch_stats" in payload:
            kwargs["batch_stats"] = payload["batch_stats"]
        return template.replace(**kwargs)
    return payload
