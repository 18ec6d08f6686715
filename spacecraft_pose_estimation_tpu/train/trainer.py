"""Hook-driven training loop (engine/train_loop.py:88-295 equivalents).

`Trainer` owns the storage + hook list and iterates a jitted step over a
data iterator. Hooks mirror detectron2 engine/hooks.py: IterationTimer,
PeriodicWriter, PeriodicCheckpointer, BestCheckpointer, EvalHook, and a
jax.profiler-backed TraceProfiler replacing TorchProfiler.
"""

from __future__ import annotations

import logging
import time
from typing import Any, Callable, Iterable, Sequence

from .metrics import MetricStorage

logger = logging.getLogger(__name__)


class Hook:
    def before_train(self, trainer: "Trainer") -> None: ...

    def after_train(self, trainer: "Trainer") -> None: ...

    def before_step(self, trainer: "Trainer") -> None: ...

    def after_step(self, trainer: "Trainer") -> None: ...


class Trainer:
    """Minimal TrainerBase/SimpleTrainer: state + hooks + jitted step."""

    def __init__(
        self,
        step_fn: Callable,  # (state, batch) -> (state, metrics)
        state: Any,
        data_iter: Iterable,
        hooks: Sequence[Hook] = (),
        storage: MetricStorage | None = None,
    ):
        self.step_fn = step_fn
        self.state = state
        self.data_iter = iter(data_iter)
        self.hooks = list(hooks)
        self.storage = storage or MetricStorage()
        self.iteration = 0
        self.max_iter = 0

    def train(self, start_iter: int, max_iter: int) -> None:
        self.iteration = start_iter
        self.max_iter = max_iter
        for h in self.hooks:
            h.before_train(self)
        try:
            while self.iteration < max_iter:
                self.storage.step = self.iteration
                for h in self.hooks:
                    h.before_step(self)
                self.run_step()
                for h in self.hooks:
                    h.after_step(self)
                self.iteration += 1
        finally:
            for h in self.hooks:
                h.after_train(self)

    def run_step(self) -> None:
        batch = next(self.data_iter)
        self.state, metrics = self.step_fn(self.state, batch)
        self.storage.put_scalars(**{k: float(v) for k, v in metrics.items()})


class IterationTimer(Hook):
    def before_step(self, trainer):
        self._t0 = time.perf_counter()

    def after_step(self, trainer):
        trainer.storage.put_scalar("time", time.perf_counter() - self._t0)


class PeriodicWriter(Hook):
    def __init__(self, writers, period: int = 20):
        self.writers = writers
        self.period = period

    def after_step(self, trainer):
        if (trainer.iteration + 1) % self.period == 0 or trainer.iteration == trainer.max_iter - 1:
            for w in self.writers:
                w.write(trainer.storage)

    def after_train(self, trainer):
        for w in self.writers:
            w.write(trainer.storage)
            w.close()


class PeriodicCheckpointer(Hook):
    def __init__(self, manager, period: int):
        self.manager = manager
        self.period = period

    def after_step(self, trainer):
        if (trainer.iteration + 1) % self.period == 0 or trainer.iteration == trainer.max_iter - 1:
            self.manager.save(trainer.iteration, trainer.state)


class BestCheckpointer(Hook):
    """Save when a watched metric improves (engine/hooks.py:209)."""

    def __init__(self, manager, metric: str, period: int = 1):
        self.manager = manager
        self.metric = metric
        self.period = period

    def after_step(self, trainer):
        if (trainer.iteration + 1) % self.period:
            return
        latest = trainer.storage.latest().get(self.metric)
        if latest is None:
            return
        # state=... persists the improved step under best/ (immune to the
        # main manager's max_to_keep garbage collection)
        if self.manager.save_best(trainer.iteration, latest[0], state=trainer.state):
            self.manager.save(trainer.iteration, trainer.state, {"best": latest[0]})


class EvalHook(Hook):
    def __init__(self, period: int, fn: Callable[["Trainer"], dict]):
        self.period = period
        self.fn = fn

    def _do_eval(self, trainer):
        results = self.fn(trainer)
        if results:
            trainer.storage.put_scalars(**results)

    def after_step(self, trainer):
        next_iter = trainer.iteration + 1
        if self.period > 0 and next_iter % self.period == 0:
            # d2 hooks.py:550-560: the final iteration's eval belongs to
            # after_train — do not run it twice
            if next_iter != trainer.max_iter:
                self._do_eval(trainer)

    def after_train(self, trainer):
        # d2 semantics: only eval when training actually completed (the
        # loop's finally also fires on exceptions — don't eval a
        # half-trained model)
        if trainer.iteration >= trainer.max_iter:
            self._do_eval(trainer)


class MemoryStats(Hook):
    """Log device memory usage (engine/hooks.py TorchMemoryStats analog)."""

    def __init__(self, period: int = 100):
        self.period = period

    def after_step(self, trainer):
        if (trainer.iteration + 1) % self.period:
            return
        import jax

        dev = jax.local_devices()[0]
        stats = getattr(dev, "memory_stats", lambda: None)()
        if stats:
            trainer.storage.put_scalar(
                "device_mem_gb", stats.get("bytes_in_use", 0) / 2**30
            )


def recompute_batch_stats(state, batches, momentum: float = 0.0):
    """PreciseBN (engine/hooks.py:566): re-estimate BN statistics by
    averaging batch moments over `batches` in train mode. Returns a state
    with updated batch_stats (momentum 0 = plain average)."""
    import jax
    import jax.numpy as jnp

    from ..models.layers import BN_MOMENTUM

    sums = None
    n = 0
    for batch in batches:
        _, mutated = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["image"],
            train=True,
            mutable=["batch_stats"],
        )
        # invert the EMA update to recover this batch's raw moments:
        # new = m*old + (1-m)*batch  =>  batch = (new - m*old) / (1-m)
        raw = jax.tree_util.tree_map(
            lambda new, old: (new - BN_MOMENTUM * old) / (1.0 - BN_MOMENTUM),
            mutated["batch_stats"],
            state.batch_stats,
        )
        sums = raw if sums is None else jax.tree_util.tree_map(jnp.add, sums, raw)
        n += 1
    if sums is None:
        return state
    avg = jax.tree_util.tree_map(lambda x: x / n, sums)
    return state.replace(batch_stats=avg)


class TraceProfiler(Hook):
    """Chrome-trace profiling via jax.profiler (TorchProfiler stand-in)."""

    def __init__(self, log_dir: str, start: int, stop: int):
        self.log_dir = log_dir
        self.start = start
        self.stop = stop

    def before_step(self, trainer):
        if trainer.iteration == self.start:
            import jax

            jax.profiler.start_trace(self.log_dir)

    def after_step(self, trainer):
        if trainer.iteration == self.stop:
            import jax

            jax.profiler.stop_trace()
