"""Metric storage + writers (the EventStorage stack, utils/events.py:26-377).

`MetricStorage.put_scalars` accumulates step-indexed scalar histories;
writers flush them periodically: JSON lines (JSONWriter), TensorBoard via
tensorboardX (TensorboardXWriter) and a terminal printer with smoothed
values + ETA (CommonMetricPrinter).
"""

from __future__ import annotations

import datetime
import json
import logging
import os
import time
from collections import defaultdict, deque
from typing import Any

logger = logging.getLogger(__name__)


class MetricStorage:
    def __init__(self, window_size: int = 20):
        self._history: dict[str, deque] = defaultdict(lambda: deque(maxlen=window_size))
        self._latest: dict[str, tuple[float, int]] = {}
        self.step = 0

    def put_scalar(self, name: str, value: float) -> None:
        value = float(value)
        self._history[name].append(value)
        self._latest[name] = (value, self.step)

    def put_scalars(self, **kwargs) -> None:
        for k, v in kwargs.items():
            self.put_scalar(k, v)

    def latest(self) -> dict[str, tuple[float, int]]:
        return dict(self._latest)

    def median(self, name: str) -> float:
        h = sorted(self._history[name])
        return h[len(h) // 2] if h else float("nan")

    def avg(self, name: str) -> float:
        h = self._history[name]
        return sum(h) / len(h) if h else float("nan")


class JSONWriter:
    """Append one JSON line of latest metrics per flush (metrics.json)."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._f = open(path, "a")

    def write(self, storage: MetricStorage) -> None:
        row = {"iteration": storage.step}
        row.update({k: v for k, (v, _) in storage.latest().items()})
        self._f.write(json.dumps(row) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()


class TensorboardWriter:
    """tensorboardX scalar writer (degrades to no-op if unavailable)."""

    def __init__(self, log_dir: str):
        try:
            from tensorboardX import SummaryWriter

            self._w = SummaryWriter(log_dir)
        except Exception:  # pragma: no cover - optional dep
            self._w = None

    def write(self, storage: MetricStorage) -> None:
        if self._w is None:
            return
        for k, (v, step) in storage.latest().items():
            self._w.add_scalar(k, v, step)

    def close(self):
        if self._w is not None:
            self._w.close()


class TerminalPrinter:
    """Smoothed metrics + ETA (CommonMetricPrinter, events.py:181-223)."""

    def __init__(self, max_iter: int | None = None):
        self.max_iter = max_iter
        self._last: tuple[int, float] | None = None

    def write(self, storage: MetricStorage) -> None:
        eta = ""
        now = time.perf_counter()
        if self.max_iter and self._last is not None:
            it0, t0 = self._last
            if storage.step > it0:
                per_iter = (now - t0) / (storage.step - it0)
                remaining = per_iter * (self.max_iter - storage.step)
                eta = f" eta: {datetime.timedelta(seconds=int(remaining))}"
        self._last = (storage.step, now)
        parts = [f"iter: {storage.step}{eta}"]
        for k in sorted(storage.latest()):
            parts.append(f"{k}: {storage.median(k):.4g}")
        logger.info("  ".join(parts))

    def close(self):
        pass
