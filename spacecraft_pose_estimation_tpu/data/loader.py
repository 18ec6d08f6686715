"""Parallel host input pipeline: thread-pool decode + batch pipelining.

The reference hides cv2 decode/warp latency in 4 torch DataLoader worker
PROCESSES (detectron2/data/build.py:282,483). cv2 releases the GIL for
imread/warpAffine/remap, so a thread pool reaches the same parallelism
here without pickling/IPC copies — and the decoded batch lands directly
in the numpy buffer the device transfer reads from.

`parallel_batches` keeps `prefetch_batches` whole batches in flight: all
examples of the next batches are decoding on the pool while the
current batch is being consumed (the device-side transform runs inside
the jitted step, so host work is pure decode + stacking).

Throughput is benchmarked by bench_stages.py ("loader" stage); the
determinism contract (parallel == serial, same seed) is tested in
tests/test_loader.py.
"""

from __future__ import annotations

import os
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Iterable, Iterator


def default_num_workers() -> int:
    n = os.cpu_count() or 4
    return max(2, min(8, n - 2))


def parallel_batches(
    batch_indices: Iterable[Any],
    make_example: Callable[[Any], dict],
    collate: Callable[[Any, list], dict],
    num_workers: int | None = None,
    prefetch_batches: int = 4,
) -> Iterator[dict]:
    """`batch_indices` yields one work-descriptor per batch — a
    (meta, [example_key, ...]) pair. Each example_key is decoded by
    `make_example` on the pool; `collate(meta, examples)` assembles the
    batch. Batches are yielded strictly in order; up to
    `prefetch_batches` batches are decoding ahead of the consumer."""
    workers = num_workers if num_workers is not None else default_num_workers()
    if workers <= 0:
        for meta, keys in batch_indices:
            yield collate(meta, [make_example(k) for k in keys])
        return

    pool = ThreadPoolExecutor(max_workers=workers)
    it = iter(batch_indices)
    pending: deque = deque()

    def submit_next() -> bool:
        try:
            meta, keys = next(it)
        except StopIteration:
            return False
        pending.append((meta, [pool.submit(make_example, k) for k in keys]))
        return True

    try:
        for _ in range(max(prefetch_batches, 1)):
            if not submit_next():
                break
        while pending:
            meta, futs = pending.popleft()
            examples = [f.result() for f in futs]
            submit_next()
            yield collate(meta, examples)
    finally:
        pool.shutdown(wait=False, cancel_futures=True)
