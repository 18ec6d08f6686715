"""fvcore.nn.distributed shim: the oracle runs are single-process, so
the differentiable all-reduce (used by NaiveSyncBatchNorm,
layers/batch_norm.py:201-212) is the identity — exactly fvcore's own
world_size==1 fast path."""

import torch


def differentiable_all_reduce(input: torch.Tensor) -> torch.Tensor:
    if (
        not torch.distributed.is_available()
        or not torch.distributed.is_initialized()
        or torch.distributed.get_world_size() == 1
    ):
        return input
    raise NotImplementedError(
        "multi-process all-reduce is out of the oracle shim's scope"
    )
