"""Random balanced sampling of anchors/proposals as fixed-shape masks.

Equivalent of detectron2 subsample_labels (modeling/sampling.py) +
label_and_sample_anchors/proposals: choose up to num*pos_fraction random
positives, fill the remainder with random negatives. Formulated with
random-priority ranking so everything stays (N,)-masked — no ragged
gathers inside the step function.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _rank_within(mask: Array, key) -> Array:
    """0-based random rank among mask==True entries (invalid get large)."""
    n = mask.shape[0]
    pri = jax.random.uniform(key, (n,))
    pri = jnp.where(mask, pri, jnp.inf)
    order = jnp.argsort(pri)  # valid entries first in random order
    rank = jnp.zeros(n, jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    return jnp.where(mask, rank, n)


def subsample_labels(
    labels: Array, num_samples: int, positive_fraction: float, key
) -> tuple[Array, Array]:
    """labels in {-1 ignore, 0 neg, 1 pos} -> (pos_mask, neg_mask).

    Exactly detectron2's budget: pos quota = num*frac capped by available
    positives; negatives fill the remainder.
    """
    kp, kn = jax.random.split(key)
    pos = labels == 1
    neg = labels == 0
    max_pos = int(num_samples * positive_fraction)
    pos_rank = _rank_within(pos, kp)
    pos_sel = pos & (pos_rank < max_pos)
    num_pos = jnp.sum(pos_sel)
    neg_quota = num_samples - num_pos
    neg_rank = _rank_within(neg, kn)
    neg_sel = neg & (neg_rank < neg_quota)
    return pos_sel, neg_sel


def gather_topk_mask(mask: Array, k: int, key, scores: Array | None = None):
    """Gather up to k indices where mask is True (random or score order).

    Returns (indices (k,), valid (k,)) — the fixed-shape bridge from a
    selection mask to a gathered subset (e.g. 512 pooled proposals).
    """
    n = mask.shape[0]
    if scores is None:
        pri = jax.random.uniform(key, (n,))
    else:
        pri = scores
    pri = jnp.where(mask, pri, -jnp.inf)
    vals, idx = jax.lax.top_k(pri, k)
    return idx, jnp.isfinite(vals)
