"""Rethinking-BatchNorm project (TPU-native).

Semantic contract from the reference
``projects/Rethinking-BatchNorm/`` (+ the ``CycleBatchNormList`` layer
it adds to detectron2, layers/batch_norm.py:233-278):

* shared-head dense detectors (RetinaNet) with BN in the head see a
  DIFFERENT input distribution per FPN level; Sec 5.2 of the paper
  keeps domain-specific (per-level) test statistics with a SHARED
  affine — implemented by cycling through N BN states, one per call.
* the project's configs are experiment variants: SyncBN head (shared
  training stats), BN head, batch-stats-at-test, and shuffled-domain
  training; the eval script re-estimates per-level stats with
  PreciseBN then evaluates (retinanet-eval-domain-specific.py).

TPU-first design: instead of a stateful cycling module (a python
side-effect XLA cannot trace), ``CycleBatchNorm`` takes the domain
index EXPLICITLY — the RetinaNet head's level loop passes its level id.
This is semantically identical (the reference cycles exactly once per
level, in level order) and jit-safe. The repo's global-batch BN equals
SyncBN exactly (test_scaling.py), covering the SyncBNhead config; the
PreciseBN re-estimation step exists as
``train/trainer.recompute_batch_stats``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


class CycleBatchNorm(nn.Module):
    """Domain-specific BN statistics with shared affine
    (batch_norm.py:233-278). ``domain`` selects the statistics set; the
    affine (scale/bias) is shared across domains.

    Train mode: normalizes with the CURRENT batch's per-domain stats
    and updates that domain's running stats. Eval: uses the stored
    per-domain running stats.
    """

    num_domains: int
    features: int
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, domain: int, train: bool = False) -> Array:
        assert 0 <= domain < self.num_domains
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean_all = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.num_domains, self.features)),
        )
        var_all = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((self.num_domains, self.features)),
        )
        if train:
            axes = tuple(range(x.ndim - 1))
            m = jnp.mean(x.astype(jnp.float32), axis=axes)
            v = jnp.var(x.astype(jnp.float32), axis=axes)
            if not self.is_initializing():
                # torch BatchNorm2d tracks the UNBIASED variance in
                # running_var (normalizes the batch with the biased one)
                n = 1
                for a in axes:
                    n *= x.shape[a]
                v_unb = v * (n / max(n - 1, 1))
                mean_all.value = mean_all.value.at[domain].set(
                    self.momentum * mean_all.value[domain] + (1 - self.momentum) * m
                )
                var_all.value = var_all.value.at[domain].set(
                    self.momentum * var_all.value[domain]
                    + (1 - self.momentum) * v_unb
                )
        else:
            m, v = mean_all.value[domain], var_all.value[domain]
        y = (x.astype(jnp.float32) - m) * jax.lax.rsqrt(v + self.epsilon)
        return (y * scale + bias).astype(self.dtype)


class BNConvTower(nn.Module):
    """A shared conv tower whose BN keeps per-level statistics — the
    RetinaNet-head norm variants of the project's configs. ``variant``:

    * "cycle"  — domain-specific stats, shared affine (the paper's
      Sec 5.2 recommendation; retinanet_SyncBNhead.py + eval script)
    * "shared" — one stats set for every level (SyncBN-head training
      behavior: the repo's global-batch BN == SyncBN exactly)
    """

    num_levels: int
    features: int
    num_convs: int = 4
    variant: str = "cycle"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: list, train: bool = False) -> list:
        assert len(feats) == self.num_levels
        convs = [
            nn.Conv(self.features, (3, 3), dtype=self.dtype, name=f"conv{i}")
            for i in range(self.num_convs)
        ]
        norms = [
            CycleBatchNorm(
                num_domains=self.num_levels if self.variant == "cycle" else 1,
                features=self.features,
                dtype=self.dtype,
                name=f"norm{i}",
            )
            for i in range(self.num_convs)
        ]
        outs = []
        for lvl, x in enumerate(feats):
            dom = lvl if self.variant == "cycle" else 0
            for conv, norm in zip(convs, norms):
                x = nn.relu(norm(conv(x), dom, train=train))
            outs.append(x)
        return outs
