"""Backend/platform control.

This image's JAX install force-registers the `axon` TPU plugin and
overrides the JAX_PLATFORMS env var, so honoring a CPU request requires
updating the config after import. Tools call `maybe_force_platform()`
first thing; set ``SPE_PLATFORM=cpu`` (e.g. in CI) to run host-only.
"""

from __future__ import annotations

import os


def maybe_force_platform() -> None:
    plat = os.environ.get("SPE_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
