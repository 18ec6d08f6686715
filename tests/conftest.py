"""Test env: force JAX onto a virtual 8-device CPU mesh.

Mirrors (and strengthens) the reference's single-rank degradation trick
(detectron2 utils/comm.py:19-33): all sharding/collective code paths run in
CI on host CPU devices, no TPUs required.

Note: this image's JAX install force-registers the `axon` TPU plugin and
overrides the JAX_PLATFORMS env var, so we must also update the config
programmatically after import — before any backend is initialised.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
