"""Environment helpers: seeding + environment report (detectron2
utils/env.py seed_all_rng + collect_env.py equivalents)."""

from __future__ import annotations

import datetime
import os
import random
import sys


def seed_all_rng(seed: int | None = None) -> int:
    """Seed python/numpy (and return the seed). JAX PRNG keys are
    explicit, so jax code derives keys from the returned seed."""
    if seed is None:
        seed = (
            os.getpid()
            + int(datetime.datetime.now().strftime("%S%f"))
            + int.from_bytes(os.urandom(2), "big")
        ) % (2**31)
    import numpy as np

    np.random.seed(seed)
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    return seed


def collect_env_info() -> str:
    import jax
    import numpy as np

    lines = [
        f"python: {sys.version.split()[0]}",
        f"jax: {jax.__version__}",
        f"numpy: {np.__version__}",
        f"backend: {jax.default_backend()}",
        f"devices: {[str(d) for d in jax.devices()]}",
        f"process: {jax.process_index()}/{jax.process_count()}",
    ]
    try:
        import flax
        import optax

        lines += [f"flax: {flax.__version__}", f"optax: {optax.__version__}"]
    except Exception:
        pass
    return "\n".join(lines)
