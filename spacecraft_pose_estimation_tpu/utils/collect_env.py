"""Environment report for bug reports and run provenance — the
detectron2 utils/collect_env.py equivalent, TPU-flavored: JAX/flax
versions, devices, platform, XLA flags, key library versions.
"""

from __future__ import annotations

import importlib
import os
import sys


def collect_env_info() -> str:
    rows: list[tuple[str, str]] = []
    rows.append(("sys.platform", sys.platform))
    rows.append(("Python", sys.version.replace("\n", "")))

    for mod in ("jax", "jaxlib", "flax", "optax", "orbax.checkpoint",
                "numpy", "cv2", "scipy", "pandas"):
        try:
            m = importlib.import_module(mod)
            rows.append((mod, getattr(m, "__version__", "unknown")))
        except Exception as e:  # pragma: no cover - environment dependent
            rows.append((mod, f"unavailable ({type(e).__name__})"))

    try:
        import jax

        rows.append(("jax.default_backend", jax.default_backend()))
        devs = jax.devices()
        rows.append(("devices", f"{len(devs)} x {devs[0].device_kind}" if devs else "none"))
        rows.append(("process_index", str(jax.process_index())))
        rows.append(("process_count", str(jax.process_count())))
    except Exception as e:  # pragma: no cover
        rows.append(("jax runtime", f"unavailable ({type(e).__name__}: {e})"))

    for var in ("JAX_PLATFORMS", "XLA_FLAGS", "SPE_PLATFORM",
                "JAX_COMPILATION_CACHE_DIR", "LIBTPU_INIT_ARGS"):
        if os.environ.get(var):
            rows.append((f"env:{var}", os.environ[var]))

    width = max(len(k) for k, _ in rows)
    return "\n".join(f"{k.ljust(width)}  {v}" for k, v in rows)


if __name__ == "__main__":
    print(collect_env_info())
