"""pkg_resources shim (setuptools' pkg_resources is absent from this
image). Only resource_filename is used — by the vendored detectron2's
model_zoo.py:139 to resolve zoo config paths. The vendored tree ships
its configs at <repo>/configs rather than inside the package, so
"detectron2.model_zoo/configs/X" resolves there."""

import importlib
import os


def resource_filename(package: str, resource: str) -> str:
    mod = importlib.import_module(package)
    pkg_dir = os.path.dirname(os.path.abspath(mod.__file__))
    candidate = os.path.join(pkg_dir, resource)
    if os.path.exists(candidate):
        return candidate
    if package == "detectron2.model_zoo" and resource.startswith("configs"):
        # vendored layout: detectron2/<pkg>/model_zoo -> ../../configs
        alt = os.path.join(pkg_dir, "..", "..", resource)
        if os.path.exists(alt):
            return os.path.normpath(alt)
    return candidate
