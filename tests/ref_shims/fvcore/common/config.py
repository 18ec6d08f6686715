"""fvcore.common.config shim: yacs CfgNode + ``_BASE_`` yaml inheritance.

Surface per detectron2/config/config.py: class CfgNode with classmethods
``_open_cfg`` and ``load_yaml_with_base(filename, allow_unsafe=...)``
(resolving relative ``_BASE_`` includes, as the vendored zoo configs
like COCO-Detection/faster_rcnn_X_101_32x8d_FPN_3x.yaml use), plus the
instance merge/freeze API inherited from the yacs shim.
"""

import os

import yaml
from yacs.config import CfgNode as _YacsCfgNode

BASE_KEY = "_BASE_"


class CfgNode(_YacsCfgNode):
    @classmethod
    def _open_cfg(cls, filename):
        return open(filename, "r")

    @classmethod
    def load_yaml_with_base(cls, filename: str, allow_unsafe: bool = False):
        with cls._open_cfg(filename) as f:
            try:
                cfg = yaml.safe_load(f)
            except yaml.constructor.ConstructorError:
                if not allow_unsafe:
                    raise
                f.close()
                with cls._open_cfg(filename) as f2:
                    cfg = yaml.unsafe_load(f2)

        def merge_a_into_b(a, b):
            for k, v in a.items():
                if isinstance(v, dict) and k in b and isinstance(b[k], dict):
                    merge_a_into_b(v, b[k])
                else:
                    b[k] = v

        if cfg is not None and BASE_KEY in cfg:
            base_cfg_file = cfg[BASE_KEY]
            if base_cfg_file.startswith("~"):
                base_cfg_file = os.path.expanduser(base_cfg_file)
            if not base_cfg_file.startswith(("/", "http://", "https://")):
                base_cfg_file = os.path.join(
                    os.path.dirname(filename), base_cfg_file
                )
            base_cfg = cls.load_yaml_with_base(base_cfg_file, allow_unsafe=allow_unsafe)
            del cfg[BASE_KEY]
            merge_a_into_b(cfg, base_cfg)
            return base_cfg
        return cfg or {}

    def merge_from_file(self, cfg_filename: str, allow_unsafe: bool = False) -> None:
        loaded = self.load_yaml_with_base(cfg_filename, allow_unsafe=allow_unsafe)
        self.merge_from_other_cfg(type(self)(loaded))
