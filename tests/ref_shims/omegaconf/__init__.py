"""Minimal omegaconf shim (omegaconf is not installed in this image).

The vendored detectron2 imports DictConfig/ListConfig/OmegaConf at
module level in config/lazy.py and engine/defaults.py, but the yacs
config path the stage-script oracles use never constructs them. The
classes here are real enough for isinstance checks and basic
attr/item access; anything deeper raises rather than silently
diverging.
"""

import copy
from typing import Any


class ListConfig(list):
    def __init__(self, content=None, **kwargs):
        super().__init__(content or [])


class DictConfig(dict):
    def __init__(self, content=None, flags=None, **kwargs):
        super().__init__()
        for k, v in (content or {}).items():
            self[k] = _wrap(v)

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = _wrap(value)

    def __deepcopy__(self, memo):
        out = DictConfig({})
        for k, v in self.items():
            out[k] = copy.deepcopy(v, memo)
        return out


def _wrap(v):
    if isinstance(v, dict) and not isinstance(v, DictConfig):
        return DictConfig(v)
    if isinstance(v, list) and not isinstance(v, ListConfig):
        return ListConfig(v)
    return v


class _MissingType:
    def __repr__(self):
        return "???"


MISSING = _MissingType()


class OmegaConf:
    @staticmethod
    def create(content=None, flags=None):
        if isinstance(content, (DictConfig, ListConfig)):
            return content
        if isinstance(content, list):
            return ListConfig(content)
        return DictConfig(content or {})

    @staticmethod
    def to_container(cfg, resolve: bool = False):
        def plain(v):
            if isinstance(v, dict):
                return {k: plain(x) for k, x in v.items()}
            if isinstance(v, list):
                return [plain(x) for x in v]
            return v

        return plain(cfg)

    @staticmethod
    def is_config(obj) -> bool:
        return isinstance(obj, (DictConfig, ListConfig))

    @staticmethod
    def merge(*configs):
        out = DictConfig({})

        def merge_in(dst, src):
            for k, v in src.items():
                if k in dst and isinstance(dst[k], dict) and isinstance(v, dict):
                    merge_in(dst[k], v)
                else:
                    dst[k] = _wrap(v)

        for c in configs:
            merge_in(out, c)
        return out

    @staticmethod
    def set_readonly(cfg, value):
        pass

    @staticmethod
    def set_struct(cfg, value):
        pass

    @staticmethod
    def register_new_resolver(name, resolver, **kwargs):
        pass

    @staticmethod
    def resolve(cfg):
        pass


class SCMode:
    DICT = "dict"
    DICT_CONFIG = "dict_config"
    INSTANTIATE = "instantiate"
