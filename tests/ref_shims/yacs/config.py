"""Minimal yacs.config.CfgNode shim — just the API surface the
reference's lib/config uses (yacs is not installed in this image). Used
ONLY by the golden-parity tests that run the reference's stage scripts
as oracles; the framework itself has its own config system."""

from __future__ import annotations

import copy
import yaml


class CfgNode(dict):
    IMMUTABLE = "__immutable__"
    NEW_ALLOWED = "__new_allowed__"

    def __init__(self, init_dict=None, new_allowed=False):
        super().__init__()
        object.__setattr__(self, "_frozen", False)
        object.__setattr__(self, "_new_allowed", bool(new_allowed))
        for k, v in (init_dict or {}).items():
            self[k] = self._cast(v)

    @classmethod
    def _cast(cls, v):
        if isinstance(v, dict) and not isinstance(v, CfgNode):
            return CfgNode(v, new_allowed=True)
        return v

    # attribute <-> item access
    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        if object.__getattribute__(self, "_frozen"):
            raise AttributeError(f"CfgNode is frozen; cannot set {name}")
        self[name] = self._cast(value)

    # freeze/defrost
    def freeze(self):
        object.__setattr__(self, "_frozen", True)
        for v in self.values():
            if isinstance(v, CfgNode):
                v.freeze()

    def defrost(self):
        object.__setattr__(self, "_frozen", False)
        for v in self.values():
            if isinstance(v, CfgNode):
                v.defrost()

    def clone(self):
        # preserve the subclass (detectron2's CfgNode subclasses the
        # fvcore one, which subclasses this; get_cfg() clones _C)
        node = type(self)(new_allowed=object.__getattribute__(self, "_new_allowed"))
        for k, v in self.items():
            node[k] = v.clone() if isinstance(v, CfgNode) else copy.deepcopy(v)
        return node

    def is_new_allowed(self):
        return object.__getattribute__(self, "_new_allowed")

    # merging
    def _merge(self, other):
        for k, v in other.items():
            if k in self and isinstance(self[k], CfgNode) and isinstance(v, dict):
                self[k]._merge(v)
            elif k in self or self.is_new_allowed():
                if k in self and not isinstance(self[k], (CfgNode, type(None))):
                    v = _coerce(v, self[k])
                self[k] = self._cast(v)
            else:
                raise KeyError(f"Non-existent config key: {k}")

    def merge_from_file(self, cfg_file):
        with open(cfg_file) as f:
            loaded = yaml.safe_load(f) or {}
        self._merge(loaded)

    def merge_from_other_cfg(self, other):
        self._merge(other)

    def merge_from_list(self, opts):
        assert len(opts) % 2 == 0, opts
        for key, value in zip(opts[0::2], opts[1::2]):
            node = self
            parts = key.split(".")
            for p in parts[:-1]:
                node = node[p]
            leaf = parts[-1]
            if leaf not in node and not node.is_new_allowed():
                raise KeyError(f"Non-existent config key: {key}")
            if isinstance(value, str):
                try:
                    value = yaml.safe_load(value)
                except Exception:
                    pass
            if leaf in node and not isinstance(node[leaf], (CfgNode, type(None))):
                value = _coerce(value, node[leaf])
            node[leaf] = self._cast(value)

    def dump(self, **kwargs):
        def plain(n):
            return {
                k: plain(v) if isinstance(v, CfgNode) else v for k, v in n.items()
            }

        return yaml.safe_dump(plain(self), **kwargs)

    def __repr__(self):
        return self.dump()

    def __str__(self):
        return self.dump()


def _coerce(value, like):
    """yacs-style type reconciliation: lists<->tuples, int->float."""
    if isinstance(like, tuple) and isinstance(value, list):
        return tuple(value)
    if isinstance(like, list) and isinstance(value, tuple):
        return list(value)
    if isinstance(like, float) and isinstance(value, int):
        return float(value)
    return value
