"""json_tricks shim: plain json with numpy scalar/array tolerance —
the subset the reference's dataset code uses (load of COCO dicts,
optional dump)."""

import json as _json

import numpy as _np


class _NumpyEncoder(_json.JSONEncoder):
    def default(self, o):
        if isinstance(o, _np.integer):
            return int(o)
        if isinstance(o, _np.floating):
            return float(o)
        if isinstance(o, _np.ndarray):
            return o.tolist()
        return super().default(o)


def load(fp, *args, **kwargs):
    if isinstance(fp, str):
        with open(fp) as f:
            return _json.load(f)
    return _json.load(fp)


def loads(s, *args, **kwargs):
    return _json.loads(s)


def dump(obj, fp, *args, **kwargs):
    kwargs.setdefault("cls", _NumpyEncoder)
    kwargs.pop("sort_keys", None)
    if isinstance(fp, str):
        with open(fp, "w") as f:
            return _json.dump(obj, f, cls=_NumpyEncoder)
    return _json.dump(obj, fp, cls=_NumpyEncoder)


def dumps(obj, *args, **kwargs):
    return _json.dumps(obj, cls=_NumpyEncoder)
