"""fvcore.transforms.transform shim.

The vendored detectron2 subclasses ``Transform`` for its own transforms
(data/transforms/transform.py ResizeTransform etc. — the one
DefaultPredictor actually applies) and star-imports this module in
data/transforms/__init__.py. Semantics follow the fvcore API contract
as exercised by those call sites: `_set_attributes`, `apply_image` /
`apply_coords` (subclass responsibility), `apply_box` via the
4-corner-coords trick, `register_type`, `inverse`, and the concrete
flip/crop/blend/pad/no-op transforms.
"""

import inspect
from typing import Any, Callable, List, Optional, TypeVar

import numpy as np

__all__ = [
    "BlendTransform",
    "CropTransform",
    "GridSampleTransform",
    "HFlipTransform",
    "VFlipTransform",
    "NoOpTransform",
    "PadTransform",
    "ScaleTransform",
    "Transform",
    "TransformList",
]


class Transform:
    def _set_attributes(self, params: Optional[dict] = None) -> None:
        if params:
            for k, v in params.items():
                if k != "self" and not k.startswith("_"):
                    setattr(self, k, v)

    def apply_image(self, img: np.ndarray):
        raise NotImplementedError

    def apply_coords(self, coords: np.ndarray):
        raise NotImplementedError

    def apply_segmentation(self, segmentation: np.ndarray) -> np.ndarray:
        return self.apply_image(segmentation)

    def apply_box(self, box: np.ndarray) -> np.ndarray:
        # transform the 4 corners, take the axis-aligned hull
        idxs = np.array([(0, 1), (2, 1), (0, 3), (2, 3)]).flatten()
        coords = np.asarray(box).reshape(-1, 4)[:, idxs].reshape(-1, 2)
        coords = self.apply_coords(coords).reshape((-1, 4, 2))
        minxy = coords.min(axis=1)
        maxxy = coords.max(axis=1)
        return np.concatenate((minxy, maxxy), axis=1)

    def apply_polygons(self, polygons: list) -> list:
        return [self.apply_coords(p) for p in polygons]

    @classmethod
    def register_type(cls, data_type: str, func: Optional[Callable] = None):
        if func is None:
            def wrapper(decorated_func):
                cls.register_type(data_type, decorated_func)
                return decorated_func

            return wrapper
        argspec = inspect.getfullargspec(func)
        assert len(argspec.args) == 2, (
            f"register_type expects a function taking (transform, data), "
            f"got {argspec.args}"
        )
        setattr(cls, "apply_" + data_type, func)

    def inverse(self) -> "Transform":
        raise NotImplementedError

    def __repr__(self):
        return f"{type(self).__name__}({vars(self)})"


_T = TypeVar("_T")


class TransformList(Transform):
    def __init__(self, transforms: List[Transform]):
        super().__init__()
        tfms_flatten = []
        for t in transforms:
            assert isinstance(t, Transform), f"Not a Transform: {t}"
            if isinstance(t, TransformList):
                tfms_flatten.extend(t.transforms)
            else:
                tfms_flatten.append(t)
        self.transforms = tfms_flatten

    def _apply(self, x: _T, meth: str) -> _T:
        for t in self.transforms:
            x = getattr(t, meth)(x)
        return x

    def __getattribute__(self, name: str):
        # dispatch any apply_* through the chain
        if name.startswith("apply_"):
            return lambda x: self._apply(x, name)
        return super().__getattribute__(name)

    def __add__(self, other: "TransformList") -> "TransformList":
        others = other.transforms if isinstance(other, TransformList) else [other]
        return TransformList(self.transforms + others)

    def __iadd__(self, other: "TransformList") -> "TransformList":
        others = other.transforms if isinstance(other, TransformList) else [other]
        self.transforms.extend(others)
        return self

    def __radd__(self, other: "TransformList") -> "TransformList":
        others = other.transforms if isinstance(other, TransformList) else [other]
        return TransformList(others + self.transforms)

    def __len__(self) -> int:
        return len(self.transforms)

    def __getitem__(self, idx) -> Transform:
        return self.transforms[idx]

    def inverse(self) -> "TransformList":
        return TransformList([t.inverse() for t in self.transforms[::-1]])


class NoOpTransform(Transform):
    def apply_image(self, img):
        return img

    def apply_coords(self, coords):
        return coords

    def inverse(self) -> Transform:
        return self

    def __getattr__(self, name: str):
        if name.startswith("apply_"):
            return lambda x: x
        raise AttributeError(f"NoOpTransform object has no attribute {name}")


class HFlipTransform(Transform):
    def __init__(self, width: int):
        super().__init__()
        self._set_attributes(locals())

    def apply_image(self, img: np.ndarray) -> np.ndarray:
        if img.ndim <= 3:  # HxW, HxWxC
            return np.flip(img, axis=1)
        return np.flip(img, axis=-2)

    def apply_coords(self, coords: np.ndarray) -> np.ndarray:
        coords = np.asarray(coords, dtype=np.float64).copy()
        coords[:, 0] = self.width - coords[:, 0]
        return coords

    def inverse(self) -> Transform:
        return self


class VFlipTransform(Transform):
    def __init__(self, height: int):
        super().__init__()
        self._set_attributes(locals())

    def apply_image(self, img: np.ndarray) -> np.ndarray:
        if img.ndim <= 3:
            return np.flip(img, axis=0)
        return np.flip(img, axis=-3)

    def apply_coords(self, coords: np.ndarray) -> np.ndarray:
        coords = np.asarray(coords, dtype=np.float64).copy()
        coords[:, 1] = self.height - coords[:, 1]
        return coords

    def inverse(self) -> Transform:
        return self


class CropTransform(Transform):
    def __init__(
        self,
        x0: int,
        y0: int,
        w: int,
        h: int,
        orig_w: Optional[int] = None,
        orig_h: Optional[int] = None,
    ):
        super().__init__()
        self._set_attributes(locals())

    def apply_image(self, img: np.ndarray) -> np.ndarray:
        if len(img.shape) <= 3:
            return img[self.y0 : self.y0 + self.h, self.x0 : self.x0 + self.w]
        return img[..., self.y0 : self.y0 + self.h, self.x0 : self.x0 + self.w, :]

    def apply_coords(self, coords: np.ndarray) -> np.ndarray:
        coords = np.asarray(coords, dtype=np.float64).copy()
        coords[:, 0] -= self.x0
        coords[:, 1] -= self.y0
        return coords

    def apply_polygons(self, polygons: list) -> list:
        # fvcore clips polygons to the crop box with shapely; the oracle
        # runs are box/keypoint-only, so polygon cropping is out of scope
        raise NotImplementedError(
            "CropTransform.apply_polygons is out of the oracle shim's scope"
        )

    def inverse(self) -> Transform:
        assert self.orig_w is not None and self.orig_h is not None
        pad_x1 = self.orig_w - self.x0 - self.w
        pad_y1 = self.orig_h - self.y0 - self.h
        return PadTransform(self.x0, self.y0, pad_x1, pad_y1, self.w, self.h)


class PadTransform(Transform):
    def __init__(
        self,
        x0: int,
        y0: int,
        x1: int,
        y1: int,
        orig_w: Optional[int] = None,
        orig_h: Optional[int] = None,
        pad_value: float = 0,
        seg_pad_value: int = 0,
    ):
        super().__init__()
        self._set_attributes(locals())

    def apply_image(self, img: np.ndarray) -> np.ndarray:
        if img.ndim == 3:
            padding = ((self.y0, self.y1), (self.x0, self.x1), (0, 0))
        else:
            padding = ((self.y0, self.y1), (self.x0, self.x1))
        return np.pad(img, padding, mode="constant", constant_values=self.pad_value)

    def apply_segmentation(self, img: np.ndarray) -> np.ndarray:
        padding = ((self.y0, self.y1), (self.x0, self.x1))
        return np.pad(img, padding, mode="constant", constant_values=self.seg_pad_value)

    def apply_coords(self, coords: np.ndarray) -> np.ndarray:
        coords = np.asarray(coords, dtype=np.float64).copy()
        coords[:, 0] += self.x0
        coords[:, 1] += self.y0
        return coords

    def inverse(self) -> Transform:
        assert self.orig_w is not None and self.orig_h is not None
        neww = self.orig_w + self.x0 + self.x1
        newh = self.orig_h + self.y0 + self.y1
        return CropTransform(self.x0, self.y0, self.orig_w, self.orig_h, neww, newh)


class BlendTransform(Transform):
    def __init__(self, src_image: np.ndarray, src_weight: float, dst_weight: float):
        super().__init__()
        self._set_attributes(locals())

    def apply_image(self, img: np.ndarray, interp: Optional[str] = None) -> np.ndarray:
        if img.dtype == np.uint8:
            img = img.astype(np.float32)
            img = self.src_weight * self.src_image + self.dst_weight * img
            return np.clip(img, 0, 255).astype(np.uint8)
        return self.src_weight * self.src_image + self.dst_weight * img

    def apply_coords(self, coords: np.ndarray) -> np.ndarray:
        return coords

    def apply_segmentation(self, segmentation: np.ndarray) -> np.ndarray:
        return segmentation

    def inverse(self) -> Transform:
        raise NotImplementedError


class ScaleTransform(Transform):
    def __init__(self, h: int, w: int, new_h: int, new_w: int, interp: str = None):
        super().__init__()
        self._set_attributes(locals())

    def apply_image(self, img: np.ndarray, interp: str = None) -> np.ndarray:
        raise NotImplementedError(
            "ScaleTransform.apply_image is out of the oracle shim's scope"
        )

    def apply_coords(self, coords: np.ndarray) -> np.ndarray:
        coords = np.asarray(coords, dtype=np.float64).copy()
        coords[:, 0] = coords[:, 0] * (self.new_w * 1.0 / self.w)
        coords[:, 1] = coords[:, 1] * (self.new_h * 1.0 / self.h)
        return coords

    def inverse(self) -> Transform:
        return ScaleTransform(self.new_h, self.new_w, self.h, self.w, self.interp)


class GridSampleTransform(Transform):
    def __init__(self, grid: np.ndarray, interp: str):
        super().__init__()
        self._set_attributes(locals())

    def apply_image(self, img: np.ndarray, interp: str = None) -> np.ndarray:
        raise NotImplementedError(
            "GridSampleTransform is out of the oracle shim's scope"
        )

    def apply_coords(self, coords: np.ndarray):
        raise NotImplementedError(
            "GridSampleTransform is out of the oracle shim's scope"
        )
