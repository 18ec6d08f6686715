"""Data layer: camera models, COCO interchange IO, dataset pipelines."""

from .camera import CameraModel
from . import coco_io
