"""Synthetic frame sources for the event simulator.

Equivalent of v2e's synthetic-input plugin path
(v2ecore/base_synthetic_input.py + the --synthetic_input CLI hook,
v2e.py:122-160): a source yields (frame, time) pairs that feed the
emulator directly instead of video files. `MovingDot` is the bundled
example source; users subclass `SyntheticInput`.
"""

from __future__ import annotations

import numpy as np


class SyntheticInput:
    """Base class: iterate (frame float32 [0,255] (H, W), t_seconds)."""

    def __init__(self, width: int, height: int, frame_rate: float = 100.0):
        self.width = width
        self.height = height
        self.frame_rate = frame_rate

    def total_frames(self) -> int:
        raise NotImplementedError

    def frame(self, i: int) -> np.ndarray:
        raise NotImplementedError

    def __iter__(self):
        for i in range(self.total_frames()):
            yield self.frame(i), i / self.frame_rate

    def frames_array(self):
        """(T, H, W) frames + (T,) timestamps, ready for emulate_sequence."""
        frames = np.stack([self.frame(i) for i in range(self.total_frames())])
        ts = np.arange(self.total_frames()) / self.frame_rate
        return frames.astype(np.float32), ts.astype(np.float32)


class MovingDot(SyntheticInput):
    """A bright dot orbiting the frame center — deterministic event rates
    for emulator validation (the moving-dot example of v2e)."""

    def __init__(self, width=64, height=64, frame_rate=200.0, num_frames=100,
                 radius_frac=0.3, dot_radius=3, background=10.0, foreground=250.0):
        super().__init__(width, height, frame_rate)
        self.num_frames = num_frames
        self.radius_frac = radius_frac
        self.dot_radius = dot_radius
        self.background = background
        self.foreground = foreground

    def total_frames(self) -> int:
        return self.num_frames

    def frame(self, i: int) -> np.ndarray:
        angle = 2 * np.pi * i / self.num_frames
        cx = self.width / 2 + self.radius_frac * self.width * np.cos(angle)
        cy = self.height / 2 + self.radius_frac * self.height * np.sin(angle)
        ys, xs = np.mgrid[0 : self.height, 0 : self.width]
        dot = (xs - cx) ** 2 + (ys - cy) ** 2 <= self.dot_radius**2
        return np.where(dot, self.foreground, self.background).astype(np.float32)
