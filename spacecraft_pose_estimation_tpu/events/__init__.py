"""DVS event-camera simulation (the v2e subsystem, TPU-native).

The reference's v2e (v2e/v2ecore/) is a stateful per-frame torch loop
emitting ragged event lists. Here the DVS pixel model is a functional
`lax.scan` over frames producing *dense per-iteration event maps*
(fixed shapes); sparse (t, x, y, p) event lists exist only at the host
IO edge (events/io.py), matching the reference's CSV/AEDAT contracts.
"""

from .emulator import EmulatorConfig, EmulatorState, emulate_frame, emulate_sequence, init_state
from .renderer import render_frames, ExposureMode
