"""DVS event-camera simulation (the v2e subsystem, TPU-native).

The reference's v2e (v2e/v2ecore/) is a stateful per-frame torch loop
emitting ragged event lists. Here the DVS pixel model is a functional
`lax.scan` over frames producing *dense per-iteration event maps*
(fixed shapes); sparse (t, x, y, p) event lists exist only at the host
IO edge (events/io.py), matching the reference's CSV/AEDAT contracts.
"""

from .emulator import EmulatorConfig, EmulatorState, emulate_frame, emulate_sequence, init_state
from .renderer import render_frames, ExposureMode

# host-side recording formats: events/io.py (CSV, AEDAT2, h5),
# events/aedat4.py (AEDAT-4 flatbuffer + native LZ4),
# events/ddd20.py (DDD20 DAVIS hdf5) — imported lazily by the tools
