"""Pure-JAX numeric ops: geometry, heatmaps, warps, NMS, ROI pooling, PnP."""
