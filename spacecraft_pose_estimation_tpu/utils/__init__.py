"""Shared utilities: platform control, logging, visualization, analysis."""

from .platform import maybe_force_platform
