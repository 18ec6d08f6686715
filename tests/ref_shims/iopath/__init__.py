"""Minimal iopath shim (local filesystem only) for the vendored
detectron2's utils/file_io.py. See fvcore/__init__.py for scope."""
