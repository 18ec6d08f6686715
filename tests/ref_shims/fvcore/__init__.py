"""Minimal fvcore shim (fvcore is not installed in this image).

Only the API surface the vendored detectron2 v0.6 actually touches is
implemented — enough to run the reference's object-detection stage
scripts UNMODIFIED as CPU subprocess oracles for the golden-parity
tests. Semantics of the implemented pieces follow the fvcore docs/usage
sites in the vendored tree (cited per module); anything the oracles
never exercise raises on use rather than silently diverging.
"""

__version__ = "0.1.6"
