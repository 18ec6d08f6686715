"""The golden-parity shims must reproduce the REAL libraries' semantics
— a shim that silently diverges manufactures (or masks) parity failures.
Covers the torchvision ToTensor scaling contract."""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "ref_shims"))

from torchvision import transforms  # noqa: E402  (the shim)

pytestmark = pytest.mark.smoke


class TestToTensorShim:
    def test_uint8_scaled_to_unit_range(self):
        img = np.full((4, 5, 3), 255, np.uint8)
        t = transforms.ToTensor()(img)
        assert t.shape == (3, 4, 5)
        assert float(t.max()) == pytest.approx(1.0)

    def test_float_0_255_not_rescaled(self):
        """torchvision only scales uint8; float arrays keep their range."""
        img = np.full((4, 5, 3), 200.0, np.float32)
        t = transforms.ToTensor()(img)
        assert float(t.max()) == pytest.approx(200.0)

    def test_float_unit_range_untouched(self):
        img = np.full((4, 5, 3), 0.5, np.float32)
        t = transforms.ToTensor()(img)
        assert float(t.max()) == pytest.approx(0.5)

    def test_tensor_input_raises(self):
        """Real torchvision raises on tensor inputs — the shim must not
        silently pass 0..255 bytes into a downstream Normalize."""
        with pytest.raises(TypeError):
            transforms.ToTensor()(torch.full((3, 4, 5), 3.0))
