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


class TestTorchvisionOpsShims:
    """The nms/roi_align shims sit on the reference oracle's inference
    path — cross-check them against the repo's independently written
    JAX implementations (two implementations, two codebases: agreement
    is strong evidence both match torchvision)."""

    def test_nms_matches_jax_nms_mask(self):
        from torchvision.ops import nms as shim_nms  # ref_shims

        import jax.numpy as jnp

        from spacecraft_pose_estimation_tpu.ops.nms import nms_mask

        rng = np.random.default_rng(0)
        for trial in range(5):
            n = 60
            xy = rng.uniform(0, 90, (n, 2))
            wh = rng.uniform(5, 40, (n, 2))
            boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
            scores = rng.uniform(0, 1, n).astype(np.float32)
            for thr in (0.3, 0.5, 0.7):
                keep_idx = shim_nms(
                    torch.from_numpy(boxes), torch.from_numpy(scores), thr
                ).numpy()
                mask = np.asarray(
                    nms_mask(jnp.asarray(boxes), jnp.asarray(scores), thr)
                )
                assert sorted(keep_idx.tolist()) == np.where(mask)[0].tolist()
                # shim returns decreasing-score order (the torchvision
                # contract detectron2's topk relies on)
                assert np.all(np.diff(scores[keep_idx]) <= 0)

    def test_batched_nms_isolates_categories(self):
        from torchvision.ops.boxes import batched_nms

        boxes = torch.tensor(
            [[0.0, 0, 10, 10], [1, 1, 11, 11], [0, 0, 10, 10]], dtype=torch.float32
        )
        scores = torch.tensor([0.9, 0.8, 0.7])
        idxs = torch.tensor([0, 0, 1])  # the duplicate box is another class
        keep = batched_nms(boxes, scores, idxs, 0.5).numpy().tolist()
        assert keep == [0, 2]

    def test_roi_align_matches_jax(self):
        from torchvision.ops import roi_align as shim_roi_align

        import jax.numpy as jnp

        from spacecraft_pose_estimation_tpu.ops.roi_align import roi_align

        rng = np.random.default_rng(1)
        H = W = 24
        C = 5
        feat = rng.normal(size=(1, C, H, W)).astype(np.float32)
        boxes = np.array(
            [[2.0, 3.0, 60.0, 50.0], [0.0, 0.0, 90.0, 90.0],
             [40.0, 40.0, 55.0, 70.0], [-4.0, -4.0, 30.0, 20.0]],
            np.float32,
        )
        rois = np.concatenate([np.zeros((4, 1), np.float32), boxes], 1)
        for aligned in (True, False):
            ours = np.asarray(
                roi_align(
                    jnp.asarray(feat[0].transpose(1, 2, 0)), jnp.asarray(boxes),
                    7, 0.25, sampling_ratio=2, aligned=aligned,
                )
            )  # (R, 7, 7, C)
            theirs = shim_roi_align(
                torch.from_numpy(feat), torch.from_numpy(rois), (7, 7),
                spatial_scale=0.25, sampling_ratio=2, aligned=aligned,
            ).numpy()  # (R, C, 7, 7)
            np.testing.assert_allclose(
                ours.transpose(0, 3, 1, 2), theirs, rtol=1e-5, atol=1e-5
            )

    def test_roi_align_adaptive_sampling_boundary_zeros(self):
        """sampling_ratio=-1 (adaptive) + samples outside [-1, size]
        contribute exact zeros (the kernel's boundary rule)."""
        from torchvision.ops import roi_align as shim_roi_align

        feat = torch.ones((1, 1, 8, 8))
        rois = torch.tensor([[0.0, -40.0, -40.0, -20.0, -20.0]])  # fully outside
        out = shim_roi_align(feat, rois, (2, 2), 1.0, -1, True).numpy()
        assert np.all(out == 0.0)
        rois = torch.tensor([[0.0, 0.0, 0.0, 8.0, 8.0]])  # exactly the map
        out = shim_roi_align(feat, rois, (2, 2), 1.0, -1, True).numpy()
        np.testing.assert_allclose(out, 1.0, atol=1e-6)
