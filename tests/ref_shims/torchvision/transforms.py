import numpy as np
import torch


class Compose:
    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, x):
        for t in self.transforms:
            x = t(x)
        return x


class ToTensor:
    """HWC uint8 [0,255] (or float) -> CHW float32 [0,1] torch tensor."""

    def __call__(self, pic):
        if isinstance(pic, torch.Tensor):
            t = pic.float()
        else:
            arr = np.asarray(pic)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            t = torch.from_numpy(np.ascontiguousarray(arr.transpose(2, 0, 1)))
            t = t.float()
        if t.max() > 1.5:  # uint8-range input
            t = t / 255.0
        elif isinstance(pic, np.ndarray) and pic.dtype == np.uint8:
            t = t / 255.0
        return t


class Normalize:
    def __init__(self, mean, std, inplace=False):
        self.mean = torch.tensor(mean).view(-1, 1, 1)
        self.std = torch.tensor(std).view(-1, 1, 1)

    def __call__(self, t):
        return (t - self.mean) / self.std
