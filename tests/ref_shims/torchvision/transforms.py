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
            # real torchvision raises here — surfacing misuse beats
            # silently feeding unscaled bytes into Normalize
            raise TypeError(f"pic should be PIL Image or ndarray, got {type(pic)}")
        arr = np.asarray(pic)  # ndarray or PIL image (mode -> dtype)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        t = torch.from_numpy(np.ascontiguousarray(arr.transpose(2, 0, 1))).float()
        # real torchvision scales ONLY byte images; float/int16/int32
        # arrays (and PIL 'F'/'I' modes) keep their range — scaling on
        # magnitude would silently diverge the oracle from the reference
        if arr.dtype == np.uint8:
            t = t / 255.0
        return t


class Normalize:
    def __init__(self, mean, std, inplace=False):
        self.mean = torch.tensor(mean).view(-1, 1, 1)
        self.std = torch.tensor(std).view(-1, 1, 1)

    def __call__(self, t):
        return (t - self.mean) / self.std
