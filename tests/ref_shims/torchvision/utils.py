import torch


def make_grid(batch_image, nrow=8, padding=2, normalize=False, **kwargs):
    """Minimal make_grid: tile (B, C, H, W) into one (C, gh, gw) image."""
    b, c, h, w = batch_image.shape
    ncol = min(nrow, b)
    nrows = (b + ncol - 1) // ncol
    img = batch_image
    if normalize:
        lo, hi = float(img.min()), float(img.max())
        img = (img - lo) / max(hi - lo, 1e-9)
    grid = torch.zeros(c, nrows * (h + padding) + padding, ncol * (w + padding) + padding)
    for i in range(b):
        r, cc = divmod(i, ncol)
        y0 = padding + r * (h + padding)
        x0 = padding + cc * (w + padding)
        grid[:, y0:y0 + h, x0:x0 + w] = img[i]
    return grid
