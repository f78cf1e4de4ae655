"""Image I/O (SURVEY.md §2 row R12 — the reference writes BMP/PPM from C++;
PNG via Pillow is the modern equivalent)."""
from __future__ import annotations

import numpy as np


def save_png(path, image):
    """(H, W, 3) float [0,1] or uint8 → PNG file."""
    from PIL import Image

    arr = np.asarray(image)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    Image.fromarray(arr).save(path)
    return path


def load_png(path, dtype=np.float32):
    """PNG file → (H, W, 3) float [0,1] (or uint8 if dtype=np.uint8)."""
    from PIL import Image

    arr = np.asarray(Image.open(path).convert("RGB"))
    if dtype == np.uint8:
        return arr
    return (arr.astype(dtype) / 255.0)
