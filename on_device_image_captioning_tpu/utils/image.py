"""Image preprocessing: PIL load -> RGB -> resize -> ImageNet-normalize.

Reference pipeline at utils/image_utils.py:5-23 (torchvision Resize + ToTensor +
Normalize). Here the host only decodes and resizes (PIL, bilinear with antialias —
torchvision's default); scaling to [0,1] and the mean/std normalization are cheap
elementwise ops done on device in float32 so they fuse into the first patch-embed
matmul under jit.
"""
from __future__ import annotations

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def load_image_rgb(path: str, size: int) -> np.ndarray:
    """Decode + resize on host. Returns uint8 (size, size, 3) NHWC."""
    from PIL import Image

    with Image.open(path) as im:
        if im.mode != "RGB":
            im = im.convert("RGB")
        im = im.resize((size, size), Image.BILINEAR)
        return np.asarray(im, dtype=np.uint8)


def normalize_on_device(images_u8):
    """uint8 NHWC (B, H, W, 3) -> normalized float32. Jittable; fuses with the
    model's first matmul."""
    import jax.numpy as jnp

    x = images_u8.astype(jnp.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def preprocess_batch(paths, size: int, num_threads: int = 8) -> np.ndarray:
    """Host-side batch decode; returns uint8 (B, size, size, 3). JPEG decode is
    GIL-releasing PIL C code, so a small thread pool parallelizes it."""
    if len(paths) <= 1 or num_threads <= 1:
        return np.stack([load_image_rgb(p, size) for p in paths])
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(min(num_threads, len(paths))) as pool:
        return np.stack(list(pool.map(lambda p: load_image_rgb(p, size), paths)))
