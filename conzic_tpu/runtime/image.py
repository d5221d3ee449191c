"""CLIP image preprocessing.

Reference: HF ``CLIPProcessor`` (``/root/reference/clip/clip.py:14,55-56``)
— resize shortest edge to 224 (bicubic), center-crop 224, rescale 1/255,
normalize with the CLIP mean/std.

Two paths:
  - ``preprocess_pil``: exact host-side replica (PIL bicubic) — parity path.
  - ``preprocess_jax``: jax-traced resize/normalize for on-device batching
    (``jax.image.resize`` bicubic differs from PIL at edge pixels by <1e-2
    per channel; embedding-level impact is negligible and documented).

Output is NHWC float32 (TPU-native layout; HF uses NCHW).
"""

from __future__ import annotations

import numpy as np

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def preprocess_pil(image, image_size: int = 224) -> np.ndarray:
    """PIL image -> (H, W, C) float32, exact CLIPProcessor semantics."""
    from PIL import Image

    if image.mode != "RGB":
        image = image.convert("RGB")
    w, h = image.size
    short, long = (w, h) if w <= h else (h, w)
    new_short = image_size
    # HF truncates (int), not rounds (image_transforms.get_resize_output_image_size)
    new_long = int(image_size * long / short)
    nw, nh = (new_short, new_long) if w <= h else (new_long, new_short)
    image = image.resize((nw, nh), Image.BICUBIC)
    left = (nw - image_size) // 2
    top = (nh - image_size) // 2
    image = image.crop((left, top, left + image_size, top + image_size))
    arr = np.asarray(image, np.float32) / 255.0
    return (arr - CLIP_MEAN) / CLIP_STD


def preprocess_batch_pil(images, image_size: int = 224,
                         workers: int = 0) -> np.ndarray:
    """Batch host preprocessing; ``workers`` > 1 parallelizes across a
    thread pool (PIL's decode/resize release the GIL). 0 = auto: threads
    for batches of >= 8 images on multi-core hosts — at B=128 the serial
    pipeline costs ~1-3 s, comparable to a whole pruned-tier generation,
    so the batched runner would otherwise be host-bound. Measured r3 on
    THIS 1-core VM: threads are 0.6-0.9x (pure overhead) — auto stays
    serial there; real v5e hosts have many cores."""
    import os

    if workers == 0:
        ncpu = os.cpu_count() or 1
        workers = min(16, ncpu, len(images)) if (
            len(images) >= 8 and ncpu > 1
        ) else 1
    if workers <= 1 or len(images) <= 1:
        return np.stack([preprocess_pil(im, image_size) for im in images])
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=workers) as pool:
        outs = list(pool.map(lambda im: preprocess_pil(im, image_size),
                             images))
    return np.stack(outs)


def preprocess_jax(pixels, image_size: int = 224):
    """(H, W, C) uint8/float -> (image_size, image_size, C) float32, traced.

    Jit-compatible only for a fixed input shape; aspect-preserving resize +
    center crop like the host path.
    """
    import jax.numpy as jnp
    from jax import image as jimage

    pixels = jnp.asarray(pixels).astype(jnp.float32)
    h, w = pixels.shape[0], pixels.shape[1]
    if h <= w:
        nh, nw = image_size, int(image_size * w / h)
    else:
        nh, nw = int(image_size * h / w), image_size
    out = jimage.resize(pixels, (nh, nw, pixels.shape[2]), method="bicubic")
    top = (nh - image_size) // 2
    left = (nw - image_size) // 2
    out = out[top : top + image_size, left : left + image_size, :]
    out = out / 255.0
    return (out - CLIP_MEAN) / CLIP_STD
