"""CLIP image preprocessing parity vs HF CLIPImageProcessor.

The reference preprocesses via CLIPProcessor (clip/clip.py:14,55-56);
preprocess_pil must reproduce it exactly (resize shortest side bicubic,
center crop, rescale, normalize)."""

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")
PIL = pytest.importorskip("PIL")

from PIL import Image

from conzic_tpu.runtime.image import preprocess_jax, preprocess_pil


@pytest.mark.parametrize("size", [(320, 240), (240, 320), (224, 224), (500, 100)])
def test_preprocess_pil_matches_hf(size):
    rng = np.random.RandomState(0)
    img = Image.fromarray(
        rng.randint(0, 255, (size[1], size[0], 3), dtype=np.uint8)
    )
    hf = transformers.CLIPImageProcessor()  # ViT-B/32 defaults: 224/224
    ref = hf(images=img, return_tensors="np")["pixel_values"][0]  # (C,H,W)
    got = preprocess_pil(img)  # (H,W,C)
    np.testing.assert_allclose(got.transpose(2, 0, 1), ref, rtol=1e-5, atol=1e-5)


def test_preprocess_pil_fuzz_sizes_and_modes_match_hf():
    """Seeded fuzz over image shapes (tiny, sub-crop-size, extreme aspect
    ratios) and PIL modes (L/RGBA/P/CMYK — the do_convert_rgb path):
    byte-parity of the full resize -> center-crop -> normalize pipeline
    vs HF, including the pad-when-smaller-than-crop branch."""
    rng = np.random.RandomState(7)
    hf = transformers.CLIPImageProcessor()
    sizes = [(5, 300), (300, 5), (100, 100), (223, 225), (1, 1000),
             (640, 480), (17, 31)]
    sizes += [tuple(rng.randint(4, 700, 2)) for _ in range(8)]
    modes = ["RGB", "L", "RGBA", "P", "CMYK"]
    for i, (w, h) in enumerate(sizes):
        mode = modes[i % len(modes)]
        arr = rng.randint(0, 255, (h, w, 4), dtype=np.uint8)
        img = Image.fromarray(arr[..., :3]).convert(mode)
        ref = hf(images=img, return_tensors="np")["pixel_values"][0]
        got = preprocess_pil(img)
        np.testing.assert_allclose(
            got.transpose(2, 0, 1), ref, rtol=1e-5, atol=1e-5,
            err_msg=f"size={(w, h)} mode={mode}",
        )


def test_preprocess_jax_close_to_pil():
    rng = np.random.RandomState(1)
    arr = rng.randint(0, 255, (300, 400, 3), dtype=np.uint8)
    ref = preprocess_pil(Image.fromarray(arr))
    got = np.asarray(preprocess_jax(arr))
    assert got.shape == ref.shape == (224, 224, 3)
    # bicubic implementations differ at edges; mean deviation must be small
    assert np.abs(got - ref).mean() < 0.12
