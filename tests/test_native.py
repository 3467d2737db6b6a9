"""Native C++ preprocessing vs PIL: bit-exactness and batch path."""

import numpy as np
import pytest
from PIL import Image

from tramba_tpu.data import native
from tramba_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

pytestmark = pytest.mark.skipif(not native.available(), reason="no C++ toolchain")


@pytest.mark.parametrize("h,w,size", [(100, 80, 384), (500, 400, 384), (384, 384, 384),
                                      (61, 99, 32), (640, 480, 224)])
def test_bilinear_matches_pil_exactly(h, w, size):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    want = np.asarray(Image.fromarray(img, "RGB").resize((size, size), Image.BILINEAR))
    got = native.resize_bilinear(img, size)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("h,w,size", [(100, 80, 384), (500, 400, 32)])
def test_nearest_matches_pil_exactly(h, w, size):
    rng = np.random.default_rng(1)
    mask = rng.integers(0, 256, (h, w), dtype=np.uint8)
    want = np.asarray(Image.fromarray(mask, "L").resize((size, size), Image.NEAREST))
    got = native.resize_nearest(mask, size)
    np.testing.assert_array_equal(got, want)


def test_preprocess_eval_batch_matches_python_path():
    rng = np.random.default_rng(2)
    images = [rng.integers(0, 256, (int(h), int(w), 3), dtype=np.uint8)
              for h, w in [(120, 90), (64, 64), (300, 211)]]
    masks = [rng.integers(0, 256, im.shape[:2], dtype=np.uint8) for im in images]
    size = 96
    out_img, out_mask = native.preprocess_eval_batch(images, masks, size,
                                                     IMAGENET_MEAN, IMAGENET_STD)
    for i, (im, mk) in enumerate(zip(images, masks)):
        ref = np.asarray(Image.fromarray(im, "RGB").resize((size, size), Image.BILINEAR),
                         np.float32) / 255.0
        ref = (ref - IMAGENET_MEAN) / IMAGENET_STD
        np.testing.assert_allclose(out_img[i], ref, atol=1e-6)
        refm = np.asarray(Image.fromarray(mk, "L").resize((size, size), Image.NEAREST),
                          np.float32) / 255.0
        np.testing.assert_allclose(out_mask[i, :, :, 0], refm, atol=1e-6)
