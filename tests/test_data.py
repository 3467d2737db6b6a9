"""Data pipeline tests on synthetic image/mask pairs."""

import os

import numpy as np
import pytest
import scipy.fft
from PIL import Image

from tramba_tpu.data.freq import FreqStats, block_dct_features, compute_freq_stats, freq_decompose, rgb_to_ycbcr
from tramba_tpu.data.pipeline import BatchLoader, SODDataset, natural_sort
from tramba_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD, eval_transform


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("tsod")
    rng = np.random.default_rng(0)
    for split in ("Train", "Test"):
        os.makedirs(root / split / "image")
        os.makedirs(root / split / "mask")
        for i in range(5):
            w, h = int(rng.integers(40, 80)), int(rng.integers(40, 80))
            img = Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8), "RGB")
            mask = Image.fromarray((rng.uniform(size=(h, w)) > 0.5).astype(np.uint8) * 255, "L")
            img.save(root / split / "image" / f"img{i}.png")
            mask.save(root / split / "mask" / f"img{i}.png")
    # one mismatched-size pair that must be filtered out
    Image.new("RGB", (30, 30)).save(root / "Train" / "image" / "bad.png")
    Image.new("L", (20, 20)).save(root / "Train" / "mask" / "bad.png")
    return str(root)


def test_natural_sort():
    assert natural_sort(["a10.png", "a2.png", "a1.png"]) == ["a1.png", "a2.png", "a10.png"]


def test_dataset_filtering_and_eval_sample(dataset_dir):
    ds = SODDataset(dataset_dir, ["Train"], img_size=64, mode="test")
    assert len(ds) == 5  # mismatched pair filtered
    s = ds.get(0)
    assert s["image"].shape == (64, 64, 3) and s["image"].dtype == np.float32
    assert s["gt"].shape == (64, 64, 1)
    assert s["gt"].min() >= 0 and s["gt"].max() <= 1
    assert isinstance(s["shape"], tuple)


def test_eval_normalization_matches_reference_protocol(dataset_dir):
    ds = SODDataset(dataset_dir, ["Test"], img_size=32, mode="test")
    raw = Image.open(ds.images[0]).convert("RGB").resize((32, 32), Image.BILINEAR)
    want = (np.asarray(raw, np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(ds.get(0)["image"], want, rtol=1e-6)


def test_train_mode_is_reproducible(dataset_dir):
    ds = SODDataset(dataset_dir, ["Train"], img_size=48, mode="train")
    a = ds.get(1, np.random.default_rng(7))["image"]
    b = ds.get(1, np.random.default_rng(7))["image"]
    np.testing.assert_array_equal(a, b)


def test_batch_loader(dataset_dir):
    ds = SODDataset(dataset_dir, ["Train", "Test"], img_size=32, mode="test")
    loader = BatchLoader(ds, batch_size=4, shuffle=True, seed=1)
    batches = list(loader)
    assert len(batches) == len(loader) == 3
    assert batches[0]["image"].shape == (4, 32, 32, 3)
    assert batches[-1]["image"].shape[0] == 2
    names = [n for b in batches for n in b["name"]]
    assert len(names) == 10  # Train + Test both contribute 5 (names repeat across splits)
    # second epoch shuffles differently
    batches2 = list(loader)
    names2 = [n for b in batches2 for n in b["name"]]
    assert names != names2 and set(names) == set(names2)


def test_block_dct_features_against_scipy():
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 255, (16, 16, 3)).astype(np.float32)
    feats = block_dct_features(img)
    assert feats.shape == (2, 2, 192)
    ycc = rgb_to_ycbcr(img)
    blk = ycc[0:8, 8:16, 1]  # Cb plane, block (0,1)
    want = scipy.fft.dctn(blk.astype(np.float64), type=2, norm="ortho")
    got = feats[0, 1, 64 : 128].reshape(8, 8)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_freq_decompose_and_stats(tmp_path):
    rng = np.random.default_rng(3)
    imgs = [rng.uniform(0, 255, (16, 16, 3)).astype(np.float32) for _ in range(3)]
    stats = compute_freq_stats(imgs)
    high, low = freq_decompose(block_dct_features(imgs[0]))
    assert high.shape[-1] == low.shape[-1] == 96
    h, l = stats.normalize(high, low)
    assert np.isfinite(h).all() and np.isfinite(l).all()
    p = tmp_path / "stats.pkl"
    stats.save(str(p))
    loaded = FreqStats.load(str(p))
    np.testing.assert_allclose(loaded.high_mean, stats.high_mean)
