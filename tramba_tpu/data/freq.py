"""JPEG-style frequency features (alternative data path).

Reference semantics: ``data/dct.py`` + ``data/freq_dataloader.py`` — YCbCr
conversion, 8x8 block DCT producing 192 coefficient channels at 1/8
resolution, split into low/high 96-channel halves (per-plane first/last 32
coefficients), normalized by precomputed per-channel stats then /7.

Implemented as pure numpy/jnp over the MXU block-DCT (ops/dct.block_dct2d);
no torch_dct dependency.
"""

from __future__ import annotations

import pickle
from typing import Tuple

import numpy as np

from tramba_tpu.ops.dct import dct_basis

__all__ = ["rgb_to_ycbcr", "block_dct_features", "freq_decompose", "FreqStats", "compute_freq_stats"]

_YCBCR = np.asarray(
    [[0.257, 0.564, 0.098], [-0.148, -0.291, 0.439], [0.439, -0.368, -0.071]], np.float32
)
_SHIFT = np.asarray([16.0, 128.0, 128.0], np.float32)


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """(..., 3) RGB in [0, 255] -> YCbCr (data/dct.py:6-26 matrix)."""
    return rgb @ _YCBCR.T + _SHIFT


def block_dct_features(image: np.ndarray, block: int = 8) -> np.ndarray:
    """(H, W, 3) raw-pixel image -> (H/8, W/8, 192) DCT coefficient maps.

    Channel layout matches data/dct.py:50-52: for each of Y/Cb/Cr, the 64
    in-block coefficients in row-major order (plane-major: 64*plane + 8*u + v).
    """
    ycc = rgb_to_ycbcr(image.astype(np.float32))
    H, W, _ = ycc.shape
    b = np.asarray(dct_basis(block))
    x = ycc.reshape(H // block, block, W // block, block, 3)
    y = np.einsum("ipjqc,vq->ipjvc", x, b)
    y = np.einsum("ipjvc,up->iujvc", y, b)
    # (Hb, u, Wb, v, c) -> (Hb, Wb, c, u, v) -> (Hb, Wb, 192)
    y = y.transpose(0, 2, 4, 1, 3).reshape(H // block, W // block, 3 * block * block)
    return y.astype(np.float32)


def freq_decompose(freq: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(..., 192) -> (high (..., 96), low (..., 96)) — per-plane halves
    (freq_dataloader.py:76-83)."""
    planes = [freq[..., i * 64 : (i + 1) * 64] for i in range(3)]
    high = np.concatenate([p[..., 32:] for p in planes], axis=-1)
    low = np.concatenate([p[..., :32] for p in planes], axis=-1)
    return high, low


class FreqStats:
    """Per-channel normalization stats for the high/low frequency halves."""

    def __init__(self, high_mean, high_std, low_mean, low_std):
        self.high_mean = np.asarray(high_mean, np.float32)
        self.high_std = np.asarray(high_std, np.float32)
        self.low_mean = np.asarray(low_mean, np.float32)
        self.low_std = np.asarray(low_std, np.float32)

    @classmethod
    def load(cls, path: str) -> "FreqStats":
        with open(path, "rb") as f:
            d = pickle.load(f)
        return cls(d["high_mean"], d["high_std"], d["low_mean"], d["low_std"])

    def save(self, path: str):
        with open(path, "wb") as f:
            pickle.dump(
                {
                    "high_mean": self.high_mean,
                    "high_std": self.high_std,
                    "low_mean": self.low_mean,
                    "low_std": self.low_std,
                },
                f,
            )

    def normalize(self, high: np.ndarray, low: np.ndarray, div: float = 7.0):
        h = (high - self.high_mean) / self.high_std / div
        l = (low - self.low_mean) / self.low_std / div
        return h.astype(np.float32), l.astype(np.float32)


def compute_freq_stats(images) -> FreqStats:
    """Accumulate per-channel mean/std of high/low halves over raw images."""
    h_sum = l_sum = h_sq = l_sq = None
    n = 0
    for img in images:
        high, low = freq_decompose(block_dct_features(np.asarray(img, np.float32)))
        hs = high.reshape(-1, high.shape[-1])
        ls = low.reshape(-1, low.shape[-1])
        if h_sum is None:
            h_sum = hs.sum(0)
            l_sum = ls.sum(0)
            h_sq = (hs**2).sum(0)
            l_sq = (ls**2).sum(0)
        else:
            h_sum += hs.sum(0)
            l_sum += ls.sum(0)
            h_sq += (hs**2).sum(0)
            l_sq += (ls**2).sum(0)
        n += hs.shape[0]
    h_mean, l_mean = h_sum / n, l_sum / n
    h_std = np.sqrt(np.maximum(h_sq / n - h_mean**2, 1e-12))
    l_std = np.sqrt(np.maximum(l_sq / n - l_mean**2, 1e-12))
    return FreqStats(h_mean, h_std, l_mean, l_std)
