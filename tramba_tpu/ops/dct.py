"""2-D DCT as MXU matmuls.

Replaces the reference's ``Models/DCT_2D.py`` (dense cosine-basis loops,
DCT_2D.py:37-45/61-69) and the 8x8 block-DCT of the frequency data path
(``data/dct.py:43-53``).  The orthonormal DCT-II basis is precomputed in
numpy at trace time; the transform is two einsums — exactly the shape the
MXU wants — instead of per-row elementwise reductions.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ["dct_basis", "dct2d", "dct2d_quadrants", "idct2d", "split_high_low",
           "block_dct2d", "block_idct2d"]


@functools.lru_cache(maxsize=None)
def _basis_np(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis: B[v, j] = cos(pi*(0.5+j)*v/n)/sqrt(n) (*sqrt2, v>0).

    Matches DCT_2D.py:37-45 elementwise.
    """
    j = np.arange(n)[None, :]
    v = np.arange(n)[:, None]
    b = np.cos(np.pi * (0.5 + j) * v / n) / np.sqrt(n)
    b[1:] *= np.sqrt(2.0)
    return b.astype(np.float32)


def dct_basis(n: int) -> jnp.ndarray:
    return jnp.asarray(_basis_np(n))


def dct2d(x: jnp.ndarray) -> jnp.ndarray:
    """Full-map orthonormal 2-D DCT-II of NHWC input, over the H and W axes."""
    B, H, W, C = x.shape
    bw = dct_basis(W).astype(x.dtype)
    bh = dct_basis(H).astype(x.dtype)
    y = jnp.einsum("bhwc,vw->bhvc", x, bw)
    y = jnp.einsum("bhvc,kh->bkvc", y, bh)
    return y


def idct2d(y: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`dct2d` (orthonormal basis => transpose)."""
    B, H, W, C = y.shape
    bw = dct_basis(W).astype(y.dtype)
    bh = dct_basis(H).astype(y.dtype)
    x = jnp.einsum("bkvc,kh->bhvc", y, bh)
    x = jnp.einsum("bhvc,vw->bhwc", x, bw)
    return x


def dct2d_quadrants(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(high, low) DFVSS quadrants of the 2-D DCT, computed directly.

    Bit-identical to ``split_high_low(dct2d(x))`` (same contractions in the
    same order, restricted to the needed basis rows) but does HALF the DCT
    FLOPs — the two discarded off-diagonal quadrants are never computed —
    and the quadrant slice copies disappear.
    """
    B, H, W, C = x.shape
    bw = dct_basis(W).astype(x.dtype)
    bh = dct_basis(H).astype(x.dtype)
    ylo = jnp.einsum("bhwc,vw->bhvc", x, bw[: W // 2])
    low = jnp.einsum("bhvc,kh->bkvc", ylo, bh[: H // 2])
    yhi = jnp.einsum("bhwc,vw->bhvc", x, bw[W // 2 :])
    high = jnp.einsum("bhvc,kh->bkvc", yhi, bh[H // 2 :])
    return high, low


def split_high_low(coeffs: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Quadrant split at half resolution (DCT_2D.py:20-29): returns (high, low).

    low = top-left quadrant (low spatial frequencies), high = bottom-right.
    """
    H, W = coeffs.shape[1], coeffs.shape[2]
    low = coeffs[:, : H // 2, : W // 2, :]
    high = coeffs[:, H // 2 :, W // 2 :, :]
    return high, low


def block_dct2d(x: jnp.ndarray, block: int = 8) -> jnp.ndarray:
    """Per-block 2-D DCT (JPEG-style), NHWC -> NHWC, H/W multiples of ``block``."""
    B, H, W, C = x.shape
    b = dct_basis(block).astype(x.dtype)
    xb = x.reshape(B, H // block, block, W // block, block, C)
    yb = jnp.einsum("bipjqc,vq->bipjvc", xb, b)
    yb = jnp.einsum("bipjvc,kp->bikjvc", yb, b)
    return yb.reshape(B, H, W, C)


def block_idct2d(y: jnp.ndarray, block: int = 8) -> jnp.ndarray:
    B, H, W, C = y.shape
    b = dct_basis(block).astype(y.dtype)
    yb = y.reshape(B, H // block, block, W // block, block, C)
    xb = jnp.einsum("bikjvc,kp->bipjvc", yb, b)
    xb = jnp.einsum("bipjvc,vq->bipjqc", xb, b)
    return xb.reshape(B, H, W, C)
