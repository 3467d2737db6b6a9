"""DCT tests: orthonormality, scipy parity, reference-module parity, block DCT."""

import sys

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.fft

from tramba_tpu.ops import dct as dctops


@pytest.mark.parametrize("n", [8, 12, 24, 48])
def test_basis_orthonormal(n):
    b = np.asarray(dctops.dct_basis(n), np.float64)
    np.testing.assert_allclose(b @ b.T, np.eye(n), atol=1e-5)


@pytest.mark.parametrize("H,W", [(8, 8), (12, 16), (24, 24)])
def test_dct2d_matches_scipy(H, W):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, H, W, 3)).astype(np.float32)
    got = np.asarray(dctops.dct2d(jnp.asarray(x)))
    want = scipy.fft.dctn(x.astype(np.float64), type=2, norm="ortho", axes=(1, 2))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_idct_round_trip():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 12, 12, 4)).astype(np.float32)
    y = dctops.idct2d(dctops.dct2d(jnp.asarray(x)))
    np.testing.assert_allclose(np.asarray(y), x, rtol=1e-4, atol=1e-5)


def test_split_high_low_quadrants():
    x = jnp.arange(1 * 8 * 8 * 1, dtype=jnp.float32).reshape(1, 8, 8, 1)
    high, low = dctops.split_high_low(x)
    assert high.shape == (1, 4, 4, 1) and low.shape == (1, 4, 4, 1)
    np.testing.assert_array_equal(np.asarray(low)[0, :, :, 0], np.asarray(x)[0, :4, :4, 0])
    np.testing.assert_array_equal(np.asarray(high)[0, :, :, 0], np.asarray(x)[0, 4:, 4:, 0])


def test_block_dct_matches_scipy():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 16, 24, 2)).astype(np.float32)
    got = np.asarray(dctops.block_dct2d(jnp.asarray(x), 8))
    want = np.zeros_like(x)
    for i in range(0, 16, 8):
        for j in range(0, 24, 8):
            want[:, i : i + 8, j : j + 8] = scipy.fft.dctn(
                x[:, i : i + 8, j : j + 8].astype(np.float64), type=2, norm="ortho", axes=(1, 2)
            )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    back = np.asarray(dctops.block_idct2d(jnp.asarray(got), 8))
    np.testing.assert_allclose(back, x, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_matches_reference_module():
    """Golden parity with the reference DCT2D torch module (CPU, read-only)."""
    import os

    if not os.path.isdir("/root/reference"):
        pytest.skip("reference not mounted")
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import torch

    from Models.DCT_2D import DCT2D as RefDCT2D

    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 6, 24, 24)).astype(np.float32)  # ref is NCHW
    ref = RefDCT2D(24, 24)
    with torch.no_grad():
        high_t, low_t = ref(torch.from_numpy(x))
    coeffs = dctops.dct2d(jnp.asarray(x.transpose(0, 2, 3, 1)))
    high, low = dctops.split_high_low(coeffs)
    np.testing.assert_allclose(
        np.asarray(high).transpose(0, 3, 1, 2), high_t.numpy(), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(low).transpose(0, 3, 1, 2), low_t.numpy(), rtol=1e-3, atol=1e-4
    )


def test_dct2d_quadrants_matches_split():
    import numpy as np
    import jax.numpy as jnp
    from tramba_tpu.ops.dct import dct2d, dct2d_quadrants, split_high_low

    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 12, 12, 5)).astype(np.float32))
    h1, l1 = split_high_low(dct2d(x))
    h2, l2 = dct2d_quadrants(x)
    assert jnp.array_equal(h1, h2) and jnp.array_equal(l1, l2)
