"""TRAMBA_PACK_DBC: packed paired-direction dbc matmul vs two plain matmuls.

The packed spelling (one (T,D)@(D,2C) dot, then per-direction column slices)
computes the identical per-column dot products, so on/off must agree to
float tolerance through the full fused inference paths (two-phase raster
pairs, line-pair kernel).  Interpret-mode Pallas on CPU; the on-device
verdict lives in docs/PERF.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tramba_tpu.ops.fused_ss2d as fs


def _full_inputs(K, H, D=16, R=3, seed=5):
    rng = np.random.default_rng(seed)
    L = H * H
    return [jnp.asarray(a) for a in (
        rng.normal(size=(1, L, D)).astype(np.float32) * 0.2,
        (rng.normal(size=(K, R + 2, D)) * 0.2).astype(np.float32),
        (rng.normal(size=(K, D, R)) * 0.3).astype(np.float32),
        (rng.normal(size=(K, D)) * 0.2).astype(np.float32),
        rng.normal(size=(K, D, 1)).astype(np.float32) * 0.3,
        rng.normal(size=(K, D)).astype(np.float32),
        (rng.normal(size=(D,)) * 0.1 + 1).astype(np.float32),
        (rng.normal(size=(D,)) * 0.1).astype(np.float32),
        (rng.normal(size=(D, D // 2)) * 0.2).astype(np.float32),
    )]


@pytest.mark.parametrize("kind,K,H", [("raster", 4, 8), ("line", 8, 8)])
def test_pack_dbc_matches_unpacked(monkeypatch, kind, K, H):
    args = _full_inputs(K, H)

    monkeypatch.setenv("TRAMBA_PACK_DBC", "0")
    jax.clear_caches()
    y0 = np.asarray(fs.fused_ss2d_full(*args, kind, H, H))

    monkeypatch.setenv("TRAMBA_PACK_DBC", "1")
    jax.clear_caches()
    y1 = np.asarray(fs.fused_ss2d_full(*args, kind, H, H))

    jax.clear_caches()
    np.testing.assert_allclose(y1, y0, rtol=1e-6, atol=1e-6)


def test_pack_dbc_smallmap(monkeypatch):
    from tramba_tpu.ops.fused_ss2d_small import fused_ss2d_small

    rng = np.random.default_rng(7)
    B, H, W, dm, D, R = 1, 8, 8, 16, 32, 3
    arr = lambda *s, sc=0.2: jnp.asarray((rng.normal(size=s) * sc).astype(np.float32))
    args = (jnp.asarray(rng.normal(size=(B, H * W, dm)).astype(np.float32)),
            arr(dm, sc=0.1) + 1, arr(dm, sc=0.1), arr(dm, D), arr(3, 3, 1, D, sc=0.3),
            arr(4, R + 2, D), arr(4, D, R, sc=0.3), arr(4, D),
            arr(4, D, 1, sc=0.3), arr(4, D, sc=1.0),
            arr(D, sc=0.1) + 1, arr(D, sc=0.1), arr(D, dm), H, W)

    monkeypatch.setenv("TRAMBA_PACK_DBC", "0")
    jax.clear_caches()
    y0 = np.asarray(fused_ss2d_small(*args))
    monkeypatch.setenv("TRAMBA_PACK_DBC", "1")
    jax.clear_caches()
    y1 = np.asarray(fused_ss2d_small(*args))
    jax.clear_caches()
    np.testing.assert_allclose(y1, y0, rtol=1e-6, atol=1e-6)
