"""Fused SS2D prologue (LN + in_proj + dw3x3 + SiLU) vs composed XLA path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tramba_tpu.ops.fused_prologue import (
    _prologue_pallas,
    composed_prologue,
    fused_prologue,
)


def _inputs(B=2, H=12, W=8, Dm=16, D=32, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(B, H, W, Dm)).astype(np.float32)
    s = (rng.normal(size=(Dm,)) * 0.1 + 1).astype(np.float32)
    b = (rng.normal(size=(Dm,)) * 0.1).astype(np.float32)
    w = (rng.normal(size=(Dm, D)) * 0.2).astype(np.float32)
    k = (rng.normal(size=(3, 3, 1, D)) * 0.3).astype(np.float32)
    out = [jnp.asarray(a) for a in (x, s, b, w, k)]
    out[0] = out[0].astype(dtype)
    return out


def test_prologue_matches_composed():
    args = _inputs()
    y_f = fused_prologue(*args)  # interpret-mode pallas on CPU
    y_c = composed_prologue(*args)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_c), rtol=1e-5, atol=1e-5)


def test_prologue_no_ln():
    x, _, _, w, k = _inputs(seed=1)
    y_f = fused_prologue(x, None, None, w, k)
    y_c = composed_prologue(x, None, None, w, k)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_c), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("row_chunk", [2, 4, 6, 12])
def test_prologue_halo_chunking(row_chunk):
    x, s, b, w, k = _inputs(B=1, H=12, W=8, Dm=8, D=16, seed=2)
    y_f = _prologue_pallas(x, s, b, w, k, interpret=True, row_chunk=row_chunk)
    y_c = composed_prologue(x, s, b, w, k)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_c), rtol=1e-5, atol=1e-5)


def test_prologue_inner_chunking():
    x, s, b, w, k = _inputs(B=1, H=8, W=8, Dm=8, D=64, seed=5)
    y_f = _prologue_pallas(x, s, b, w, k, interpret=True, inner_chunk=16)
    y_c = composed_prologue(x, s, b, w, k)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_c), rtol=1e-5, atol=1e-5)


def test_prologue_grad_matches_composed():
    args = _inputs(B=1, H=8, W=8, Dm=8, D=16, seed=3)

    def loss_f(*a):
        return jnp.sum(jnp.tanh(fused_prologue(*a)))

    def loss_c(*a):
        return jnp.sum(jnp.tanh(composed_prologue(*a)))

    g_f = jax.grad(loss_f, argnums=tuple(range(5)))(*args)
    g_c = jax.grad(loss_c, argnums=tuple(range(5)))(*args)
    for a, b in zip(g_f, g_c):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_ss2d_prologue_path_matches_composed():
    """SS2D with backend='pallas' (fused prologue, interpret) == 'assoc'."""
    from tramba_tpu.nn.ssm import SS2D

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 64)).astype(np.float32))
    ln = (jnp.ones((64,)), jnp.zeros((64,)))
    m_f = SS2D(d_model=64, backend="pallas")
    m_c = SS2D(d_model=64, backend="assoc")
    params = m_f.init(jax.random.key(0), x, ln=ln)
    pc = m_c.init(jax.random.key(0), x, ln=ln)
    assert jax.tree.structure(params) == jax.tree.structure(pc)
    y_f = m_f.apply(params, x, ln=ln)
    y_c = m_c.apply(params, x, ln=ln)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_c), rtol=5e-4, atol=5e-4)
