"""Selective-scan correctness: sequential oracle, backend parity, VJP checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tramba_tpu.ops import selective_scan as ss


def _sequential_oracle(u, dt, A, Bc, Cc, D, dt_bias):
    """Literal per-step recurrence in float64 (SURVEY.md §2.6 semantics)."""
    u, dt, A, Bc, Cc, D, dt_bias = (np.asarray(x, np.float64) for x in (u, dt, A, Bc, Cc, D, dt_bias))
    B, K, L, Dch = u.shape
    N = A.shape[-1]
    y = np.zeros_like(u)
    for b in range(B):
        for k in range(K):
            h = np.zeros((Dch, N))
            for t in range(L):
                delta = np.logaddexp(0.0, dt[b, k, t] + dt_bias[k])  # softplus
                a = np.exp(delta[:, None] * A[k])
                h = a * h + (delta * u[b, k, t])[:, None] * Bc[b, k, t][None, :]
                y[b, k, t] = h @ Cc[b, k, t] + D[k] * u[b, k, t]
    return y


def _rand_inputs(B=2, K=2, L=24, D=8, N=1, seed=0):
    rng = np.random.default_rng(seed)
    u = rng.normal(size=(B, K, L, D)).astype(np.float32)
    dt = rng.normal(size=(B, K, L, D)).astype(np.float32) * 0.5
    A = -np.exp(rng.normal(size=(K, D, N)).astype(np.float32) * 0.3)
    Bc = rng.normal(size=(B, K, L, N)).astype(np.float32)
    Cc = rng.normal(size=(B, K, L, N)).astype(np.float32)
    Dp = rng.normal(size=(K, D)).astype(np.float32)
    bias = rng.normal(size=(K, D)).astype(np.float32) * 0.2
    return u, dt, A, Bc, Cc, Dp, bias


@pytest.mark.parametrize("backend", ["assoc", "pallas"])
@pytest.mark.parametrize("N", [1, 2])
def test_matches_sequential_oracle(backend, N):
    args = _rand_inputs(N=N)
    y = ss.selective_scan(*[jnp.asarray(x) for x in args], backend=backend)
    want = _sequential_oracle(*args)
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_pallas_matches_assoc_long_sequence():
    # L spans two kernel chunks with a ragged tail; C spans two lane blocks (ragged)
    args = _rand_inputs(B=1, K=1, L=300, D=160, seed=3)
    y_p = ss.selective_scan(*[jnp.asarray(x) for x in args], backend='pallas')
    y_a = ss.selective_scan(*[jnp.asarray(x) for x in args], backend="assoc")
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_a), rtol=1e-5, atol=1e-5)


def test_linear_scan_simple():
    a = jnp.full((1, 5, 4), 0.5)
    b = jnp.ones((1, 5, 4))
    h = ss.linear_scan(a, b, "assoc")
    want = np.array([1.0, 1.5, 1.75, 1.875, 1.9375])
    np.testing.assert_allclose(np.asarray(h)[0, :, 0], want, rtol=1e-6)
    h2 = ss.linear_scan(a, b, 'pallas')
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h), rtol=1e-6)


@pytest.mark.parametrize("backend", ["assoc", "pallas"])
@pytest.mark.slow
def test_vjp_matches_undecorated_autodiff(backend):
    """custom_vjp (reversed-scan adjoint) == autodiff through associative_scan."""
    args = [jnp.asarray(x) for x in _rand_inputs(B=1, K=1, L=16, D=4, seed=5)]

    def loss_custom(u, dt, Bc, Cc):
        y = ss.selective_scan(u, dt, args[2], Bc, Cc, args[5], args[6], backend=backend)
        return jnp.sum(jnp.sin(y))

    def loss_oracle(u, dt, Bc, Cc):
        dtf = dt + args[6][None, :, None, :]
        delta = jax.nn.softplus(dtf)
        a = jnp.exp(delta * args[2][None, :, None, :, 0])
        b = delta * u * Bc
        h = ss._linear_scan_assoc(a, b)
        y = h * Cc + u * args[5][None, :, None, :]
        return jnp.sum(jnp.sin(y))

    g_c = jax.grad(loss_custom, argnums=(0, 1, 2, 3))(args[0], args[1], args[3], args[4])
    g_o = jax.grad(loss_oracle, argnums=(0, 1, 2, 3))(args[0], args[1], args[3], args[4])
    for gc, go in zip(g_c, g_o):
        np.testing.assert_allclose(np.asarray(gc), np.asarray(go), rtol=2e-4, atol=2e-4)


def test_grad_of_A_D_bias_flow():
    args = [jnp.asarray(x) for x in _rand_inputs(B=1, K=1, L=8, D=4, seed=7)]

    def loss(A, Dp, bias):
        return jnp.sum(ss.selective_scan(args[0], args[1], A, args[3], args[4], Dp, bias) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2))(args[2], args[5], args[6])
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0
