"""Whole-map SS2D megakernel vs composed oracle: forward + gradient parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tramba_tpu.ops.fused_ss2d_small import (
    composed_ss2d_small,
    fused_ss2d_small,
    smallmap_ok,
)


def _inputs(B=2, H=8, W=8, dm=16, D=32, R=3, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    L = H * W
    arr = lambda *s, sc=0.2: jnp.asarray((rng.normal(size=s) * sc).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(B, L, dm)).astype(np.float32)).astype(dtype)
    return dict(
        x=x,
        ln1_s=arr(dm, sc=0.1) + 1, ln1_b=arr(dm, sc=0.1),
        w_in=arr(dm, D), conv_k=arr(3, 3, 1, D, sc=0.3),
        x_proj_w=arr(4, R + 2, D), dt_w=arr(4, D, R, sc=0.3),
        dt_b=arr(4, D), A_logs=arr(4, D, 1, sc=0.3), Ds=arr(4, D, sc=1.0),
        ln_scale=arr(D, sc=0.1) + 1, ln_bias=arr(D, sc=0.1),
        w_out=arr(D, dm),
    ), H, W


def _run(f, kw, H, W):
    return f(kw["x"], (kw["ln1_s"], kw["ln1_b"]), kw["w_in"], kw["conv_k"],
             kw["x_proj_w"], kw["dt_w"], kw["dt_b"], kw["A_logs"], kw["Ds"],
             kw["ln_scale"], kw["ln_bias"], kw["w_out"], H, W) \
        if f is composed_ss2d_small else \
        f(kw["x"], kw["ln1_s"], kw["ln1_b"], kw["w_in"], kw["conv_k"],
          kw["x_proj_w"], kw["dt_w"], kw["dt_b"], kw["A_logs"], kw["Ds"],
          kw["ln_scale"], kw["ln_bias"], kw["w_out"], H, W)


@pytest.mark.parametrize("H,W", [(8, 8), (12, 8)])
@pytest.mark.slow
def test_small_matches_composed(H, W):
    kw, _, _ = _inputs(H=H, W=W)
    y_f = _run(fused_ss2d_small, kw, H, W)  # interpret-mode pallas on CPU
    y_c = _run(composed_ss2d_small, kw, H, W)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_c), rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_small_chunked_D():
    """D > 256 exercises the in-kernel D-chunked scan + streaming LN."""
    kw, H, W = _inputs(B=1, H=8, W=8, dm=16, D=512, seed=1)
    y_f = _run(fused_ss2d_small, kw, H, W)
    y_c = _run(composed_ss2d_small, kw, H, W)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_c), rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_small_bf16():
    kw, H, W = _inputs(seed=2, dtype=jnp.bfloat16)
    y_f = np.asarray(_run(fused_ss2d_small, kw, H, W).astype(np.float32))
    y_c = np.asarray(_run(composed_ss2d_small, kw, H, W).astype(np.float32))
    np.testing.assert_allclose(y_f, y_c, rtol=5e-2, atol=5e-2)


@pytest.mark.slow
def test_small_grad():
    kw, H, W = _inputs(B=1, H=8, W=8, dm=8, D=16, seed=3)
    names = list(kw)

    def loss_f(*a):
        d = dict(zip(names, a))
        return jnp.sum(jnp.tanh(_run(fused_ss2d_small, d, H, W)))

    def loss_c(*a):
        d = dict(zip(names, a))
        return jnp.sum(jnp.tanh(_run(composed_ss2d_small, d, H, W)))

    args = tuple(kw[n] for n in names)
    g_f = jax.grad(loss_f, argnums=tuple(range(len(args))))(*args)
    g_c = jax.grad(loss_c, argnums=tuple(range(len(args))))(*args)
    for n, a, b in zip(names, g_f, g_c):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=2e-4, err_msg=n)


def test_gate():
    assert smallmap_ok(24, 24, 512, 1024, jnp.bfloat16)
    assert smallmap_ok(12, 12, 1024, 2048, jnp.bfloat16)
    assert not smallmap_ok(96, 96, 128, 256, jnp.bfloat16)  # large maps -> chunked path
    assert not smallmap_ok(48, 48, 256, 512, jnp.bfloat16)
