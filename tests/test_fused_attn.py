"""Fused PVTv2 kernels (ops/fused_attn.py, fused_ln_dwmlp) vs composed oracles.

Runs in interpret mode on CPU (conftest forces the cpu backend); the on-device
regression lives in scripts/device_check.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tramba_tpu.ops.fused_attn import composed_sra, fused_sra
from tramba_tpu.ops.fused_mlp import composed_ln_dwmlp, fused_ln_dwmlp


def _sra_args(B=2, N=64, C=64, nh=2, Lk=16, seed=0):
    rng = np.random.default_rng(seed)
    t = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.2)
    hd = C // nh
    return (t(B, N, C), t(C) + 1.0, t(C), t(C, C), t(C), t(B, nh, Lk, hd),
            t(B, nh, Lk, hd), t(C, C), t(C))


@pytest.mark.parametrize("nh,Lk", [(1, 16), (2, 16), (4, 8)])
def test_fused_sra_matches_composed(nh, Lk):
    args = _sra_args(nh=nh, Lk=Lk)
    out = jax.jit(lambda *a: fused_sra(*a, nh, 1e-6))(*args)
    ref = composed_sra(*args, nh, 1e-6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.slow
def test_fused_sra_grad_matches_composed():
    args = _sra_args(nh=2, Lk=16)

    def loss_f(*a):
        return jnp.sum(fused_sra(*a, 2, 1e-6) ** 2)

    def loss_c(*a):
        return jnp.sum(composed_sra(*a, 2, 1e-6) ** 2)

    gf = jax.jit(jax.grad(loss_f, argnums=(0, 1, 3, 5, 7)))(*args)
    gc = jax.grad(loss_c, argnums=(0, 1, 3, 5, 7))(*args)
    for a, b in zip(gf, gc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def _dwmlp_args(B=2, H=8, W=8, D=16, Hd=128, seed=1):
    rng = np.random.default_rng(seed)
    t = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.2)
    return (t(B, H, W, D), t(D) + 1.0, t(D), t(D, Hd), t(Hd),
            t(3, 3, 1, Hd), t(Hd), t(Hd, D), t(D))


def test_fused_dwmlp_matches_composed():
    args = _dwmlp_args()
    out = jax.jit(lambda *a: fused_ln_dwmlp(*a, 1e-6))(*args)
    ref = composed_ln_dwmlp(*args, 1e-6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_dwmlp_grad_matches_composed():
    args = _dwmlp_args()
    gf = jax.jit(jax.grad(lambda *a: jnp.sum(fused_ln_dwmlp(*a, 1e-6) ** 2),
                          argnums=(0, 3, 5, 7)))(*args)
    gc = jax.grad(lambda *a: jnp.sum(composed_ln_dwmlp(*a, 1e-6) ** 2),
                  argnums=(0, 3, 5, 7))(*args)
    for a, b in zip(gf, gc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_pvt_encoder_fused_matches_composed():
    """Model-level: force_fused (interpret kernels) == composed, same tree."""
    from tramba_tpu.models.pvt import PVTv2Encoder

    cfg = dict(embed_dims=(16, 32), num_heads=(1, 2), mlp_ratios=(2, 2),
               depths=(1, 1), sr_ratios=(4, 2), drop_path_rate=0.0)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 32, 32, 3)),
                    jnp.float32)
    enc_c = PVTv2Encoder(**cfg)
    enc_f = PVTv2Encoder(**cfg, force_fused=True)
    p = enc_f.init(jax.random.key(0), x)
    pc = enc_c.init(jax.random.key(0), x)
    assert jax.tree.structure(p) == jax.tree.structure(pc)
    outs_f = enc_f.apply(p, x)
    outs_c = enc_c.apply(p, x)
    for a, b in zip(outs_f, outs_c):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


# ---------------------------------------------------------------------------
# Fused Swin window attention
# ---------------------------------------------------------------------------


def _wattn_args(B=2, H=8, W=8, C=32, nh=2, w=4, seed=3, with_mask=False):
    from tramba_tpu.models.swin import _shift_attn_mask

    rng = np.random.default_rng(seed)
    t = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.2)
    N = w * w
    mask = (jnp.asarray(_shift_attn_mask(H, W, w, w // 2))
            if with_mask else None)
    return (t(B, H, W, C), t(C) + 1.0, t(C), t(C, 3 * C), t(3 * C),
            t(nh, N, N), mask, t(C, C), t(C))


@pytest.mark.parametrize("nh,with_mask", [(1, False), (2, False), (2, True),
                                          (4, True)])
def test_fused_window_attn_matches_composed(nh, with_mask):
    from tramba_tpu.ops.fused_attn import (composed_window_attn,
                                           fused_window_attn)

    args = _wattn_args(nh=nh, with_mask=with_mask)
    out = jax.jit(lambda *a: fused_window_attn(*a, nh, 1e-5))(*args)
    ref = composed_window_attn(*args, nh, 1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_window_attn_grad_matches_composed():
    from tramba_tpu.ops.fused_attn import (composed_window_attn,
                                           fused_window_attn)

    args = _wattn_args(nh=2, with_mask=True)
    argnums = (0, 1, 3, 5, 7)  # x, ln_s, wqkv, bias, wp
    gf = jax.jit(jax.grad(lambda *a: jnp.sum(fused_window_attn(*a, 2, 1e-5) ** 2),
                          argnums=argnums))(*args)
    gc = jax.grad(lambda *a: jnp.sum(composed_window_attn(*a, 2, 1e-5) ** 2),
                  argnums=argnums)(*args)
    for a, b in zip(gf, gc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   rtol=1e-4)


def test_swin_encoder_fused_matches_composed():
    """Model-level: force_fused (interpret kernels) == composed, same tree."""
    from tramba_tpu.models.swin import SwinEncoder

    cfg = dict(img_size=32, embed_dim=32, depths=(2, 2), num_heads=(2, 4),
               window=4, drop_path_rate=0.0)
    x = jnp.asarray(np.random.default_rng(4).normal(size=(1, 32, 32, 3)),
                    jnp.float32)
    enc_c = SwinEncoder(**cfg)
    enc_f = SwinEncoder(**cfg, force_fused=True)
    p = enc_f.init(jax.random.key(0), x)
    pc = enc_c.init(jax.random.key(0), x)
    assert jax.tree.structure(p) == jax.tree.structure(pc)
    outs_f = enc_f.apply(p, x)
    outs_c = enc_c.apply(p, x)
    for a, b in zip(outs_f, outs_c):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)
