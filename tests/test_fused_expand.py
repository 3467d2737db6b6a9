"""Fused expand (Dense + x2 pixel shuffle + LN) vs composed path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tramba_tpu.ops.fused_expand import composed_expand2, fused_expand2


def _inputs(B=2, H=6, W=8, C=16, factor=2, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    co = factor * C // 4
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32)).astype(dtype)
    w = jnp.asarray((rng.normal(size=(C, factor * C)) * 0.2).astype(np.float32))
    s = jnp.asarray((rng.normal(size=(co,)) * 0.1 + 1).astype(np.float32))
    b = jnp.asarray((rng.normal(size=(co,)) * 0.1).astype(np.float32))
    return x, w, s, b


@pytest.mark.parametrize("factor", [2, 4])
def test_expand_matches_composed(factor):
    args = _inputs(factor=factor)
    y_f = fused_expand2(*args)  # interpret-mode pallas on CPU
    y_c = composed_expand2(*args)
    assert y_f.shape == y_c.shape
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_c), rtol=1e-5, atol=1e-5)


def test_expand_grad():
    args = _inputs(B=1, H=4, W=8, C=8, seed=1)
    g_f = jax.grad(lambda *a: jnp.sum(jnp.tanh(fused_expand2(*a))), argnums=(0, 1, 2, 3))(*args)
    g_c = jax.grad(lambda *a: jnp.sum(jnp.tanh(composed_expand2(*a))), argnums=(0, 1, 2, 3))(*args)
    for a, b in zip(g_f, g_c):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_layer_tree_parity():
    """PatchExpand / FreqExpand2D param trees are identical in both paths
    (the fused path only activates on TPU; tree equality is what matters)."""
    from tramba_tpu.nn.layers import FreqExpand2D, PatchExpand

    x = jnp.zeros((1, 4, 8, 16))
    for cls in (PatchExpand, FreqExpand2D):
        p = cls().init(jax.random.key(0), x)
        leaves = {"/".join(k.key for k in path): v.shape
                  for path, v in jax.tree_util.tree_flatten_with_path(p)[0]}
        assert any("expand/kernel" in k for k in leaves), leaves
        assert any("norm/scale" in k for k in leaves), leaves


def _head_inputs(B=2, H=8, W=8, C=128, seed=3):
    rng = np.random.default_rng(seed)
    t = lambda *s: jnp.asarray((rng.normal(size=s) * 0.2).astype(np.float32))
    return (t(B, H, W, C), t(C, 16 * C), t(C) + 1.0, t(C), t(C), t(1))


def test_final_head_matches_composed():
    from tramba_tpu.ops.fused_expand import composed_final_head, fused_final_head

    args = _head_inputs()
    y_f = fused_final_head(*args)  # interpret-mode pallas on CPU
    y_c = composed_final_head(*args)
    assert y_f.shape == (2, 8, 8, 16)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_c), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_final_head_grad():
    from tramba_tpu.ops.fused_expand import composed_final_head, fused_final_head

    args = _head_inputs(B=1, seed=4)
    g_f = jax.grad(lambda *a: jnp.sum(jnp.tanh(fused_final_head(*a))),
                   argnums=tuple(range(6)))(*args)
    g_c = jax.grad(lambda *a: jnp.sum(jnp.tanh(composed_final_head(*a))),
                   argnums=tuple(range(6)))(*args)
    for i, (a, b) in enumerate(zip(g_f, g_c)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5, err_msg=f"grad {i}")


def test_final_head_oracle_matches_model_tail():
    """The fused head's composed oracle == the model's literal composed tail
    (FinalPatchExpandX4 pre_shuffle + 1x1 conv), fp32."""
    from tramba_tpu.ops.fused_expand import composed_final_head
    from tramba_tpu.nn.layers import FinalPatchExpandX4

    x, w1, lns, lnb, wh, bh = _head_inputs(seed=5)
    B, H, W, C = x.shape
    mod = FinalPatchExpandX4()
    params = {"params": {"expand": {"kernel": w1},
                         "norm": {"scale": lns, "bias": lnb}}}
    x5 = mod.apply(params, x, pre_shuffle=True)
    seg = x5 @ wh + bh  # 1x1 conv == per-pixel dot
    got = composed_final_head(x, w1, lns, lnb, wh, bh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(seg), rtol=1e-4,
                               atol=1e-5)


def test_model_tail_fused_matches_composed():
    """One-stage TrambaDecoder == the final-stage head: backend='pallas'
    (fused, interpret) vs composed, same params, identical trees."""
    from tramba_tpu.models.tramba import TrambaDecoder

    rng = np.random.default_rng(6)
    x = jnp.asarray((rng.normal(size=(1, 8, 8, 128)) * 0.2).astype(np.float32))
    skips = [x, x]
    kw = dict(features_per_stage=[128], img_size=32)
    dec_f = TrambaDecoder(ssm_backend="pallas", **kw)
    dec_c = TrambaDecoder(ssm_backend=None, **kw)
    p_f = dec_f.init(jax.random.key(0), skips)
    p_c = dec_c.init(jax.random.key(0), skips)
    assert jax.tree_util.tree_structure(p_f) == jax.tree_util.tree_structure(p_c)
    for (kf, vf), (kc, vc) in zip(
            jax.tree_util.tree_flatten_with_path(p_f)[0],
            jax.tree_util.tree_flatten_with_path(p_c)[0]):
        assert vf.shape == vc.shape, (kf, vf.shape, vc.shape)
        np.testing.assert_allclose(np.asarray(vf), np.asarray(vc), atol=0,
                                   err_msg=str(kf))
    (y_f,), (y_c,) = dec_f.apply(p_f, skips), dec_c.apply(p_f, skips)
    assert y_f.shape == (1, 32, 32, 1)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_c), rtol=1e-4,
                               atol=1e-5)
