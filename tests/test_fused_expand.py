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
