"""Model-level integration of the native fused backward (interpret mode).

On TPU the model picks the folded Pallas kernels automatically; pytest runs
on CPU, so ``ssm_backend='pallas'`` forces the same kernels through the
interpreter and the full train-step gradient must match the composed
('assoc') model — every SS2D flavor the flagship uses (raster encoder, line
decoder, window/dilation guides) runs its native backward inside one real
value_and_grad.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tramba_tpu.models.tramba import TrambaV
from tramba_tpu.train.loss import deep_supervision_loss

# full tier only: big-model / parity / e2e (see pytest.ini)
pytestmark = pytest.mark.slow


def _grads(backend, x, gts):
    kw = dict(img_size=96, dims=8, enc_depths=(1, 1, 1, 1), dec_depths=(1, 1, 1, 1),
              enc_drop_path=0.0, dec_drop_path=0.0)
    model = TrambaV(ssm_backend=backend, **kw)
    variables = TrambaV(ssm_backend="assoc", **kw).init(jax.random.key(0), x)

    def loss_fn(params):
        outs = model.apply({"params": params}, x, deterministic=True)
        return deep_supervision_loss(outs, gts)

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    return float(loss), grads


def test_flagship_native_bwd_matches_composed():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 96, 96, 3)).astype(np.float32))
    gts = jnp.asarray((rng.uniform(size=(1, 96, 96, 1)) > 0.5).astype(np.float32))
    loss_k, g_k = _grads("pallas", x, gts)
    loss_c, g_c = _grads("assoc", x, gts)
    assert np.isfinite(loss_k) and abs(loss_k - loss_c) < 1e-3, (loss_k, loss_c)
    flat_k = jax.tree_util.tree_leaves_with_path(g_k)
    flat_c = {jax.tree_util.keystr(p): v for p, v in jax.tree_util.tree_leaves_with_path(g_c)}
    checked = 0
    for path, vk in flat_k:
        vc = flat_c[jax.tree_util.keystr(path)]
        np.testing.assert_allclose(np.asarray(vk), np.asarray(vc), rtol=5e-3, atol=5e-3,
                                   err_msg=jax.tree_util.keystr(path))
        checked += 1
    assert checked > 100  # the whole parameter tree was compared
