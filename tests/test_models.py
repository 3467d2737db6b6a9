"""Model assembly shape/grad smoke tests (tiny configs, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tramba_tpu.models.tramba import TrambaDecoder, TrambaV, window_for_resolution
from tramba_tpu.models.vssm_encoder import VSSMEncoder

# full tier only: big-model / parity / e2e (see pytest.ini)
pytestmark = pytest.mark.slow


def test_window_lookup():
    assert [window_for_resolution(r) for r in (12, 24, 48, 96)] == [4, 8, 12, 16]


def test_vssm_encoder_shapes():
    m = VSSMEncoder(depths=(1, 1, 1, 1), dims=16, ssm_backend="assoc")
    x = jnp.zeros((1, 64, 64, 3))
    params = m.init(jax.random.key(0), x)
    skips = m.apply(params, x)
    shapes = [s.shape for s in skips]
    assert shapes == [
        (1, 64, 64, 3),
        (1, 16, 16, 16),
        (1, 8, 8, 32),
        (1, 4, 4, 64),
        (1, 2, 2, 128),
    ]


@pytest.fixture(scope="module")
def tiny_tramba():
    m = TrambaV(img_size=64, dims=16, enc_depths=(1, 1, 1, 1), dec_depths=(1, 1, 1, 1),
                ssm_backend="assoc")
    x = jnp.zeros((1, 64, 64, 3))
    params = m.init(jax.random.key(0), x)
    return m, params


def test_trambav_deep_supervision_shapes(tiny_tramba):
    m, params = tiny_tramba
    x = jnp.ones((2, 64, 64, 3))
    outs = m.apply(params, x)
    assert [o.shape for o in outs] == [
        (2, 4, 4, 1),
        (2, 8, 8, 1),
        (2, 16, 16, 1),
        (2, 64, 64, 1),
    ]
    for o in outs:
        assert np.isfinite(np.asarray(o)).all()


def test_trambav_grad_flows(tiny_tramba):
    m, params = tiny_tramba
    x = jnp.ones((1, 64, 64, 3))

    def loss(p):
        outs = m.apply(p, x)
        return sum(jnp.mean(o**2) for o in outs)

    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    nonzero = sum(float(jnp.abs(l).sum()) > 0 for l in leaves)
    assert nonzero > len(leaves) * 0.9


def test_trambav_train_mode_droppath(tiny_tramba):
    m, params = tiny_tramba
    x = jnp.ones((2, 64, 64, 3))
    outs = m.apply(params, x, deterministic=False, rngs={"dropout": jax.random.key(1)})
    assert len(outs) == 4


def test_decoder_resnet_style_three_stages():
    dec = TrambaDecoder(features_per_stage=[32, 64, 128], depths=(1, 1, 1), img_size=64,
                        ssm_backend="assoc")
    skips = [
        jnp.zeros((1, 64, 64, 3)),
        jnp.zeros((1, 16, 16, 32)),
        jnp.zeros((1, 8, 8, 64)),
        jnp.zeros((1, 4, 4, 128)),
    ]
    params = dec.init(jax.random.key(0), skips)
    outs = dec.apply(params, skips)
    assert [o.shape for o in outs] == [(1, 8, 8, 1), (1, 16, 16, 1), (1, 64, 64, 1)]
