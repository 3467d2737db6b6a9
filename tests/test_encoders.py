"""Encoder + registry shape tests (tiny/realistic-small configs, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tramba_tpu.models.pvt import PVTv2Encoder
from tramba_tpu.models.registry import METHODS, build
from tramba_tpu.models.resnet import ResNetEncoder
from tramba_tpu.models.swin import SwinEncoder


@pytest.mark.slow
def test_resnet_shapes():
    m = ResNetEncoder(layers=(1, 1, 1, 1))
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = m.init(jax.random.key(0), x)
    outs = m.apply(vars_, x)
    assert [o.shape for o in outs] == [
        (1, 2, 2, 2048),
        (1, 4, 4, 1024),
        (1, 8, 8, 512),
        (1, 16, 16, 256),
        (1, 16, 16, 64),
    ]
    assert "batch_stats" in vars_


@pytest.mark.slow
def test_resnet_train_mode_updates_stats():
    m = ResNetEncoder(layers=(1, 1, 1, 1))
    x = jnp.ones((2, 32, 32, 3))
    vars_ = m.init(jax.random.key(0), x)
    _, updates = m.apply(vars_, x, False, mutable=["batch_stats"])
    assert "batch_stats" in updates


@pytest.mark.slow
def test_pvt_shapes():
    m = PVTv2Encoder(embed_dims=(8, 16, 32, 64), num_heads=(1, 2, 4, 8),
                     mlp_ratios=(2, 2, 2, 2), depths=(1, 1, 1, 1), sr_ratios=(8, 4, 2, 1))
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = m.init(jax.random.key(0), x)
    outs = m.apply(vars_, x)
    assert [o.shape for o in outs] == [
        (1, 2, 2, 64),
        (1, 4, 4, 32),
        (1, 8, 8, 16),
        (1, 16, 16, 8),
    ]


@pytest.mark.slow
def test_swin_shapes():
    m = SwinEncoder(img_size=64, embed_dim=8, depths=(1, 1, 2, 1), num_heads=(1, 2, 4, 8), window=4)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = m.init(jax.random.key(0), x)
    outs = m.apply(vars_, x)
    # stage inputs: patch-embed out, then post-merge maps
    assert [o.shape for o in outs] == [
        (1, 16, 16, 8),
        (1, 8, 8, 16),
        (1, 4, 4, 32),
        (1, 2, 2, 64),
    ]


@pytest.mark.slow
def test_swin_shifted_window_mask_changes_output():
    m = SwinEncoder(img_size=32, embed_dim=8, depths=(2, 1, 1, 1), num_heads=(1, 1, 1, 1), window=2)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 32, 32, 3)).astype(np.float32))
    vars_ = m.init(jax.random.key(0), x)
    outs = m.apply(vars_, x)
    assert np.isfinite(np.asarray(outs[-1])).all()


@pytest.mark.parametrize("name", METHODS)
def test_registry_builds(name):
    m = build(name, img_size=384)
    assert m is not None


def test_registry_unknown_raises():
    with pytest.raises(ValueError):
        build("Tramba-X-TSOD")
