"""Analytic FLOP counter (utils/profiling.analytic_model_flops)."""

import flax.linen as nn
import jax
import jax.numpy as jnp

from tramba_tpu.ops.selective_scan import linear_scan
from tramba_tpu.utils.profiling import analytic_model_flops


def test_dot_general_flops():
    r = analytic_model_flops(lambda a, b: a @ b, jnp.ones((64, 32)),
                             jnp.ones((32, 16)))
    assert r["matmul_conv_flops"] == 2 * 64 * 32 * 16
    assert r["scan_handle_flops"] == 0


def test_conv_flops_grouped():
    conv = nn.Conv(8, (3, 3), padding=1)
    x = jnp.ones((2, 8, 8, 4))
    p = conv.init(jax.random.key(0), x)
    r = analytic_model_flops(lambda p, x: conv.apply(p, x), p, x)
    assert r["matmul_conv_flops"] == 2 * 2 * 8 * 8 * 8 * 9 * 4

    dwc = nn.Conv(8, (3, 3), padding=1, feature_group_count=8)
    x = jnp.ones((1, 8, 8, 8))
    p = dwc.init(jax.random.key(1), x)
    r = analytic_model_flops(lambda p, x: dwc.apply(p, x), p, x)
    assert r["matmul_conv_flops"] == 2 * 1 * 8 * 8 * 8 * 9


def test_scan_handle_flops():
    """The reference's 9-flops/element selective-scan model (csms6s.py:772)."""
    a = jnp.ones((2, 4, 64, 16))
    r = analytic_model_flops(lambda a, b: linear_scan(a, b, "seq"), a, a)
    assert r["scan_handle_flops"] == 9 * 2 * 4 * 64 * 16


def test_model_trace_composes():
    """Composed (seq-backend) flagship traces with no Pallas custom calls and
    a positive count for both buckets."""
    from tramba_tpu.models.tramba import TrambaV

    m = TrambaV(img_size=64, dims=16, enc_depths=(1, 1, 1, 1),
                dec_depths=(1, 1, 1, 1), ssm_backend="seq")
    x = jnp.zeros((1, 64, 64, 3))
    p = m.init(jax.random.key(0), x)
    r = analytic_model_flops(lambda p, a: m.apply(p, a)[-1], p, x)
    assert r["matmul_conv_flops"] > 0
    assert r["scan_handle_flops"] > 0
