"""MXU-chunked scan (selective_scan.scan_rec_log) vs the masked-roll scan.

The MXU spelling only engages at lane-aligned shapes (D % 128 == 0), which
the other tests' tiny widths never hit — these run it explicitly, plus one
kernel-level check through the smallmap megakernel at D=128.
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tramba_tpu.ops.selective_scan import _scan_masked, _mxu_scan_ok, _scan_mxu_log


@pytest.fixture(autouse=True)
def _mxu_on(monkeypatch):
    """The MXU spelling is a measured perf negative kept behind a
    default-off knob; these tests force it on (and clear trace caches so
    the knob is re-read) to keep its numerics honest."""
    monkeypatch.setenv("TRAMBA_MXU_SCAN", "1")
    jax.clear_caches()
    yield
    jax.clear_caches()


def _inputs(T, D, seed=0, scale=0.5):
    rng = np.random.default_rng(seed)
    la = jnp.asarray((-np.exp(rng.normal(size=(T, D)) * scale - 0.7)).astype(np.float32))
    b = jnp.asarray((rng.normal(size=(T, D)) * 0.5).astype(np.float32))
    return la, b


def _run(fn, la, b):
    """Run a (la, b) -> (a, h) scan inside an interpret-mode pallas kernel —
    pltpu.roll has no evaluation rule outside a kernel."""
    T, D = la.shape

    def kern(la_ref, b_ref, a_ref, h_ref):
        a, h = fn(la_ref[...], b_ref[...])
        a_ref[...] = a
        h_ref[...] = h

    return pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((T, D), jnp.float32)] * 2,
        interpret=True,
    )(la, b)


@pytest.mark.parametrize("T,seg", [(64, 64), (64, 8), (96, 24), (256, 256)])
@pytest.mark.parametrize("reverse", [False, True])
def test_matches_roll(T, seg, reverse):
    la, b = _inputs(T, 128)
    assert _mxu_scan_ok(T, 128, seg)
    a_m, h_m = _run(lambda l, v: _scan_mxu_log(l, v, seg, reverse), la, b)
    a_r, h_r = _run(lambda l, v: _scan_masked(jnp.exp(l), v, seg, reverse), la, b)
    np.testing.assert_allclose(np.asarray(a_m), np.asarray(a_r), atol=2e-6, rtol=2e-6)
    np.testing.assert_allclose(np.asarray(h_m), np.asarray(h_r), atol=5e-6, rtol=2e-5)


def test_deep_decay_clamp():
    """la below the -10 clamp: both paths flush history to ~0; h must agree
    to the flush tolerance (4.5e-5 * |b|) without inf/nan."""
    la, b = _inputs(64, 128, seed=1)
    la = la * 60.0  # mean la ~ -30: far past the clamp
    a_m, h_m = _run(lambda l, v: _scan_mxu_log(l, v, 64, False), la, b)
    a_r, h_r = _run(lambda l, v: _scan_masked(jnp.exp(l), v, 64, False), la, b)
    assert np.isfinite(np.asarray(h_m)).all()
    np.testing.assert_allclose(np.asarray(h_m), np.asarray(h_r), atol=2e-4)
    np.testing.assert_allclose(np.asarray(a_m), np.asarray(a_r), atol=2e-4)


def test_gate():
    assert _mxu_scan_ok(64, 128, 64)       # knob forced on by the fixture
    assert not _mxu_scan_ok(60, 128, 60)   # T % 8
    assert not _mxu_scan_ok(64, 96, 64)    # D % 128
    assert not _mxu_scan_ok(196, 128, 14)  # seg % 8 (224px SOD lines)
    os.environ["TRAMBA_MXU_SCAN"] = "0"
    try:
        assert not _mxu_scan_ok(64, 128, 64)  # default-off knob honored
    finally:
        os.environ["TRAMBA_MXU_SCAN"] = "1"


@pytest.mark.slow
def test_smallmap_kernel_mxu_path():
    """The megakernel at D=128 (MXU-eligible) vs its composed oracle, fwd +
    grad — exercises scan_rec_log inside a real kernel in interpret mode."""
    from tramba_tpu.ops.fused_ss2d_small import composed_ss2d_small, fused_ss2d_small

    rng = np.random.default_rng(3)
    H = W = 8
    dm, D = 32, 128
    arr = lambda *s, sc=0.2: jnp.asarray((rng.normal(size=s) * sc).astype(np.float32))
    kw = dict(
        x=jnp.asarray(rng.normal(size=(1, H * W, dm)).astype(np.float32)),
        ln1_s=arr(dm, sc=0.1) + 1, ln1_b=arr(dm, sc=0.1),
        w_in=arr(dm, D), conv_k=arr(3, 3, 1, D, sc=0.3),
        x_proj_w=arr(4, 5, D), dt_w=arr(4, D, 3, sc=0.3),
        dt_b=arr(4, D), A_logs=arr(4, D, 1, sc=0.3), Ds=arr(4, D, sc=1.0),
        ln_scale=arr(D, sc=0.1) + 1, ln_bias=arr(D, sc=0.1), w_out=arr(D, dm),
    )
    names = list(kw)

    def run_f(*a):
        d = dict(zip(names, a))
        return fused_ss2d_small(d["x"], d["ln1_s"], d["ln1_b"], d["w_in"],
                                d["conv_k"], d["x_proj_w"], d["dt_w"], d["dt_b"],
                                d["A_logs"], d["Ds"], d["ln_scale"], d["ln_bias"],
                                d["w_out"], H, W)

    def run_c(*a):
        d = dict(zip(names, a))
        return composed_ss2d_small(d["x"], (d["ln1_s"], d["ln1_b"]), d["w_in"],
                                   d["conv_k"], d["x_proj_w"], d["dt_w"], d["dt_b"],
                                   d["A_logs"], d["Ds"], d["ln_scale"], d["ln_bias"],
                                   d["w_out"], H, W)

    args = tuple(kw[n] for n in names)
    y_f, y_c = run_f(*args), run_c(*args)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_c), rtol=2e-4, atol=2e-4)
    g_f = jax.grad(lambda *a: jnp.sum(jnp.tanh(run_f(*a))), argnums=(0, 5, 8))(*args)
    g_c = jax.grad(lambda *a: jnp.sum(jnp.tanh(run_c(*a))), argnums=(0, 5, 8))(*args)
    for n, a, b in zip(("dx", "dwx", "dAlogs"), g_f, g_c):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=2e-4, err_msg=n)
