"""Slice-concat scan spelling (round 5) vs the masked-roll scan.

The spelling claims BIT-exactness (identical fma on updated rows, untouched
rows preserved verbatim), so these compare with assert_array_equal, not
allclose.  Whole-chunk scans (seg == T) engage the slice path for shifts
s >= 8; segmented scans (seg < T) keep the masked roll under
TRAMBA_SLICE_SCAN alone, and engage the reshaped (T//seg, seg, D) slice
spelling only under TRAMBA_SEG_SLICE_SCAN (seg % 8 == 0).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from tramba_tpu.ops.selective_scan import _scan_masked


@pytest.fixture(params=["0", "1"])
def _slice_knob(request, monkeypatch):
    monkeypatch.setenv("TRAMBA_SLICE_SCAN", request.param)
    jax.clear_caches()
    yield request.param == "1"
    jax.clear_caches()


def _inputs(T, D, seed=0):
    rng = np.random.default_rng(seed)
    a = jnp.asarray(np.exp(-np.exp(rng.normal(size=(T, D)) * 0.5 - 0.7)).astype(np.float32))
    b = jnp.asarray((rng.normal(size=(T, D)) * 0.5).astype(np.float32))
    return a, b


def _run(fn, a, b):
    """pltpu.roll has no evaluation rule outside a kernel — interpret mode."""
    T, D = a.shape

    def kern(a_ref, b_ref, ao_ref, ho_ref):
        ao, ho = fn(a_ref[...], b_ref[...])
        ao_ref[...] = ao
        ho_ref[...] = ho

    return pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((T, D), jnp.float32)] * 2,
        interpret=True,
    )(a, b)


def _oracle(a, b, seg, reverse):
    """Per-segment sequential scan in numpy (fp32, same association order is
    NOT required — only the slice-vs-roll comparison is bit-exact; vs this
    oracle we use allclose)."""
    a, b = np.asarray(a), np.asarray(b)
    T = a.shape[0]
    ao, ho = a.copy(), b.copy()
    for s0 in range(0, T, seg):
        rows = range(s0, s0 + seg) if not reverse else range(s0 + seg - 1, s0 - 1, -1)
        prev = None
        for t in rows:
            if prev is not None:
                ho[t] = b[t] + a[t] * ho[prev]
                ao[t] = a[t] * ao[prev]
            prev = t
    return ao, ho


@pytest.mark.parametrize("T", [8, 32, 64, 144, 256])
@pytest.mark.parametrize("reverse", [False, True])
def test_slice_matches_roll_bitexact(T, reverse, monkeypatch):
    a, b = _inputs(T, 16)
    outs = {}
    for knob in ("0", "1"):
        monkeypatch.setenv("TRAMBA_SLICE_SCAN", knob)
        jax.clear_caches()
        outs[knob] = _run(lambda x, y: _scan_masked(x, y, T, reverse), a, b)
    np.testing.assert_array_equal(np.asarray(outs["0"][0]), np.asarray(outs["1"][0]))
    np.testing.assert_array_equal(np.asarray(outs["0"][1]), np.asarray(outs["1"][1]))


@pytest.mark.parametrize("T,seg", [(64, 64), (96, 24), (64, 8)])
@pytest.mark.parametrize("reverse", [False, True])
def test_scan_correct_under_knob(_slice_knob, T, seg, reverse):
    a, b = _inputs(T, 8, seed=2)
    ao, ho = _run(lambda x, y: _scan_masked(x, y, seg, reverse), a, b)
    ae, he = _oracle(a, b, seg, reverse)
    np.testing.assert_allclose(np.asarray(ao), ae, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ho), he, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("T,seg", [(96, 24), (192, 96), (64, 16), (128, 8)])
@pytest.mark.parametrize("reverse", [False, True])
def test_seg_slice_matches_roll_bitexact(T, seg, reverse, monkeypatch):
    """TRAMBA_SEG_SLICE_SCAN: the reshaped segmented slice spelling is
    bit-exact vs the flat masked roll (same fma on updated rows)."""
    a, b = _inputs(T, 16, seed=3)
    outs = {}
    for knob in ("0", "1"):
        monkeypatch.setenv("TRAMBA_SEG_SLICE_SCAN", knob)
        jax.clear_caches()
        outs[knob] = _run(lambda x, y: _scan_masked(x, y, seg, reverse), a, b)
    np.testing.assert_array_equal(np.asarray(outs["0"][0]), np.asarray(outs["1"][0]))
    np.testing.assert_array_equal(np.asarray(outs["0"][1]), np.asarray(outs["1"][1]))
    ae, he = _oracle(a, b, seg, reverse)
    np.testing.assert_allclose(np.asarray(outs["1"][0]), ae, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(outs["1"][1]), he, rtol=1e-5, atol=1e-5)
