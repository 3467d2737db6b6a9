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

from tramba_tpu.ops.selective_scan import (_scan_masked, scan_rec_log_carry,
                                           scan_rec_log_carry2)


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


def _run_h_only(fn, a, b):
    """Runner for need_a=False paths (the scan returns (None, h))."""
    T, D = a.shape

    def kern(a_ref, b_ref, ho_ref):
        _, ho = fn(a_ref[...], b_ref[...])
        ho_ref[...] = ho

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((T, D), jnp.float32),
        interpret=True,
    )(a, b)


@pytest.mark.parametrize("T", [8, 64, 144, 576])
@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("slice_knob", ["0", "1"])
def test_suffix_a_matches_full(T, reverse, slice_knob, monkeypatch):
    """need_a=False (suffix-view decay updates / last-pass skip) computes the
    SAME fma sequence for h as the full-a scan; dropping the dead a-updates
    can still flip XLA/Mosaic fusion decisions on shared subexpressions, so
    the comparison allows 1-ulp drift (observed: 3e-8 on 4/128 elements at
    T=8), not exact bits."""
    monkeypatch.setenv("TRAMBA_SLICE_SCAN", slice_knob)
    a, b = _inputs(T, 16, seed=4)
    outs = {}
    for knob in ("0", "1"):
        monkeypatch.setenv("TRAMBA_SUFFIX_A", knob)
        jax.clear_caches()
        outs[knob] = _run_h_only(
            lambda x, y: _scan_masked(x, y, T, reverse, need_a=False), a, b)
    jax.clear_caches()
    full_a, full_h = _run(lambda x, y: _scan_masked(x, y, T, reverse), a, b)
    fh = np.asarray(full_h)
    np.testing.assert_allclose(np.asarray(outs["0"]), fh, rtol=3e-7, atol=1e-7)
    np.testing.assert_allclose(np.asarray(outs["1"]), fh, rtol=3e-7, atol=1e-7)


@pytest.mark.parametrize("T", [8, 64, 576])
@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("seed_knob", ["0", "1"])
def test_seeded_carry_scan(T, reverse, seed_knob, monkeypatch):
    """scan_rec_log_carry: folding the chunk-entry carry into the boundary
    row (TRAMBA_SEED_CARRY=1, the round-5 default) computes the same
    recurrence as the classic A_cum * carry + h_partial epilogue (=0), vs a
    sequential oracle with the carry as initial state."""
    monkeypatch.setenv("TRAMBA_SEED_CARRY", seed_knob)
    jax.clear_caches()
    rng = np.random.default_rng(7)
    la = np.log(np.exp(-np.exp(rng.normal(size=(T, 16)) * 0.5 - 0.7))).astype(np.float32)
    b = (rng.normal(size=(T, 16)) * 0.5).astype(np.float32)
    c = rng.normal(size=(1, 16)).astype(np.float32)

    def kern(l_ref, b_ref, c_ref, o_ref):
        o_ref[...] = scan_rec_log_carry(l_ref[...], b_ref[...], c_ref[...], reverse)

    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((T, 16), jnp.float32), interpret=True,
    )(jnp.asarray(la), jnp.asarray(b), jnp.asarray(c))
    jax.clear_caches()
    a = np.exp(la)
    h = np.zeros_like(b)
    prev = c[0]
    for t in (range(T) if not reverse else range(T - 1, -1, -1)):
        prev = a[t] * prev + b[t]
        h[t] = prev
    np.testing.assert_allclose(np.asarray(out), h, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("T", [8, 64, 144, 576])
@pytest.mark.parametrize("revs", [(False, True), (True, False), (False, False)])
def test_dual_scan_bitexact(T, revs, monkeypatch):
    """scan_rec_log_carry2 (TRAMBA_DUAL_SCAN=1, interleaved pass loops)
    computes the identical fma sequence per direction as two sequential
    scan_rec_log_carry calls — only cross-direction instruction order
    differs.  As with test_suffix_a_matches_full, the different surrounding
    code can flip the compiler's fma-contraction choices on shared
    subexpressions (observed: 1 ulp on ~5% of elements at T=8 in interpret
    mode), so allow 1-ulp drift rather than exact bits."""
    rng = np.random.default_rng(11)

    def mk(seed):
        r = np.random.default_rng(seed)
        la = (-np.exp(r.normal(size=(T, 16)) * 0.5 - 0.7)).astype(np.float32)
        b = (r.normal(size=(T, 16)) * 0.5).astype(np.float32)
        c = r.normal(size=(1, 16)).astype(np.float32)
        return jnp.asarray(la), jnp.asarray(b), jnp.asarray(c)

    la0, b0, c0 = mk(21)
    la1, b1, c1 = mk(22)
    outs = {}
    for knob in ("0", "1"):
        monkeypatch.setenv("TRAMBA_DUAL_SCAN", knob)
        jax.clear_caches()

        def kern(l0, bb0, cc0, l1, bb1, cc1, o0, o1):
            h0, h1 = scan_rec_log_carry2(l0[...], bb0[...], cc0[...], revs[0],
                                         l1[...], bb1[...], cc1[...], revs[1])
            o0[...] = h0
            o1[...] = h1

        outs[knob] = pl.pallas_call(
            kern,
            out_shape=[jax.ShapeDtypeStruct((T, 16), jnp.float32)] * 2,
            interpret=True,
        )(la0, b0, c0, la1, b1, c1)
    jax.clear_caches()
    for d in (0, 1):
        np.testing.assert_allclose(np.asarray(outs["1"][d]),
                                   np.asarray(outs["0"][d]),
                                   rtol=3e-7, atol=1e-7)


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


@pytest.mark.parametrize("T", [16, 64, 144, 576])
@pytest.mark.parametrize("reverse", [False, True])
def test_radix_head_matches_roll(T, reverse, monkeypatch):
    """TRAMBA_RADIX_HEAD: one radix-8 round of independent rolls+fmas
    replaces the three serial s<8 passes (skip_a whole-chunk path only).
    Same window coverage, flat-sum association instead of the Hillis-Steele
    tree -> reassociation drift only (measured ~1e-6 abs vs an f64 oracle,
    same as the roll spelling)."""
    monkeypatch.setenv("TRAMBA_SLICE_SCAN", "1")
    a, b = _inputs(T, 16, seed=7)
    outs = {}
    for knob in ("0", "1"):
        monkeypatch.setenv("TRAMBA_RADIX_HEAD", knob)
        jax.clear_caches()
        outs[knob] = _run_h_only(
            lambda x, y: _scan_masked(x, y, T, reverse, need_a=False), a, b)
    jax.clear_caches()
    np.testing.assert_allclose(np.asarray(outs["1"]), np.asarray(outs["0"]),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("T,seg", [(288, 96), (96, 96), (64, 8)])
def test_line2_interleave_matches_sequential(T, seg, monkeypatch):
    """scan_rec_log_carry_line2 (the line-pair kernel's even whole-chunk +
    odd per-line pair) interleaved vs its two sequential calls: op-identical
    per direction, so bit-exact."""
    from tramba_tpu.ops.selective_scan import (scan_rec_log,
                                               scan_rec_log_carry,
                                               scan_rec_log_carry_line2)

    rng = np.random.default_rng(11)
    D = 16
    la_e = jnp.asarray(-np.exp(rng.normal(size=(T, D)) * 0.5 - 0.7).astype(np.float32))
    b_e = jnp.asarray((rng.normal(size=(T, D)) * 0.5).astype(np.float32))
    la_o = jnp.asarray(-np.exp(rng.normal(size=(T, D)) * 0.5 - 0.7).astype(np.float32))
    b_o = jnp.asarray((rng.normal(size=(T, D)) * 0.5).astype(np.float32))
    c_e = jnp.asarray((rng.normal(size=(1, D)) * 0.5).astype(np.float32))

    def kern(le_ref, be_ref, lo_ref, bo_ref, c_ref, he_ref, al_ref, hp_ref):
        he, (al, hp) = scan_rec_log_carry_line2(
            le_ref[...], be_ref[...], c_ref[...], lo_ref[...], bo_ref[...], seg)
        he_ref[...] = he
        al_ref[...] = al
        hp_ref[...] = hp

    def run():
        return pl.pallas_call(
            kern, out_shape=[jax.ShapeDtypeStruct((T, D), jnp.float32)] * 3,
            interpret=True)(la_e, b_e, la_o, b_o, c_e)

    monkeypatch.setenv("TRAMBA_DUAL_SCAN", "1")
    jax.clear_caches()
    he1, al1, hp1 = run()
    monkeypatch.setenv("TRAMBA_DUAL_SCAN", "0")
    jax.clear_caches()
    he0, al0, hp0 = run()
    np.testing.assert_array_equal(np.asarray(he1), np.asarray(he0))
    np.testing.assert_array_equal(np.asarray(al1), np.asarray(al0))
    np.testing.assert_array_equal(np.asarray(hp1), np.asarray(hp0))
