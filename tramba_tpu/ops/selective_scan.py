"""Selective-scan (S6) recurrence, TPU-native.

Replaces the reference's external CUDA extensions ``selective_scan_cuda_oflex``
/ ``_core`` / original mamba kernels (wrapped at ``Models/SS2D/csms6s.py:858-923``)
with:

* a **Pallas TPU kernel** for the first-order linear recurrence
  ``h_t = a_t * h_{t-1} + b_t`` — one HBM pass, in-chunk Hillis-Steele scan
  along sublanes, fp32 carry held in VMEM scratch across sequence chunks;
* a pure-JAX ``lax.associative_scan`` reference backend (plays the role the
  reference's ``SelectiveScanFake``/pytorch fallback played: an oracle and a
  portable fallback);
* a ``custom_vjp`` whose backward is the *same* kernel run on the reversed,
  index-shifted coefficients (the adjoint of a linear recurrence is a linear
  recurrence), plus fused elementwise math.

The surrounding selective-scan math (Δ softplus discretization, B·u input,
C·h + D·u output — what the CUDA kernel computed, see csms6s.py:147-148 and
the recurrence documented in SURVEY.md §2.6) is plain jnp so XLA fuses it
with neighbouring projections.

Layout: sequences are ``(..., L, C)`` — channels on lanes (pad to 128),
sequence on sublanes, scanned in chunks.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Every pallas_call in ops/ goes through _vcall so the raised Mosaic
# scoped-vmem budget travels WITH the kernel: a caller using plain jax.jit
# (instead of utils/jit.tramba_jit) still compiles the big-stack megakernels
# instead of hitting the remote compiler's opaque HTTP-500 at the default
# 16 MB limit.  Per-pallas_call CompilerParams is probe-verified to forward
# through the remote AOT compiler just like per-jit compiler_options.
VMEM_LIMIT_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
_vcall = functools.partial(pl.pallas_call, compiler_params=VMEM_LIMIT_PARAMS)


__all__ = ["linear_scan", "selective_scan"]


# ---------------------------------------------------------------------------
# linear recurrence h_t = a_t * h_{t-1} + b_t   (h_{-1} = 0), scan over axis -2
# ---------------------------------------------------------------------------


def _linear_scan_assoc(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Reference backend: O(log L) associative scan (XLA collective-permute free)."""

    def combine(left, right):
        a_l, b_l = left
        a_r, b_r = right
        return a_l * a_r, a_r * b_l + b_r

    _, h = jax.lax.associative_scan(combine, (a, b), axis=-2)
    return h


def _radix8_head(a, b, row, reverse):
    """One radix-8 round (7 independent rolls + fmas) == three serial s<8
    Hillis-Steele passes for the skip_a whole-chunk path: returns (b after
    the 8-window prefix round, a_view = sliding-8-window decay products on
    the live continuation rows only).  See the call site in _scan_masked for
    the full rationale; shared by the interleaved (dual-scan) loop."""
    T = a.shape[0]

    def rl(v, k):
        return pltpu.roll(v, shift=(T - k) if reverse else k, axis=0)

    A1 = a
    A2 = A1 * rl(A1, 1)
    A3 = A2 * rl(A1, 2)
    A4 = A2 * rl(A2, 2)
    A5 = A4 * rl(A1, 4)
    A6 = A4 * rl(A2, 4)
    A7 = A4 * rl(A3, 4)
    A8 = A4 * rl(A4, 4)
    acc = b
    for k, Ak in enumerate((A1, A2, A3, A4, A5, A6, A7), start=1):
        live = (row >= k) if not reverse else (row < T - k)
        acc = acc + jnp.where(live, Ak, 0.0) * rl(b, k)
    a_view = A8[8:] if not reverse else A8[:T - 8]
    return acc, a_view


def _scan_masked(a, b, seg, reverse, need_a=True):
    """Per-``seg``-segment masked Hillis-Steele over axis 0 (prefix scan
    within each segment; suffix when ``reverse``).  seg == T is the plain
    whole-chunk scan.

    Round-3 negative results (two attempts, both measured on hardware):
    (1) a two-level variant (log2(8) full-width passes + a carrier scan on
    the (T/8, D) summaries + broadcast combine) was 19-24% SLOWER at every
    live shape — Mosaic's sublane reshape/slice/broadcast relayouts for the
    carriers cost more than the saved passes; (2) the same reassociation
    with the relayouts replaced by exact one-hot bf16 MXU matmuls
    (three-plane fp32 split, gather/expand as (T/G,T)x(T,D) contractions)
    was dead NEUTRAL — ratio 1.00 +-0.01 per segment across all 13 live
    kernel shapes in a same-process interleaved A/B (scripts/seg_ab.py),
    i.e. the fused kernels are not scan-VPU-bound.  Smaller chunk lengths
    (fewer passes, TRAMBA_SEQ_BUDGET knob) also measured slower (153.5 vs
    149.6 ms full-model).  This plain masked scan IS the fast spelling.

    TRAMBA_EMPTY_SCAN=1 (trace-time, floor-measurement only): skip the scan
    passes and return (a, b) unchanged — every fused kernel then becomes its
    own "empty-scan twin" with identical HBM I/O, projections, MXU matmuls
    and transposes, so `scripts/seg_ab.py --knob TRAMBA_EMPTY_SCAN` measures
    each live kernel's non-scan floor directly (VERDICT r3 next-1).  Outputs
    are numerically meaningless under the knob.

    TRAMBA_SCAN_PASSES=k (trace-time, floor-measurement only): run only the
    first k Hillis-Steele passes (shifts 1..2^(k-1)) and stop.  Sweeping k
    (scripts/scan_passes_sweep.py) yields the marginal cost per pass — the
    curve that disambiguates round 4's paradox (full removal saves 38%,
    pass-halving is neutral): concave = the sub-sublane shifts (s<8, which
    need intra-vreg rotates) dominate; linear = every pass bills the same.
    k=0 must reproduce the TRAMBA_EMPTY_SCAN twin.  Numerically meaningless
    for k below the full log2(seg) pass count.

    Slice-concat passes (round 5, the fifth spelling — and the first WIN):
    for whole-chunk scans (seg == T) every pass with shift s >= 8 is
    sublane-aligned, so the circular roll + two masked selects collapse to
    static vreg-aligned slices::

        b = concat(b[:s], b[s:] + a[s:] * b[:-s])     (forward)
        a = concat(a[:s], a[s:] * a[:-s])

    Bit-exact vs the masked roll: updated rows compute the identical fma;
    untouched rows kept their full prefixes under the mask (a*1, b+a*0)
    and keep them verbatim here.  7 tile-ops/pass -> 3, no rotate, no
    iota compare, and the updated region *shrinks* as s grows — exactly
    the late passes the pass sweep (scripts/scan_passes_sweep.py) showed
    cost 2-3x the mid passes.  Sub-sublane shifts (s < 8) keep the masked
    roll (the intra-vreg rotate is unavoidable); segmented scans
    (seg < T, the paired-line kernel) keep it too — their per-row validity
    mask is not a contiguous slice.  DEFAULT ON since the measured win
    (interleaved seg_ab, probe 256 GB/s: raster 0.87-0.95x, line 0.91-0.93x,
    guides ~0.99x, fused-segment TOTAL 108.1 vs 117.3 ms = 0.92x; full-model
    interleaved scan_ab: 139.16 vs 148.29 ms = 0.938x — the first of five
    scan spellings to win in-model); TRAMBA_SLICE_SCAN=0 restores the pure
    masked roll (docs/PERF.md 2.6).

    TRAMBA_SEG_SLICE_SCAN (round 5 follow-on): extends the slice spelling to
    SEGMENTED scans (seg < T, the paired-line odd direction — the only
    roll-keeping path left).  The (T, D) chunk is reshaped to
    (T//seg, seg, D) — tile-preserving when seg % 8 == 0, so no relayout —
    where each pass with s >= 8 is a static slice along the sublane axis
    with NO validity mask at all (segment boundaries coincide with the
    reshape).  Sub-8 passes keep the flat masked roll.  Measured interleaved
    (seg_ab, probe 269 GB/s): dec_s0/s1/s2 all 0.99x, everything else 1.00x —
    a hair-positive ~0.5 ms/forward.  Default ON (bit-exact,
    tests/test_slice_scan.py; never measured worse); =0 restores the roll.

    need_a=False (round 5): callers that DISCARD the cumulative decay (the
    whole-map smallmap megakernel — no carry, `_, h = scan` at
    fused_ss2d_small._scan_full_log) don't need the full a-updates: the a
    produced by the pass at shift s is read only by the b-update at shift 2s
    and only at rows [2s:] (forward; prefix [:T-2s] reversed).  So the slice
    path keeps a shrinking SUFFIX view instead — per pass the a-concat
    disappears and the a-mul region halves (``a_view = a_view[s:] *
    a_view[:T-2s]``), and the final pass does no decay work at all.  The
    masked-roll passes (s < 8) still need full a (their rolls wrap), but the
    roll path also skips its final-pass a-update (3 of 7 tile-ops) when it is
    the last.  h computes the identical fma sequence (the b-update reads the
    identical rows); dropped dead a-ops can still flip compiler fusion on
    shared subexpressions, so allow ~1-ulp drift (tests/test_slice_scan.py).
    Returns (None, h) — loud, not silently-stale, if a caller uses it.
    TRAMBA_SUFFIX_A=0 restores full a-updates (A/B knob for seg_ab)."""
    if os.environ.get("TRAMBA_EMPTY_SCAN", "0") == "1":
        return (a if need_a else None), b
    passes_cap = int(os.environ.get("TRAMBA_SCAN_PASSES", "-1"))
    use_slice = (os.environ.get("TRAMBA_SLICE_SCAN", "1") == "1") and seg == a.shape[0]
    use_seg_slice = (os.environ.get("TRAMBA_SEG_SLICE_SCAN", "1") == "1"
                     and seg < a.shape[0] and seg % 8 == 0
                     and a.shape[0] % seg == 0)
    skip_a = (not need_a) and os.environ.get("TRAMBA_SUFFIX_A", "1") == "1"
    T = a.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
    s = 1
    done = 0
    a_view = None  # shrinking live-rows view of a (suffix fwd / prefix rev)
    use_radix = (os.environ.get("TRAMBA_RADIX_HEAD", "0") == "1"
                 and use_slice and skip_a and passes_cap < 0 and seg >= 16)
    if use_radix:
        # Radix-8 head round (round 5, Mosaic-level attempt): ONE round of 7
        # INDEPENDENT rolls+fmas replaces the three serial sub-sublane passes
        # (s=1,2,4) — the passes the pass sweep (docs/PERF.md 2.6) bills
        # highest and whose intra-vreg rotates no slice spelling can remove.
        # After the round, row t holds the exact 8-window prefix
        # sum_{k=0..min(t,7)} W_k,t * b_{t-k} — identical coverage to three
        # Hillis-Steele passes (association differs: flat fma chain vs tree,
        # ~ulp drift).  The window-product weights A_k = prod_{(t-k, t]} a
        # build on the a-side (7 rolls + 7 muls + 7 zero-masks), which 2.7
        # measured off the b-chain's critical path; the b-side is 7 rolls +
        # 7 fmas with NO cross-op dependencies, so the serial depth drops
        # from 3 rounds to 1.  Only the skip_a whole-chunk path (the live
        # default: seeded carries everywhere) qualifies — its continuation
        # reads a_view = A_8 rows [8:] only, where the wrapped rows of the
        # unmasked A_k chains are never seen.
        b, a_view = _radix8_head(a, b, row, reverse)
        s = 8
        done = 3
    while s < seg and (passes_cap < 0 or done < passes_cap):
        if use_slice and s >= 8:
            if skip_a:
                if a_view is None:
                    a_view = a[:T - s] if reverse else a[s:]
                if reverse:
                    b = jnp.concatenate([b[:T - s] + a_view * b[s:], b[T - s:]], axis=0)
                    if 2 * s < seg:
                        a_view = a_view[:T - 2 * s] * a_view[s:]
                else:
                    b = jnp.concatenate([b[:s], b[s:] + a_view * b[:-s]], axis=0)
                    if 2 * s < seg:
                        a_view = a_view[s:] * a_view[:T - 2 * s]
                s *= 2
                done += 1
                continue
            if reverse:
                b = jnp.concatenate([b[:T - s] + a[:T - s] * b[s:], b[T - s:]], axis=0)
                a = jnp.concatenate([a[:T - s] * a[s:], a[T - s:]], axis=0)
            else:
                b = jnp.concatenate([b[:s], b[s:] + a[s:] * b[:-s]], axis=0)
                a = jnp.concatenate([a[:s], a[s:] * a[:-s]], axis=0)
            s *= 2
            done += 1
            continue
        if use_seg_slice and s >= 8:
            sh3 = (T // seg, seg) + a.shape[1:]
            a3, b3 = a.reshape(sh3), b.reshape(sh3)
            if reverse:
                e = seg - s
                b3 = jnp.concatenate(
                    [b3[:, :e] + a3[:, :e] * b3[:, s:], b3[:, e:]], axis=1)
                a3 = jnp.concatenate([a3[:, :e] * a3[:, s:], a3[:, e:]], axis=1)
            else:
                b3 = jnp.concatenate(
                    [b3[:, :s], b3[:, s:] + a3[:, s:] * b3[:, :-s]], axis=1)
                a3 = jnp.concatenate([a3[:, :s], a3[:, s:] * a3[:, :-s]], axis=1)
            a, b = a3.reshape(a.shape), b3.reshape(b.shape)
            s *= 2
            done += 1
            continue
        if reverse:
            # circular shift up by s == roll by T - s (roll requires shift >= 0)
            b_sh = pltpu.roll(b, shift=T - s, axis=0)
            valid = (row % seg) < seg - s
        else:
            b_sh = pltpu.roll(b, shift=s, axis=0)
            valid = (row % seg) >= s
        b_sh = jnp.where(valid, b_sh, 0.0)
        b = b + a * b_sh
        if not (skip_a and 2 * s >= seg):  # last-pass decay update feeds nothing
            a_sh = pltpu.roll(a, shift=(T - s) if reverse else s, axis=0)
            a = a * jnp.where(valid, a_sh, 1.0)
        s *= 2
        done += 1
    return (a if need_a else None), b


def _scan_mxu_log(la, b, seg, reverse, T0=8):
    """(a_cum, h) of h_t = a_t h_{t-1} + b_t from LOG-domain decay la = ln a.

    Round-4 MXU-chunked spelling (scripts/mxu_scan_probe.py): the empty-scan
    twins (docs/PERF.md 2.5) showed the masked-roll scan costs ~38% of every
    fused kernel even though halving its passes measures neutral — the serial
    VPU latency, not the pass count, is what Mosaic cannot hide.  This moves
    the intra-sub-chunk prefix onto the MXU as two triangular matmuls in a
    (G, T0, D) batched layout:

        cl    = tri @ la              inclusive cumsum of log-decay
        ea    = exp(cl)               local inclusive decay products
        h_loc = ea * (tri @ (b/ea))   exact: h_t = sum_s exp(cl_t - cl_s) b_s

    and leaves only the (G, D) = (T/8, D) inter-sub-chunk carries on the VPU
    (the existing masked-roll, 8x fewer elements).  The caller's own
    exp(delta*A) is *moved* inside (callers pass delta*A), not duplicated.

    Numerics: la is clamped at -10 (flushes a < 4.5e-5 — history the fp32
    roll scan also kills within two steps), bounding exp(-cl) <= e^80 within
    a sub-chunk; the largest term of each prefix sum is always the newest,
    so rounding stays ~eps * |b|.  Parity vs the roll scan: ~1e-7 abs
    (probe + tests/test_mxu_scan.py)."""
    T, D = la.shape[0], la.shape[-1]
    G = T // T0
    seg2 = max(seg // T0, 1)
    f32 = jnp.float32
    # two-sided clamp: decay is always a = exp(delta*A) <= 1 (delta > 0 from
    # softplus, A < 0), so the upper clip at 0 only sanitizes ragged-chunk
    # pad garbage; the lower clip at -10 flushes a < 4.5e-5
    la = jnp.clip(la.astype(f32), -10.0, 0.0)
    la3 = la.reshape(G, T0, D)
    b3 = b.astype(f32).reshape(G, T0, D)
    r = jax.lax.broadcasted_iota(jnp.int32, (T0, T0), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (T0, T0), 1)
    tri = ((c <= r) if not reverse else (c >= r)).astype(f32)
    tri_b = jnp.broadcast_to(tri[None], (G, T0, T0))
    dg = (((2,), (1,)), ((0,), (0,)))
    mm = lambda m, v: jax.lax.dot_general(
        m, v, dg, preferred_element_type=f32, precision=jax.lax.Precision.HIGHEST)
    cl = mm(tri_b, la3)
    ea = jnp.exp(cl)
    h_loc = ea * mm(tri_b, b3 / ea)
    # (G, D) summaries: whole-sub-chunk log-product + partial h at the exit end
    lA = jnp.sum(la3, axis=1)
    edge = T0 - 1 if not reverse else 0
    aa, hh = _scan_masked(jnp.exp(lA), h_loc[:, edge, :], seg2, reverse)
    g = jax.lax.broadcasted_iota(jnp.int32, (G, D), 0)
    if not reverse:
        first = (g % seg2) == 0
        C = jnp.where(first, 0.0, pltpu.roll(hh, shift=1, axis=0))
        AC = jnp.where(first, 1.0, pltpu.roll(aa, shift=1, axis=0))
    else:
        last = (g % seg2) == seg2 - 1
        C = jnp.where(last, 0.0, pltpu.roll(hh, shift=G - 1, axis=0))
        AC = jnp.where(last, 1.0, pltpu.roll(aa, shift=G - 1, axis=0))
    C3 = jnp.broadcast_to(C.reshape(G, 1, D), (G, T0, D))
    AC3 = jnp.broadcast_to(AC.reshape(G, 1, D), (G, T0, D))
    h = (h_loc + ea * C3).reshape(la.shape)
    a_cum = (ea * AC3).reshape(la.shape)
    return a_cum, h


def _mxu_scan_ok(T, D, seg) -> bool:
    # DEFAULT OFF — measured negative (round 4, the fourth scan spelling):
    # interleaved seg_ab --knob TRAMBA_MXU_SCAN read 1.19-1.40x SLOWER on all
    # 13 live kernel shapes (TOTAL 145.9 vs 116.8 ms, probe 276.8 GB/s).  The
    # (G, T0, D) reshape/summary/broadcast relayouts plus the in-kernel
    # division cost more than the removed roll passes — the same relayout tax
    # that sank round 3's two-level carriers.  Numerics are exact (~1e-5 on
    # hardware; tests/test_mxu_scan.py keeps them honest) and the spelling is
    # kept as the ledger entry + methodology twin for the empty-scan floors.
    return (os.environ.get("TRAMBA_MXU_SCAN", "0") == "1"
            and T % 8 == 0 and seg % 8 == 0 and D % 128 == 0 and T >= 16)


def scan_rec_log(la, b, seg, reverse, need_a=True):
    """Per-segment recurrence scan from LOG-domain decay: the fused kernels'
    entry point.  Dispatches to the MXU-chunked spelling when the shape
    allows (TRAMBA_MXU_SCAN=0 forces the masked-roll everywhere); both paths
    return (a_cum, h).  TRAMBA_EMPTY_SCAN=1 keeps the floor-twin contract.
    need_a=False (see _scan_masked): the caller discards a_cum — skip /
    shrink the decay updates and return (None, h)."""
    if os.environ.get("TRAMBA_EMPTY_SCAN", "0") == "1":
        return (jnp.exp(la.astype(jnp.float32)) if need_a else None), b
    T, D = la.shape[0], la.shape[-1]
    if _mxu_scan_ok(T, D, seg):
        a_cum, h = _scan_mxu_log(la, b, seg, reverse)
        return (a_cum if need_a else None), h
    return _scan_masked(jnp.exp(la.astype(jnp.float32)), b, seg, reverse,
                        need_a=need_a)


def scan_rec_log_carry(la, b, carry, reverse):
    """h of h_t = exp(la_t) * h_{t-1} + b_t over axis 0 with boundary state
    ``carry`` (broadcastable to (1, D)): h_{-1} = carry forward, h_T = carry
    reversed.  Whole-chunk only.  Returns h (T, D).

    Round-5 spelling: every fused kernel knows its chunk-entry carry BEFORE
    the scan (serial grid scratch, or the two-phase carries kernel), so the
    classic ``A_cum * carry + h_partial`` epilogue wastes the cumulative-decay
    side of every Hillis-Steele pass (~2 of 5 slice-path tile-ops) just to
    apply one known vector.  Fold the carry into the boundary row instead —
    ``b'_edge = b_edge + exp(la_edge) * carry`` — and scan with need_a=False
    (suffix decay updates, _scan_masked).  Mathematically identical
    (fp association differs: the carry term now rides the same fma chain as
    b instead of one post-hoc fma — drift ~1 ulp/step, decay-bounded; parity
    + grad tests tolerate).  TRAMBA_SEED_CARRY=0 restores the A_cum epilogue
    (A/B knob, scripts/seg_ab.py)."""
    T = la.shape[0]
    if os.environ.get("TRAMBA_SEED_CARRY", "1") == "1":
        f32 = jnp.float32
        laf = la.astype(f32)
        row = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
        edge = (row == 0) if not reverse else (row == T - 1)
        if not reverse:
            a_edge = jnp.exp(laf[0:1])  # aligned 1-row slice
        else:
            # last row via masked reduce (an offset-(T-1) row slice is a
            # Mosaic relayout hazard; the reduce is 2 cheap full-width ops)
            a_edge = jnp.exp(jnp.sum(jnp.where(edge, laf, 0.0), axis=0,
                                     keepdims=True))
        b = jnp.where(edge, b + a_edge * carry, b)
        _, h = scan_rec_log(la, b, T, reverse, need_a=False)
        return h
    A_cum, hp = scan_rec_log(la, b, T, reverse)
    return A_cum * carry + hp


def _dual_scan_on():
    """Default ON (round 5): interleaving the pass loops of independent scans
    fills the serial shadow the b-chain's pass-to-pass latency leaves —
    interleaved seg_ab (probe 126.0): raster 0.94-0.95, line 0.97, guides
    0.98-1.00, fused-segment TOTAL 101.31 vs 105.04 = 0.96; full-model
    interleaved scan_ab (4 rounds): 134.33 vs 137.35 ms median = 0.978x,
    on-arm strictly faster in every round, spreads non-overlapping.  This is
    the direct positive counterpart of the empty-scan twins' latency story
    (docs/PERF.md 2.5/2.9): the VPU has spare issue slots during a single
    scan's serial chain.  TRAMBA_DUAL_SCAN=0 restores sequential scans."""
    return os.environ.get("TRAMBA_DUAL_SCAN", "1") != "0"


def scan_rec_log_carry2(la0, b0, c0, rev0, la1, b1, c1, rev1):
    """Two INDEPENDENT carry-seeded whole-chunk scans with their Hillis-Steele
    pass loops textually interleaved (knob ``TRAMBA_DUAL_SCAN``, default ON —
    measured win, see :func:`_dual_scan_on`; =0 restores two sequential
    :func:`scan_rec_log_carry` calls).

    Why this might matter (and why it is NOT a retry of the dead overlap
    probe, docs/PERF.md 4.11): carry seeding (2.7) removed the a-side decay
    ops from every pass and measured ~neutral — those ops were executing in
    idle VPU slots created by the b-chain's serial pass-to-pass latency.
    Those slots are now EMPTY.  The paired kernels run two data-independent
    scans back to back (fwd + rev direction; h-scan + lambda-scan in the
    adjoint); issuing their passes alternately gives Mosaic's scheduler
    adjacent independent work to fill the shadow with — potentially hiding
    one chain's latency entirely.  The overlap probe tested proj-vs-scan
    BEFORE carry seeding, when the a-ops still occupied the slack.

    Bit-exact per direction vs the sequential calls: identical op sequence
    per direction (same slice-concat spelling, same seeding), only the
    instruction interleaving across directions differs — elementwise fp ops
    on disjoint arrays commute exactly.  Falls back to sequential whenever
    any scan knob is off its default (floor twins, pass sweeps, MXU scan,
    roll spelling) so every measurement knob keeps its contract, or when the
    two chunks' lengths differ."""
    h0, h1 = scan_rec_log_carry_multi([la0, la1], [b0, b1], [c0, c1],
                                      [rev0, rev1])
    return h0, h1


def scan_rec_log_carry_multi(las, bs, cs, revs):
    """N independent carry-seeded whole-chunk scans with interleaved pass
    loops (TRAMBA_DUAL_SCAN); sequential :func:`scan_rec_log_carry` calls
    otherwise.  The N=4 case serves a phase-2 kernel processing two
    carry-independent half-chunks x two directions (scripts/multi_scan_probe
    measures whether 4-way beats 2-way before the model routes through it).
    Returns [h, ...]."""
    if not _interleave_ok(las):
        return [scan_rec_log_carry(la, b, c, rev)
                for la, b, c, rev in zip(las, bs, cs, revs)]
    f32 = jnp.float32
    T = las[0].shape[0]
    las2, bs2 = [], []
    for la, b, c, rev in zip(las, bs, cs, revs):
        laf = la.astype(f32)
        row = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
        edge = (row == 0) if not rev else (row == T - 1)
        if not rev:
            a_edge = jnp.exp(laf[0:1])
        else:
            a_edge = jnp.exp(jnp.sum(jnp.where(edge, laf, 0.0), axis=0,
                                     keepdims=True))
        las2.append(la)
        bs2.append(jnp.where(edge, b + a_edge * c, b))
    return _scan_interleaved(las2, bs2, revs)


def _interleave_ok(las):
    """Interleaved pass loops mirror ONE knob configuration — the measured
    round-5 default (slice-concat + suffix-a + seeded carries, roll/MXU/floor
    knobs off).  Any other setting falls back to sequential scans so every
    measurement knob keeps its contract."""
    return (
        _dual_scan_on()
        and os.environ.get("TRAMBA_SEED_CARRY", "1") == "1"
        and os.environ.get("TRAMBA_SLICE_SCAN", "1") == "1"
        and os.environ.get("TRAMBA_SUFFIX_A", "1") == "1"
        and os.environ.get("TRAMBA_EMPTY_SCAN", "0") == "0"
        and os.environ.get("TRAMBA_MXU_SCAN", "0") == "0"
        and int(os.environ.get("TRAMBA_SCAN_PASSES", "-1")) < 0
        and len({la.shape[0] for la in las}) == 1
    )


def scan_rec_log_carry_line2(la_e, b_e, c_e, la_o, b_o, seg_o):
    """The line-pair kernel's two independent directions with interleaved
    pass loops (TRAMBA_DUAL_SCAN): the EVEN direction is a carry-seeded
    whole-chunk forward scan (skip_a spelling), the ODD one a per-line
    (seg = line length) REVERSED segmented scan that must keep its
    cumulative decay (the caller chains carries across lines with it).
    Their pass structures differ — whole-chunk slice-concat vs the
    (T//seg, seg, D) seg-slice reshape — so scan_rec_log_carry2 cannot
    serve; this loop issues one pass of each per shift, each direction
    op-identical to its sequential spelling (the even side stops feeding
    passes at s >= T, the odd at s >= seg).  Returns (h_e, (A_ln, hp_ln)).
    Falls back to the two sequential calls whenever any scan knob is off
    its measured default."""
    T = la_e.shape[0]
    ok = (
        _dual_scan_on()
        and os.environ.get("TRAMBA_SEED_CARRY", "1") == "1"
        and os.environ.get("TRAMBA_SLICE_SCAN", "1") == "1"
        and os.environ.get("TRAMBA_SEG_SLICE_SCAN", "1") == "1"
        and os.environ.get("TRAMBA_SUFFIX_A", "1") == "1"
        and os.environ.get("TRAMBA_EMPTY_SCAN", "0") == "0"
        and os.environ.get("TRAMBA_MXU_SCAN", "0") == "0"
        and os.environ.get("TRAMBA_RADIX_HEAD", "0") == "0"
        and int(os.environ.get("TRAMBA_SCAN_PASSES", "-1")) < 0
        and seg_o % 8 == 0 and T % seg_o == 0 and T >= 8
    )
    if not ok:
        h_e = scan_rec_log_carry(la_e, b_e, c_e, reverse=False)
        return h_e, scan_rec_log(la_o, b_o, seg_o, reverse=True)
    f32 = jnp.float32
    lef = la_e.astype(f32)
    row = jax.lax.broadcasted_iota(jnp.int32, la_e.shape, 0)
    be = jnp.where(row == 0, b_e + jnp.exp(lef[0:1]) * c_e, b_e)
    ae = jnp.exp(lef)
    ao = jnp.exp(la_o.astype(f32))
    bo = b_o
    av = None
    sh3 = (T // seg_o, seg_o) + la_o.shape[1:]
    s = 1
    while s < T or s < seg_o:
        if s < T:  # even: whole-chunk forward, skip_a spelling
            if s >= 8:
                if av is None:
                    av = ae[s:]
                be = jnp.concatenate([be[:s], be[s:] + av * be[:-s]], axis=0)
                if 2 * s < T:
                    av = av[s:] * av[:T - 2 * s]
            else:
                b_sh = jnp.where(row >= s, pltpu.roll(be, shift=s, axis=0), 0.0)
                be = be + ae * b_sh
                if 2 * s < T:
                    a_sh = pltpu.roll(ae, shift=s, axis=0)
                    ae = ae * jnp.where(row >= s, a_sh, 1.0)
        if s < seg_o:  # odd: per-line reversed, full decay kept
            if s >= 8:
                a3, b3 = ao.reshape(sh3), bo.reshape(sh3)
                e = seg_o - s
                b3 = jnp.concatenate(
                    [b3[:, :e] + a3[:, :e] * b3[:, s:], b3[:, e:]], axis=1)
                a3 = jnp.concatenate([a3[:, :e] * a3[:, s:], a3[:, e:]], axis=1)
                ao, bo = a3.reshape(ao.shape), b3.reshape(bo.shape)
            else:
                valid = (row % seg_o) < seg_o - s
                b_sh = jnp.where(valid, pltpu.roll(bo, shift=T - s, axis=0), 0.0)
                bo = bo + ao * b_sh
                a_sh = pltpu.roll(ao, shift=T - s, axis=0)
                ao = ao * jnp.where(valid, a_sh, 1.0)
        s *= 2
    return be, (ao, bo)


def scan_rec_log_multi(las, bs, revs):
    """N independent whole-chunk need_a=False scans (no carry — the smallmap
    megakernel's four directions), pass loops interleaved under
    TRAMBA_DUAL_SCAN; sequential :func:`scan_rec_log` calls otherwise.
    Returns [h, ...]."""
    if not _interleave_ok(las):
        return [scan_rec_log(la, b, la.shape[0], rev, need_a=False)[1]
                for la, b, rev in zip(las, bs, revs)]
    return _scan_interleaved(las, bs, revs)


def _scan_interleaved(las, bs, revs):
    """The interleaved pass loop: per Hillis-Steele shift, issue every
    direction's update before advancing — op-identical per direction to the
    default skip_a spelling in _scan_masked (slice-concat passes at s >= 8
    with a shrinking suffix a-view, masked rolls below — or the radix-8 head
    round when TRAMBA_RADIX_HEAD=1, matching _scan_masked's spelling — and
    final-pass decay skipped).  Callers guarantee _interleave_ok."""
    f32 = jnp.float32
    T = las[0].shape[0]
    # [a (full, roll passes), a_view (slice passes), b, rev, row-iota]
    states = [[jnp.exp(la.astype(f32)), None, b, rev,
               jax.lax.broadcasted_iota(jnp.int32, la.shape, 0)]
              for la, b, rev in zip(las, bs, revs)]
    s = 1
    if os.environ.get("TRAMBA_RADIX_HEAD", "0") == "1" and T >= 16:
        for st in states:
            a, _, b, rev, row = st
            st[2], st[1] = _radix8_head(a, b, row, rev)
        s = 8
    while s < T:
        for st in states:
            a, a_view, b, rev, row = st
            if s >= 8:  # slice-concat passes, suffix-view a (skip_a spelling)
                if a_view is None:
                    a_view = a[:T - s] if rev else a[s:]
                if rev:
                    b = jnp.concatenate(
                        [b[:T - s] + a_view * b[s:], b[T - s:]], axis=0)
                    if 2 * s < T:
                        a_view = a_view[:T - 2 * s] * a_view[s:]
                else:
                    b = jnp.concatenate(
                        [b[:s], b[s:] + a_view * b[:-s]], axis=0)
                    if 2 * s < T:
                        a_view = a_view[s:] * a_view[:T - 2 * s]
            else:  # sub-sublane masked-roll passes (full a except last pass)
                if rev:
                    b_sh = pltpu.roll(b, shift=T - s, axis=0)
                    valid = row < T - s
                else:
                    b_sh = pltpu.roll(b, shift=s, axis=0)
                    valid = row >= s
                b = b + a * jnp.where(valid, b_sh, 0.0)
                if 2 * s < T:
                    a_sh = pltpu.roll(a, shift=(T - s) if rev else s, axis=0)
                    a = a * jnp.where(valid, a_sh, 1.0)
            st[0], st[1], st[2] = a, a_view, b
        s *= 2
    return [st[2] for st in states]


def _scan_chunk_kernel(a_ref, b_ref, h_ref, carry):
    """One (rows=T sequence, lanes=C channels) chunk of the recurrence."""
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _():
        carry[...] = jnp.zeros_like(carry)

    a = a_ref[0].astype(jnp.float32)  # (T, C)
    b = b_ref[0].astype(jnp.float32)
    T = a.shape[0]
    if os.environ.get("TRAMBA_SEED_CARRY", "1") == "1":
        # fold the chunk-entry carry into row 0 and skip the cumulative-decay
        # materialization (see scan_rec_log_carry)
        row = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
        b = jnp.where(row == 0, b + a[0:1] * carry[...], b)
        _, h = _scan_masked(a, b, T, reverse=False, need_a=False)
    else:
        a, b = _scan_masked(a, b, T, reverse=False)
        h = a * carry[...] + b
    carry[...] = h[T - 1 :, :]
    h_ref[0] = h.astype(h_ref.dtype)


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def _linear_scan_pallas(a, b, chunk: int = 256, interpret: bool = False):
    """(R, L, C) fp32 recurrence via Pallas; single pass over HBM."""
    R, L, C = a.shape
    T = min(chunk, L)
    grid = (R, pl.cdiv(C, 128), pl.cdiv(L, T))
    spec = pl.BlockSpec((1, T, 128), lambda r, c, t: (r, t, c), memory_space=pltpu.VMEM)
    return _vcall(
        _scan_chunk_kernel,
        out_shape=jax.ShapeDtypeStruct((R, L, C), jnp.float32),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=spec,
        scratch_shapes=[pltpu.VMEM((1, 128), jnp.float32)],
        interpret=interpret,
    )(a, b)


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _linear_scan_seq(a, b):
    """Sequential lax.scan reference (slowest, exact step-by-step order)."""

    def step(h, ab):
        h = ab[0] * h + ab[1]
        return h, h

    a_t = jnp.moveaxis(a, -2, 0)
    b_t = jnp.moveaxis(b, -2, 0)
    h0 = jnp.zeros_like(a_t[0])
    _, hs = jax.lax.scan(step, h0, (a_t, b_t))
    return jnp.moveaxis(hs, 0, -2)


def _linear_scan_impl(a, b, backend: Optional[str]):
    if backend == "seq_parallel":
        # L-axis sharded over the ambient mesh (ICI): per-device local scans
        # + an associative carry prefix over the mesh axis (SURVEY §5.7)
        from tramba_tpu.parallel.seq_scan import (
            current_sequence_mesh,
            sequence_parallel_linear_scan,
        )

        mesh, axis_name, batch_axis = current_sequence_mesh()
        return sequence_parallel_linear_scan(
            a.astype(jnp.float32), b.astype(jnp.float32), mesh, axis_name,
            batch_axis=batch_axis
        )
    if backend == "seq":
        return _linear_scan_seq(a, b)
    if backend == "fake":
        # debugging stand-in (SelectiveScanFake, selective_scan.py:208-229):
        # pass-through forward, zero-information recurrence
        return b
    if backend is None:
        # auto: the Pallas kernel on TPU, XLA associative scan elsewhere
        # (interpret-mode Pallas is orders of magnitude too slow for real use)
        backend = "pallas" if _on_tpu() else "assoc"
    if backend == "assoc":
        return _linear_scan_assoc(a, b)
    shape = a.shape
    a3 = a.reshape((-1,) + shape[-2:]).astype(jnp.float32)
    b3 = b.reshape((-1,) + shape[-2:]).astype(jnp.float32)
    h = _linear_scan_pallas(a3, b3, interpret=not _on_tpu())
    return h.reshape(shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def linear_scan(a: jnp.ndarray, b: jnp.ndarray, backend: Optional[str] = None) -> jnp.ndarray:
    """h with h_t = a_t * h_{t-1} + b_t over axis -2, h_{-1} = 0.

    ``backend``: None (auto: Pallas kernel on TPU, associative scan off-TPU),
    'pallas' (force the kernel; interpreter off-TPU), or 'assoc' (pure-XLA
    associative scan).  fp32 internally regardless of input dtype.
    """
    return _linear_scan_impl(a, b, backend)


def _linear_scan_fwd(a, b, backend):
    h = _linear_scan_impl(a, b, backend)
    return h, (a, h)


def _linear_scan_bwd(backend, res, g):
    a, h = res
    # adjoint: lam_t = g_t + a_{t+1} * lam_{t+1}  -> reversed linear scan
    a_up = jnp.concatenate([a[..., 1:, :], jnp.zeros_like(a[..., :1, :])], axis=-2)
    lam = jnp.flip(
        _linear_scan_impl(jnp.flip(a_up, axis=-2), jnp.flip(g, axis=-2), backend), axis=-2
    )
    h_prev = jnp.concatenate([jnp.zeros_like(h[..., :1, :]), h[..., :-1, :]], axis=-2)
    da = (lam * h_prev).astype(a.dtype)
    db = lam.astype(g.dtype)
    return da, db


linear_scan.defvjp(_linear_scan_fwd, _linear_scan_bwd)


# ---------------------------------------------------------------------------
# selective scan (the S6 op the CUDA extension computed)
# ---------------------------------------------------------------------------


def selective_scan(
    u: jnp.ndarray,  # (B, K, L, D)
    dt: jnp.ndarray,  # (B, K, L, D) pre-softplus
    A: jnp.ndarray,  # (K, D, N)  (already negative: A = -exp(A_log))
    Bc: jnp.ndarray,  # (B, K, L, N)
    Cc: jnp.ndarray,  # (B, K, L, N)
    D: jnp.ndarray,  # (K, D)
    dt_bias: Optional[jnp.ndarray] = None,  # (K, D)
    backend: Optional[str] = None,
) -> jnp.ndarray:
    """y_t = C_t · h_t + D * u_t with h_t = exp(Δ_t A) h_{t-1} + Δ_t B_t u_t.

    Δ_t = softplus(dt_t + dt_bias).  State carried in fp32 (matching the CUDA
    kernel's fp32 state, csms6s.py:147-148).  Returns y in u's dtype, shape
    (B, K, L, D).
    """
    dtf = dt.astype(jnp.float32)
    if dt_bias is not None:
        dtf = dtf + dt_bias.astype(jnp.float32)[None, :, None, :]
    delta = jax.nn.softplus(dtf)  # (B, K, L, D)
    uf = u.astype(jnp.float32)
    Af = A.astype(jnp.float32)
    Bf = Bc.astype(jnp.float32)
    Cf = Cc.astype(jnp.float32)

    N = A.shape[-1]
    du = delta * uf  # (B, K, L, D)
    if N == 1:
        a = jnp.exp(delta * Af[None, :, None, :, 0])  # (B, K, L, D)
        b = du * Bf  # broadcast (B, K, L, 1) over D
        h = linear_scan(a, b, backend)
        y = h * Cf
    else:
        # general N: fold the state axis into channels
        Bsh, K, L, Dch = u.shape
        a = jnp.exp(delta[..., :, None] * Af[None, :, None, :, :])  # (B,K,L,D,N)
        b = du[..., :, None] * Bf[:, :, :, None, :]  # (B,K,L,D,N)
        h = linear_scan(
            a.reshape(Bsh, K, L, Dch * N), b.reshape(Bsh, K, L, Dch * N), backend
        ).reshape(Bsh, K, L, Dch, N)
        y = jnp.einsum("bkldn,bkln->bkld", h, Cf)
    y = y + uf * D.astype(jnp.float32)[None, :, None, :]
    return y.astype(u.dtype)
