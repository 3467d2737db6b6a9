"""Probe: does interleaving MORE, SHORTER carry-seeded scans beat 2-way?

The two-phase design's exclusive carries make chunks independent, so a
phase-2 kernel could process two half-chunks per grid step and interleave
FOUR scans (2 halves x 2 directions) instead of two.  Before re-plumbing
phase1/phase2/backward granularities, this measures the kernel-level
question in isolation: equal total elements, equal dirs, (a) 2 interleaved
scans of length T vs (b) 4 interleaved scans of length T/2 (one extra
carry fold each), vs (c) 2 sequential scans (the pre-round-5 baseline).

Dispatch-floor discipline: each variant runs as ONE pallas kernel with the
scan repeated over REPS independent (T, D) tiles resident in VMEM, timed
via scripts/roofline._time; compare differences between variants, not
absolute ms.
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tramba_tpu.ops.selective_scan import (VMEM_LIMIT_PARAMS, scan_rec_log_carry,
                                           scan_rec_log_carry2,
                                           scan_rec_log_carry_multi)
from tramba_tpu.utils.jit import tramba_jit

T, D, REPS = 192, 256, 24


def _kernel(mode, x_ref, o_ref):
    f32 = jnp.float32
    acc = None
    for r in range(REPS):
        x = x_ref[r].astype(f32)
        la = -jnp.abs(x) * 0.1 - 0.01
        b = x * 0.5
        c = x[0:1] * 0.01
        if mode == "seq2":
            h0 = scan_rec_log_carry(la, b, c, reverse=False)
            h1 = scan_rec_log_carry(la, 1.0 - b, c, reverse=True)
            y = h0 + h1
        elif mode == "dual2":
            h0, h1 = scan_rec_log_carry2(la, b, c, False, la, 1.0 - b, c, True)
            y = h0 + h1
        else:  # quad4: halves with their own carries (chunk-independent)
            m = T // 2
            h0a, h1a, h0b, h1b = scan_rec_log_carry_multi(
                [la[:m], la[:m], la[m:], la[m:]],
                [b[:m], 1.0 - b[:m], b[m:], 1.0 - b[m:]],
                [c, c, c * 2.0, c * 2.0],
                [False, True, False, True])
            y = jnp.concatenate([h0a + h1a, h0b + h1b], axis=0)
        acc = y if acc is None else acc + y
    o_ref[...] = acc.astype(o_ref.dtype)


def run(mode):
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(REPS, T, D)).astype(np.float32))

    fn = pl.pallas_call(
        functools.partial(_kernel, mode),
        out_shape=jax.ShapeDtypeStruct((T, D), jnp.float32),
        compiler_params=VMEM_LIMIT_PARAMS,
        interpret=jax.default_backend() != "tpu",
    )

    @tramba_jit
    def f(a):
        return jnp.sum(fn(a))

    float(f(x))
    float(f(x))
    t0 = time.perf_counter()
    out = None
    for _ in range(30):
        out = f(x)
    float(out)
    return (time.perf_counter() - t0) / 30 * 1e3


def main():
    import scripts.roofline as rl

    gbs, _ = rl.measure_hbm_bandwidth()
    print(f"HBM probe: {gbs:.1f} GB/s  (T={T}, D={D}, reps={REPS})")
    for rnd in range(3):
        for mode in ("seq2", "dual2", "quad4") if rnd % 2 == 0 else ("quad4", "dual2", "seq2"):
            ms = run(mode)
            print(f"round {rnd} {mode:>6}: {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
