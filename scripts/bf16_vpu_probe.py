"""Does packed bf16 buy VPU elementwise throughput?  (round-5 probe)

PERF.md 4.4 ruled out a bf16 scan because ``pltpu.roll`` only lowers for
32-bit element types — but the now-default slice-concat spelling
(selective_scan._scan_masked, docs/PERF.md 2.6) uses only static slices +
concat for every pass with shift >= 8, so the rotate constraint no longer
binds those passes.  Whether a bf16 scan could pay therefore reduces to a
hardware question this probe answers directly: does the VPU execute packed
bf16 elementwise work at ~2x the fp32 rate (two 16-bit lanes per 32-bit
ALU lane), or does it unpack to fp32 (1x, making bf16 pure conversion tax)?

Two kernels, each timed at two repetition counts so the tunnel dispatch
floor and the carry-in/out cost cancel in the difference:

* ``fma``:  R repetitions of 8 dependent full-tile fma ops (raw VPU rate);
* ``scan``: R repetitions of the slice-concat pass set for T=1024 (the
  s >= 8 passes only — the op mix the live kernels run), i.e. per set
  7 passes of ``b = concat(b[:s], b[s:] + a[s:] * b[:-s])``.

Run on an IDLE machine (CLAUDE.md measurement discipline).
Usage: python scripts/bf16_vpu_probe.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, D = 1024, 512  # fp32 tile 2 MB; bf16 1 MB — both VMEM-comfortable


def _sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def _time(fn, *args, iters=20, warmup=3):
    out = fn(*args)
    _sync(out)
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def _fma_kernel(reps, a_ref, b_ref, o_ref):
    a = a_ref[...]

    def body(_, b):
        for _ in range(8):
            b = b * a + a
        return b

    o_ref[...] = jax.lax.fori_loop(0, reps, body, b_ref[...])


def _scan_kernel(reps, a_ref, b_ref, o_ref):
    a = a_ref[...]

    def body(_, b):
        s = 8
        while s < T:
            b = jnp.concatenate([b[:s], b[s:] + a[s:] * b[:-s]], axis=0)
            s *= 2
        return b

    o_ref[...] = jax.lax.fori_loop(0, reps, body, b_ref[...])


def _call(kernel, reps, dtype):
    import functools

    fn = pl.pallas_call(
        functools.partial(kernel, reps),
        out_shape=jax.ShapeDtypeStruct((T, D), dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )
    a = jnp.full((T, D), 0.5, dtype)
    b = jnp.full((T, D), 1e-3, dtype)
    return jax.jit(lambda: fn(a, b))


def main():
    print(f"devices: {jax.devices()}", flush=True)
    results = {}
    for name, kernel, ops_per_rep in (
        ("fma", _fma_kernel, 8 * T * D * 2),
        # per pass: fma over T-s rows + copy of s rows ~= T rows touched;
        # count 2 elem-ops (mul+add) on the fma region only = lower bound
        ("scan", _scan_kernel, sum(2 * (T - s) * D for s in (8, 16, 32, 64, 128, 256, 512))),
    ):
        for dtype in (jnp.float32, jnp.bfloat16):
            lo, hi = 64, 576
            t_lo = _time(_call(kernel, lo, dtype))
            t_hi = _time(_call(kernel, hi, dtype))
            per_rep = (t_hi - t_lo) / (hi - lo)
            rate = ops_per_rep / per_rep / 1e9
            results[(name, jnp.dtype(dtype).name)] = per_rep
            print(f"{name:5s} {jnp.dtype(dtype).name:9s} per-rep {per_rep*1e6:8.2f} us "
                  f"  ~{rate:7.1f} Gop/s  (t64 {t_lo*1e3:.3f} ms, t576 {t_hi*1e3:.3f} ms)",
                  flush=True)
    for name in ("fma", "scan"):
        f32 = results[(name, "float32")]
        bf16 = results[(name, "bfloat16")]
        print(f"{name}: bf16/fp32 per-rep ratio = {bf16/f32:.3f} "
              f"({'bf16 FASTER' if bf16 < f32 else 'no packed-bf16 win'})")


if __name__ == "__main__":
    main()
