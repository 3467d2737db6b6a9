"""Same-process full-model A/B of a trace-time env knob (on="1" vs off="0").

The tunneled chip's speed drifts run-to-run (HBM probe spread ~100-240 GB/s),
so cross-invocation comparisons are unreliable.  This script traces the
flagship forward TWICE in one process — once with --knob set to "1", once
to "0" (knobs are read at trace time) — and interleaves the timing loops
so both variants see the same chip weather.

Caveat: a knob read inside a module-level inner jit hits JAX's trace cache
on the second flag (same function object + same avals => cached jaxpr, no
Python re-execution), so without cache clearing both "variants" can be the
same program.  jax.clear_caches() after each env flip forces fresh traces.

Used for the round-3 two-level-MXU-scan A/B (verdict: dead neutral; the
experiment was deleted — see ops/selective_scan.py _scan_masked notes).

Usage: python scripts/scan_ab.py --knob TRAMBA_TWO_PHASE_TRAIN [--iters 12]
       numeric knobs: --knob TRAMBA_MLP_BUDGET --on 524288 --off 131072
"""

import argparse
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from tramba_tpu.utils.cache import enable_compilation_cache
from tramba_tpu.utils.jit import tramba_jit


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--knob", required=True)
    ap.add_argument("--on", default="1", help="knob value for the 'on' arm")
    ap.add_argument("--off", default="0", help="knob value for the 'off' arm")
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    enable_compilation_cache()
    from tramba_tpu.models.tramba import TrambaV

    dtype = jnp.bfloat16
    model = TrambaV(dtype=dtype)
    x = jnp.zeros((args.batch, 384, 384, 3), dtype)
    params = tramba_jit(lambda k: model.init(k, x))(jax.random.key(0))

    fns = {}
    for name, flag in (("on", args.on), ("off", args.off)):
        os.environ[args.knob] = flag
        jax.clear_caches()  # see docstring: defeat the inner-jit trace cache

        @tramba_jit
        def fwd(p, a):
            out = model.apply(p, a)[-1]
            return jnp.sum(out.astype(jnp.float32))

        t0 = time.time()
        # AOT-compile: the held executable must survive the clear_caches()
        # of the next flip (a live jit would re-trace under the other flag)
        compiled = fwd.lower(params, x).compile()
        v = float(compiled(params, x))
        print(f"{name}: compiled in {time.time()-t0:.0f}s, checksum {v:.4f}",
              flush=True)
        fns[name] = compiled

    results = {"on": [], "off": []}
    for r in range(args.rounds):
        for name in ("on", "off") if r % 2 == 0 else ("off", "on"):
            fn = fns[name]
            float(fn(params, x))  # warm
            t0 = time.time()
            o = None
            for _ in range(args.iters):
                o = fn(params, x)
            float(o)
            ms = (time.time() - t0) / args.iters * 1e3
            results[name].append(ms)
            print(f"round {r} {name}: {ms:.2f} ms", flush=True)

    for name, ms in results.items():
        ms = sorted(ms)
        print(f"{name}: median {ms[len(ms)//2]:.2f} ms  "
              f"min {ms[0]:.2f}  max {ms[-1]:.2f}")


if __name__ == "__main__":
    main()
