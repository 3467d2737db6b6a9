"""Per-segment A/B of a trace-time env knob (on="1" vs off="0"), interleaved.

Compares the fused-SS2D segment table (scripts/roofline.py shapes) with the
knob on vs off in one process, so chip weather is shared.  Round-3 use: the
two-level MXU-scan experiment measured ratio 1.00 +-0.01 on every segment
(deleted; negative recorded in ops/selective_scan.py).

Caveat: knobs read inside inner-jit bodies (e.g. TRAMBA_SEQ_BUDGET via
_seq_target) hit JAX's trace cache on the second flag — same function object
+ same avals returns the cached jaxpr without re-running Python — so both
variants can silently compile the SAME program (an exactly-1.00 ratio is
then an artifact).  We call jax.clear_caches() after every env flip to force
a fresh trace of every jit in the program under the new flag.

Usage: python scripts/seg_ab.py --knob TRAMBA_NO_SMALLMAP
"""

import argparse
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from tramba_tpu.utils.cache import enable_compilation_cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--knob", required=True)
    opts = ap.parse_args()
    enable_compilation_cache()
    import scripts.roofline as rl

    gbs, _ = rl.measure_hbm_bandwidth()
    print(f"HBM probe: {gbs:.1f} GB/s", flush=True)

    fns = {}
    for name, flag in (("on", "1"), ("off", "0")):
        os.environ[opts.knob] = flag
        # knobs read inside module-level inner jits would otherwise hit the
        # trace cache on the second flag and compare a variant with itself
        jax.clear_caches()
        for segname, H, D, kind, n in rl.FLAGSHIP_SEGMENTS:
            # fresh module + fresh tramba_jit per flag: env read at trace time.
            # AOT-compile so the held executable survives the clear_caches()
            # of the NEXT flip (a live jit would silently re-trace under the
            # other flag when first called in the timing loop).
            f, args, L = rl._segment_fn(kind, H, D, 16, jnp.bfloat16)
            fns[(name, segname)] = (f.lower(*args).compile(), args)
        print(f"{name}: traced+compiled", flush=True)

    res = {}
    for rnd in range(3):
        for name in ("on", "off") if rnd % 2 == 0 else ("off", "on"):
            for segname, H, D, kind, n in rl.FLAGSHIP_SEGMENTS:
                f, args = fns[(name, segname)]
                float(f(*args))  # warm
                t0 = time.perf_counter()
                o = None
                for _ in range(8):
                    o = f(*args)
                float(o)
                ms = (time.perf_counter() - t0) / 8 / rl._STACK * 1e3
                res.setdefault((name, segname), []).append(ms)

    print(f"\n{'segment':<12} {'on ms':>8} {'off ms':>8} {'ratio':>6}")
    tm = tf = 0.0
    for segname, H, D, kind, n in rl.FLAGSHIP_SEGMENTS:
        m = sorted(res[("on", segname)])[1]
        f = sorted(res[("off", segname)])[1]
        tm += m * n
        tf += f * n
        print(f"{segname:<12} {m:>8.3f} {f:>8.3f} {m/f:>6.2f}  x{n}")
    print(f"{'TOTAL':<12} {tm:>8.2f} {tf:>8.2f} {tm/tf:>6.2f}")


if __name__ == "__main__":
    main()
