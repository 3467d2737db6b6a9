"""Throughput of every model variant on the real chip (bf16, batch 8).

Usage: python scripts/variants_bench.py [--batch 8] [--img_size 384]
(--img_size 224 records the SOD-config stage maps 56/28/14/7)
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def _sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def _time(fn, *args, iters=15, warmup=3):
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--img_size", type=int, default=384)
    ap.add_argument("--only", default="", help="substring filter on method names")
    args = ap.parse_args()
    B = args.batch
    from tramba_tpu.models.registry import build
    from tramba_tpu.utils.cache import enable_compilation_cache
    from tramba_tpu.utils.jit import tramba_jit

    enable_compilation_cache()
    S = args.img_size
    x = jnp.zeros((B, S, S, 3), jnp.bfloat16)
    for method in ("Tramba-V-TSOD", "Tramba-S-TSOD", "Tramba-P-TSOD", "Tramba-R-TSOD",
                   "BaseUMamba-SOD"):
        if args.only and args.only not in method:
            continue
        model = build(method, img_size=S, dtype=jnp.bfloat16)
        variables = tramba_jit(lambda k, m=model: m.init(k, x))(jax.random.key(0))
        f = tramba_jit(lambda v, a, m=model: m.apply(v, a)[-1])
        dt = _time(f, variables, x)
        print(f"  {method:<14} {dt * 1e3:7.1f} ms  {B / dt:6.1f} img/s  "
              f"(batch {B}, bf16, {S}px)", flush=True)


if __name__ == "__main__":
    main()
