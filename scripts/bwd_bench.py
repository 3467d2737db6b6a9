"""Backward-pass attribution: per-block forward vs train-step (fwd+bwd) cost.

Times each block type's value_and_grad as _STACK perturbed copies in ONE jit
(same methodology as roofline.measure_segments) and compares with the
forward-only cost — shows where the ~3x fwd->step multiplier lives.

Usage: python scripts/bwd_bench.py [--batch 4]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from tramba_tpu.utils.cache import enable_compilation_cache
from tramba_tpu.utils.jit import tramba_jit

_STACK = 4


def _sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))


def _time(fn, *args, iters=8, warmup=2):
    out = fn(*args)
    _sync(out)
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters / _STACK


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()
    enable_compilation_cache()
    B = args.batch
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    t = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.1, dt)

    from tramba_tpu.nn.blocks import MultiScaleDecoderBlock, VSSBlock
    from tramba_tpu.nn.freq import FreqBlock
    from tramba_tpu.models.tramba import window_for_resolution

    cases = [
        ("enc_s1 VSSBlock", VSSBlock(hidden_dim=128, dtype=dt), 96, 128, 2),
        ("enc_s2 VSSBlock", VSSBlock(hidden_dim=256, dtype=dt), 48, 256, 2),
        ("enc_s3 VSSBlock", VSSBlock(hidden_dim=512, dtype=dt), 24, 512, 15),
        ("enc_s4 VSSBlock", VSSBlock(hidden_dim=1024, dtype=dt), 12, 1024, 2),
        ("dec_s0 MSBlock", MultiScaleDecoderBlock(hidden_dim=512, dtype=dt), 24, 512, 2),
        ("dec_s1 MSBlock", MultiScaleDecoderBlock(hidden_dim=256, dtype=dt), 48, 256, 2),
        ("dec_s2 MSBlock", MultiScaleDecoderBlock(hidden_dim=128, dtype=dt), 96, 128, 2),
        ("guide24 FreqBlock", FreqBlock(dim=512, window=window_for_resolution(24), dtype=dt), 24, 512, 1),
        ("guide48 FreqBlock", FreqBlock(dim=256, window=window_for_resolution(48), dtype=dt), 48, 256, 1),
        ("guide96 FreqBlock", FreqBlock(dim=128, window=window_for_resolution(96), dtype=dt), 96, 128, 1),
    ]
    tot_f = tot_g = 0.0
    for label, mod, H, dim, n in cases:
        x = t(B, H, H, dim)
        params = tramba_jit(lambda k, m=mod, a=x: m.init(k, a))(jax.random.key(0))

        @tramba_jit
        def fwd(p, a, m=mod):
            tot = jnp.float32(0)
            for i in range(_STACK):
                o = m.apply(p, a + jnp.asarray(i, a.dtype) * jnp.asarray(1e-6, a.dtype))
                tot = tot + jnp.sum(o.astype(jnp.float32))
            return tot

        @tramba_jit
        def step(p, a, m=mod):
            def loss(pp):
                tot = jnp.float32(0)
                for i in range(_STACK):
                    o = m.apply(pp, a + jnp.asarray(i, a.dtype) * jnp.asarray(1e-6, a.dtype))
                    tot = tot + jnp.sum(o.astype(jnp.float32))
                return tot

            l, g = jax.value_and_grad(loss)(p)
            return l + sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(g))

        df = _time(fwd, params, x)
        dg = _time(step, params, x)
        tot_f += df * n
        tot_g += dg * n
        print(f"{label:<18} fwd {df * 1e3:7.3f} ms  fwd+bwd {dg * 1e3:7.3f} ms  "
              f"(x{n}: {dg * n * 1e3:6.1f} ms, ratio {dg / df:.2f})", flush=True)
    print(f"totals: fwd {tot_f * 1e3:.1f} ms, fwd+bwd {tot_g * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
