"""Standalone op timings at flagship stage shapes on the real chip.

Times each candidate composite (fused Pallas kernel vs composed XLA) and the
model's structural pieces, to attribute the forward's wall time from
measurement rather than traffic estimates.

Usage: python scripts/op_bench.py [--batch 16]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from tramba_tpu.utils.jit import tramba_jit
import numpy as np


def _sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))


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


def bench_pair(name, f_fused, f_comp, args, n=1):
    tf = _time(tramba_jit(f_fused), *args)
    tc = _time(tramba_jit(f_comp), *args)
    print(f"  {name:<28} fused {tf * 1e3:7.3f} ms  composed {tc * 1e3:7.3f} ms  "
          f"x{n:<2} -> saves {(tc - tf) * n * 1e3:6.2f} ms/fwd")
    return (tc - tf) * n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()
    B = args.batch
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    from tramba_tpu.ops.fused_mlp import (
        composed_ln_dwmsmlp, composed_ln_mlp, fused_ln_dwmsmlp, fused_ln_mlp,
    )
    from tramba_tpu.ops.fused_prologue import composed_prologue, fused_prologue

    def t(*shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.1, dt)

    def tf32(*shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.1)

    total = 0.0
    print(f"batch {B}, bf16 — per-op fused vs composed:")
    # encoder plain MLPs: (H, Dm, blocks); hidden = 4*Dm
    for H, Dm, n in ((96, 128, 2), (48, 256, 2), (24, 512, 15), (12, 1024, 2)):
        Hd = 4 * Dm
        a = (t(B, H * H, Dm), tf32(Dm), tf32(Dm), tf32(Dm, Hd), tf32(Hd),
             tf32(Hd, Dm), tf32(Dm))
        total += bench_pair(f"mlp H={H} D={Dm}", fused_ln_mlp, composed_ln_mlp, a, n)
    # decoder DWMS MLPs
    for H, Dm, n in ((24, 512, 2), (48, 256, 2), (96, 128, 2)):
        Hd = 4 * Dm
        convs = []
        for k in (3, 5, 7):
            convs += [tf32(k, k, 1, Hd), tf32(Hd)]
        a = (t(B, H, H, Dm), tf32(Dm), tf32(Dm), tf32(Dm, Hd), tf32(Hd), *convs,
             tf32(Hd, Dm), tf32(Dm))
        total += bench_pair(f"dwmsmlp H={H} D={Dm}", fused_ln_dwmsmlp,
                            composed_ln_dwmsmlp, a, n)
    # prologues (encoder raster 21 blocks + decoder 6 + freq 12 SS2Ds)
    for H, Dm, n in ((96, 128, 2 + 2 + 2), (48, 256, 2 + 2 + 2), (24, 512, 15 + 2 + 2),
                     (12, 1024, 2)):
        a = (t(B, H, H, Dm), tf32(Dm), tf32(Dm), tf32(Dm, 2 * Dm), tf32(3, 3, 1, 2 * Dm))
        total += bench_pair(f"prologue H={H} D={Dm}", fused_prologue,
                            composed_prologue, a, n)
    print(f"  projected total saving: {total * 1e3:.1f} ms/fwd")

    # structural pieces of the flagship forward at B
    from tramba_tpu.models.tramba import TrambaDecoder, TrambaV
    from tramba_tpu.models.vssm_encoder import VSSMEncoder

    x = t(B, 384, 384, 3)
    enc = VSSMEncoder(depths=(2, 2, 15, 2), dims=128, dtype=dt)
    pe = tramba_jit(lambda k: enc.init(k, x))(jax.random.key(0))
    te = _time(tramba_jit(lambda p, a: enc.apply(p, a)[-1]), pe, x, iters=10)
    print(f"  encoder alone: {te * 1e3:.1f} ms")
    skips = tramba_jit(lambda p, a: enc.apply(p, a))(pe, x)
    dec = TrambaDecoder(features_per_stage=[128, 256, 512, 1024], dtype=dt)
    pd = tramba_jit(lambda k: dec.init(k, skips))(jax.random.key(0))
    td = _time(tramba_jit(lambda p, s: dec.apply(p, s)[-1]), pd, skips, iters=10)
    print(f"  decoder alone (incl. guides): {td * 1e3:.1f} ms")
    model = TrambaV(dtype=dt)
    pm = tramba_jit(lambda k: model.init(k, x))(jax.random.key(0))
    tm = _time(tramba_jit(lambda p, a: model.apply(p, a)[-1]), pm, x, iters=10)
    print(f"  full model: {tm * 1e3:.1f} ms ({B / tm:.1f} img/s)")


def batch_scaling():
    """img/s at several batch sizes (amortizes serial kernel launches)."""
    from tramba_tpu.models.tramba import TrambaV

    dt = jnp.bfloat16
    model = TrambaV(dtype=dt)
    for B in (8, 16, 24, 32):
        x = jnp.zeros((B, 384, 384, 3), dt)
        p = tramba_jit(lambda k, a=x: model.init(k, a))(jax.random.key(0))
        f = tramba_jit(lambda p, a: jnp.sum(model.apply(p, a)[-1].astype(jnp.float32)))
        tm = _time(f, p, x, iters=10)
        print(f"  batch {B:>2}: {tm * 1e3:7.1f} ms  {B / tm:6.1f} img/s")


if __name__ == "__main__":
    if "--batch-scaling" in sys.argv:
        batch_scaling()
    else:
        main()
