"""Decoder component timings at flagship shapes — where 124 of the 174 ms/fwd
forward live (scripts/op_bench.py).  Times FreqBlock guides, MultiScale
decoder blocks, and the line-scan machinery separately.

Usage: python scripts/decoder_bench.py [--batch 16]
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
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()
    B = args.batch
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    def t(*shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.1, dt)

    from tramba_tpu.models.tramba import window_for_resolution
    from tramba_tpu.nn.blocks import MultiScaleDecoderBlock
    from tramba_tpu.nn.freq import FreqBlock
    from tramba_tpu.nn.layers import PatchExpand
    from tramba_tpu.nn.ssm import SS2D

    total = 0.0
    for H, Dm, label in ((24, 512, "s0"), (48, 256, "s1"), (96, 128, "s2")):
        x = t(B, H, H, Dm)
        rows = []
        fb = FreqBlock(dim=Dm, window=window_for_resolution(H), dilation=4, dtype=dt)
        p = tramba_jit(lambda k, m=fb, a=x: m.init(k, a))(jax.random.key(0))
        rows.append(("FreqBlock", _time(tramba_jit(lambda p, a, m=fb: m.apply(p, a)), p, x)))
        ms = MultiScaleDecoderBlock(hidden_dim=Dm, dtype=dt)
        p = tramba_jit(lambda k, m=ms, a=x: m.init(k, a))(jax.random.key(0))
        rows.append(("MSBlock (x2)", _time(tramba_jit(lambda p, a, m=ms: m.apply(p, a)), p, x)))
        # line SS2D alone vs raster SS2D (same dims) to isolate the K=8 machinery
        s_line = SS2D(d_model=Dm, scan_kind="line", k_group=8, dtype=dt)
        p = tramba_jit(lambda k, m=s_line, a=x: m.init(k, a))(jax.random.key(0))
        rows.append(("SS2D line K=8", _time(tramba_jit(lambda p, a, m=s_line: m.apply(p, a)), p, x)))
        s_rast = SS2D(d_model=Dm, scan_kind="raster", k_group=4, dtype=dt)
        p = tramba_jit(lambda k, m=s_rast, a=x: m.init(k, a))(jax.random.key(0))
        rows.append(("SS2D raster K=4", _time(tramba_jit(lambda p, a, m=s_rast: m.apply(p, a)), p, x)))
        pe = PatchExpand(dtype=dt)
        xin = t(B, H // 2, H // 2, 2 * Dm)
        p = tramba_jit(lambda k, m=pe, a=xin: m.init(k, a))(jax.random.key(0))
        rows.append(("PatchExpand", _time(tramba_jit(lambda p, a, m=pe: m.apply(p, a)), p, xin)))
        sw = SS2D(d_model=Dm, scan_kind="window", scan_param=window_for_resolution(H), dtype=dt)
        p = tramba_jit(lambda k, m=sw, a=x: m.init(k, a))(jax.random.key(0))
        rows.append(("SS2D window", _time(tramba_jit(lambda p, a, m=sw: m.apply(p, a)), p, x)))
        sd = SS2D(d_model=Dm, scan_kind="dilation", scan_param=4, dtype=dt)
        p = tramba_jit(lambda k, m=sd, a=x: m.init(k, a))(jax.random.key(0))
        rows.append(("SS2D dilation", _time(tramba_jit(lambda p, a, m=sd: m.apply(p, a)), p, x)))
        from tramba_tpu.ops.dct import dct2d
        rows.append(("dct2d", _time(tramba_jit(lambda a: dct2d(a)), x)))
        print(f"stage {label} ({H}px, {Dm}ch):")
        for name, dtm in rows:
            print(f"  {name:<18} {dtm * 1e3:7.2f} ms")
        total += rows[0][1] + 2 * rows[1][1] + rows[4][1]
    print(f"guide+2xMS+expand sum over stages: {total * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
