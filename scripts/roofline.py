"""Perf-evidence kit: measure this chip's rooflines and the model's position.

Reproduces, from a committed artifact, the load-bearing perf claims:
  1. HBM copy bandwidth via a Pallas passthrough kernel (the probe cited in
     README/CLAUDE.md — ~200 GB/s on the tunneled chip vs v5e's 819 GB/s).
  2. MXU peak via a large bf16 matmul.
  3. Per-segment timing of one flagship forward: the fused SS2D kernels at
     each stage's real shapes vs the whole model, so the Pallas/XLA split and
     %-of-roofline are measured, not asserted.

Usage: python scripts/roofline.py [--json PERF_EVIDENCE.json]
All timings force completion by fetching a scalar (block_until_ready does not
synchronize on the tunneled axon backend).
"""

import argparse
import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def _time(fn, *args, iters=20, warmup=3):
    """Median-free simple wall timing with pipelined dispatch, one final sync."""
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


# ---------------------------------------------------------------------------
# 1. HBM copy bandwidth (Pallas passthrough: one read + one write per element)
# ---------------------------------------------------------------------------


def _copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


@functools.partial(jax.jit, static_argnames=("rows",))
def _passthrough(x, rows=512):
    n = x.shape[0]
    spec = pl.BlockSpec((rows, x.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _copy_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(n // rows,),
        in_specs=[spec],
        out_specs=spec,
    )(x)


def measure_hbm_bandwidth(mbytes=256):
    cols = 1024
    rows_total = mbytes * 1024 * 1024 // (4 * cols)
    rows_total -= rows_total % 512
    x = jnp.ones((rows_total, cols), jnp.float32)
    dt = _time(_passthrough, x, iters=20)
    gbs = 2 * x.size * 4 / dt / 1e9
    return gbs, dt


# ---------------------------------------------------------------------------
# 2. MXU peak (bf16 matmul)
# ---------------------------------------------------------------------------


def measure_mxu_peak(n=8192):
    a = jnp.ones((n, n), jnp.bfloat16)
    b = jnp.ones((n, n), jnp.bfloat16)
    f = jax.jit(lambda x, y: x @ y)
    dt = _time(f, a, b, iters=20)
    tflops = 2 * n**3 / dt / 1e12
    return tflops, dt


# ---------------------------------------------------------------------------
# 3. Flagship per-segment breakdown
# ---------------------------------------------------------------------------

# (H, D_inner, kind, n_blocks) per flagship stage: VSSM-B encoder raster
# stages + decoder Helix(line) MultiScale blocks + FreqBlock guides, 384px.
# d_inner = 2 * d_model (ssm_ratio 2.0).
FLAGSHIP_SEGMENTS = [
    # encoder (dims 128, depths 2,2,15,2; raster K=4)
    ("enc_s1", 96, 256, "raster", 2),
    ("enc_s2", 48, 512, "raster", 2),
    ("enc_s3", 24, 1024, "raster", 15),
    ("enc_s4", 12, 2048, "raster", 2),
    # decoder (2 MS blocks per stage, each = one Helix line SS2D; K=8;
    # d_inner = 2 * skip_ch: 512/256/128 -> 1024/512/256)
    ("dec_s0", 24, 1024, "line", 2),
    ("dec_s1", 48, 512, "line", 2),
    ("dec_s2", 96, 256, "line", 2),
    # DFVSS guides: window + dilation SS2D per guide stage (K=4 each)
    ("guide_w24", 24, 1024, "window:8", 1),
    ("guide_d24", 24, 1024, "dilation:4", 1),
    ("guide_w48", 48, 512, "window:12", 1),
    ("guide_d48", 48, 512, "dilation:4", 1),
    ("guide_w96", 96, 256, "window:16", 1),
    ("guide_d96", 96, 256, "dilation:4", 1),
]


_STACK = 8  # copies per jit: amortizes the ~2 ms tunnel dispatch floor


def _segment_fn(kind, H, D, B, dtype):
    """The SS2D *module* at stage shapes — routes through the model's real
    kernel dispatch (smallmap megakernel at 24/12px, prologue + two-phase at
    96/48px, paired-line, freq folds), unlike raw fused_ss2d_full calls."""
    import numpy as np

    from tramba_tpu.nn.ssm import SS2D
    from tramba_tpu.utils.jit import tramba_jit

    rng = np.random.default_rng(0)
    dm = D // 2  # segments list D = d_inner = 2 * d_model
    x = jnp.asarray(rng.normal(size=(B, H, H, dm)).astype(np.float32) * 0.1, dtype)
    if ":" in kind:
        k, p = kind.split(":")
        mod = SS2D(d_model=dm, scan_kind=k, scan_param=int(p), k_group=4, dtype=dtype)
    else:
        mod = SS2D(d_model=dm, scan_kind=kind, k_group=8 if kind == "line" else 4,
                   dtype=dtype)
    ln = (jnp.ones((dm,), jnp.float32), jnp.zeros((dm,), jnp.float32))
    params = tramba_jit(lambda key: mod.init(key, x, ln=ln))(jax.random.key(0))

    @tramba_jit
    def stacked(p, a):
        tot = jnp.float32(0)
        for i in range(_STACK):
            out = mod.apply(p, a + jnp.asarray(i, dtype) * jnp.asarray(1e-6, dtype),
                            ln=ln)
            tot = tot + jnp.sum(out.astype(jnp.float32))
        return tot

    return stacked, (params, x), H * H


def measure_segments(B=16, dtype=jnp.bfloat16, hbm_gbs=None):
    """Per-segment table: _STACK perturbed copies of each stage's SS2D block
    run inside ONE jit (defeats CSE, amortizes dispatch); ms is per copy."""
    rows = []
    total = 0.0
    for name, H, D, kind, n in FLAGSHIP_SEGMENTS:
        f, args, L = _segment_fn(kind, H, D, B, dtype)
        dt = _time(f, *args, iters=10, warmup=2) / _STACK
        # minimal-traffic model for the in-projected map: read the d_model
        # input once, write it back once projected (the fused paths keep the
        # d_inner intermediates on-chip; two-phase paths re-read one extra
        # d_inner pass).  Reported as a lower-bound achieved-GB/s estimate.
        bpe = jnp.dtype(dtype).itemsize
        bytes_moved = (0.5 + 0.5 + 2) * B * L * D * bpe
        gbs = bytes_moved / dt / 1e9
        rows.append({
            "segment": name, "kind": kind, "H": H, "D": D, "blocks": n,
            "ms_per_call": round(dt * 1e3, 3), "ms_total": round(dt * 1e3 * n, 2),
            "achieved_gbps_est": round(gbs, 1),
            "roofline_frac": round(gbs / hbm_gbs, 3) if hbm_gbs else None,
        })
        total += dt * n
    return rows, total


# FFN / head kernels at flagship shapes (VERDICT r4 #3: per-kernel GFLOP/s +
# MFU for the non-SS2D 33 ms).  (name, H, d_model, kind, n_blocks); hidden =
# 4 * d_model.  'plain' = fused LN+MLP (encoder VSSBlocks + guide FreqBlocks),
# 'dwms' = fused LN+DWMSMlp (decoder MultiScale blocks, 83-tap conv stack).
FFN_SEGMENTS = [
    ("ffn_enc_s1", 96, 128, "plain", 2),
    ("ffn_enc_s2", 48, 256, "plain", 2),
    ("ffn_enc_s3", 24, 512, "plain", 15),
    ("ffn_enc_s4", 12, 1024, "plain", 2),
    ("ffn_dec_s0", 24, 512, "dwms", 2),
    ("ffn_dec_s1", 48, 256, "dwms", 2),
    ("ffn_dec_s2", 96, 128, "dwms", 2),
    ("ffn_guide24", 24, 512, "plain", 1),
    ("ffn_guide48", 48, 256, "plain", 1),
    ("ffn_guide96", 96, 128, "plain", 1),
    ("final_head", 96, 128, "head", 1),
]


def _ffn_fn(kind, H, d, B, dtype):
    """Stacked jit over the raw fused FFN/head kernel at stage shapes.
    Returns (fn, args, matmul_gflop_per_call, dw_gflop_per_call)."""
    import numpy as np

    from tramba_tpu.ops.fused_expand import fused_final_head
    from tramba_tpu.ops.fused_mlp import fused_ln_dwmsmlp, fused_ln_mlp
    from tramba_tpu.utils.jit import tramba_jit

    rng = np.random.default_rng(0)
    L = H * H
    h = 4 * d
    f32 = jnp.float32
    x = jnp.asarray(rng.normal(size=(B, H, H, d)).astype(np.float32) * 0.1, dtype)
    ln_s, ln_b = jnp.ones((d,), f32), jnp.zeros((d,), f32)
    mk = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.05)
    if kind == "plain":
        w1, b1, w2, b2 = mk(d, h), mk(h), mk(h, d), mk(d)
        call = lambda a: fused_ln_mlp(a.reshape(B, L, d), ln_s, ln_b, w1, b1, w2, b2)
        mm_gf = 2 * B * L * d * h * 2 / 1e9
        dw_gf = 0.0
    elif kind == "dwms":
        w1, b1, w2, b2 = mk(d, h), mk(h), mk(h, d), mk(d)
        k3, c3 = mk(3, 3, 1, h), mk(h)
        k5, c5 = mk(5, 5, 1, h), mk(h)
        k7, c7 = mk(7, 7, 1, h), mk(h)
        call = lambda a: fused_ln_dwmsmlp(a, ln_s, ln_b, w1, b1, k3, c3, k5, c5,
                                          k7, c7, w2, b2)
        mm_gf = 2 * B * L * d * h * 2 / 1e9
        dw_gf = 2 * B * L * h * (9 + 25 + 49) / 1e9  # VPU depthwise taps
    else:  # final head: Dense(C -> 16C) + per-slot LN + seg conv, fused
        w1 = mk(d, 16 * d)
        wh, bh = mk(d), mk(1)
        call = lambda a: fused_final_head(a, w1, ln_s, ln_b, wh, bh)
        # the fused spelling runs the expand + 3 selector contractions
        mm_gf = (2 * B * L * d * 16 * d + 3 * 2 * B * L * 16 * d * 16) / 1e9
        dw_gf = 0.0

    @tramba_jit
    def stacked(a):
        tot = jnp.float32(0)
        for i in range(_STACK):
            out = call(a + jnp.asarray(i, dtype) * jnp.asarray(1e-6, dtype))
            tot = tot + jnp.sum(out.astype(jnp.float32))
        return tot

    return stacked, (x,), mm_gf, dw_gf


def measure_ffn_segments(B=16, dtype=jnp.bfloat16, mxu_tflops=None):
    """FFN/head kernel table: ms, matmul GFLOP/s, MFU vs the co-measured MXU
    peak (VPU depthwise taps reported separately, not in MFU)."""
    rows = []
    total = 0.0
    for name, H, d, kind, n in FFN_SEGMENTS:
        f, args, mm_gf, dw_gf = _ffn_fn(kind, H, d, B, dtype)
        dt = _time(f, *args, iters=10, warmup=2) / _STACK
        gfps = mm_gf / dt
        rows.append({
            "seg": name, "kind": kind, "H": H, "d": d, "n": n,
            "ms": round(dt * 1e3, 3),
            "matmul_gflop": round(mm_gf, 2),
            "dw_gflop": round(dw_gf, 2),
            "gflops_per_s": round(gfps, 0),
            "mfu": round(gfps / (mxu_tflops * 1e3), 3) if mxu_tflops else None,
        })
        total += dt * n
    return rows, total


def measure_model(B=16, dtype=jnp.bfloat16):
    from tramba_tpu.models.tramba import TrambaV

    model = TrambaV(dtype=dtype)
    x = jnp.zeros((B, 384, 384, 3), dtype)
    params = jax.jit(lambda k: model.init(k, x))(jax.random.key(0))
    f = jax.jit(lambda p, a: model.apply(p, a)[-1])
    dt = _time(f, params, x, iters=10, warmup=2)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None, help="also write results to this path")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--skip-model", action="store_true")
    args = ap.parse_args()
    from tramba_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    gbs, _ = measure_hbm_bandwidth()
    print(f"HBM copy bandwidth (pallas passthrough): {gbs:.1f} GB/s "
          f"(v5e spec 819 GB/s; tunnel overhead explains the gap)")
    tflops, _ = measure_mxu_peak()
    print(f"MXU bf16 peak (8192^3 matmul): {tflops:.1f} TFLOP/s (v5e spec 197)")

    rows, seg_total = measure_segments(B=args.batch, hbm_gbs=gbs)
    print(f"\nfused SS2D segments at flagship shapes (batch {args.batch}, bf16):")
    for r in rows:
        print(f"  {r['segment']:<10} {r['kind']:<11} H={r['H']:<3} D={r['D']:<5} "
              f"x{r['blocks']:<2} {r['ms_per_call']:>8.3f} ms/call "
              f"~{r['achieved_gbps_est']:>6.1f} GB/s "
              f"({(r['roofline_frac'] or 0) * 100:.0f}% of measured roofline)")
    print(f"  SS2D kernel total per forward: {seg_total * 1e3:.1f} ms")

    result = {"hbm_copy_gbps": round(gbs, 1), "mxu_bf16_tflops": round(tflops, 1),
              "segments": rows, "ss2d_total_ms": round(seg_total * 1e3, 2)}
    if not args.skip_model:
        mdt = measure_model(B=args.batch)
        xla_ms = (mdt - seg_total) * 1e3
        print(f"\nfull flagship forward: {mdt * 1e3:.1f} ms "
              f"({args.batch / mdt:.1f} img/s) -> SS2D kernels {seg_total * 1e3:.1f} ms, "
              f"XLA rest (MLPs/convs/LNs/residuals/heads) {xla_ms:.1f} ms")
        result.update({"model_ms": round(mdt * 1e3, 2),
                       "img_per_s": round(args.batch / mdt, 1),
                       "xla_rest_ms": round(xla_ms, 2)})
    if args.json:
        with open(args.json, "w") as f:
            json.dump(result, f, indent=2)
        print(f"written: {args.json}")


if __name__ == "__main__":
    main()
