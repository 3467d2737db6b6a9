"""Fused per-block FFN megakernels: LayerNorm + MLP in one HBM pass.

The reference runs each block's FFN as separate modules (LN -> fc1 -> GELU
-> fc2, ``modules.py:134-153``; the decoder's multi-scale depthwise FFN
``vmamba.py:606-629`` adds three depthwise convs over the 4x-wide hidden),
which on TPU costs ~12-35 HBM passes over the activation per block — the
hidden tensor alone is written and re-read four times.  Here each FFN is one
Pallas kernel: read x once, do LN + fc1 + (dw convs) + GELU + fc2 entirely
in VMEM, write y once.  The residual add / DropPath stay outside so training
semantics are unchanged.

Backward falls back to the composed XLA path (recompute from the saved
input) — matmul-dominated, so XLA handles it well; the fused forward is
where the HBM traffic was.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tramba_tpu.ops.fused_ss2d import _erf, _vcall

__all__ = ["fused_ln_mlp", "fused_ln_dwmsmlp", "fused_ln_dwmlp",
           "mlp_fusable", "dwmsmlp_fusable", "dwmlp_fusable"]

# VMEM budget for resident weights (bytes, in the kernel compute dtype).
_WEIGHT_BUDGET = 9 * 1024 * 1024


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf(x * jnp.float32(0.7071067811865476)))


def _ln(x, scale, bias, eps=1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _weight_bytes(d: int, hidden: int, dtype) -> int:
    return 2 * d * hidden * jnp.dtype(dtype).itemsize


def mlp_fusable(d: int, hidden: int, dtype, force=False) -> bool:
    # bf16 only on hardware (fp32 = the parity path; composed XLA is fine)
    return (d % 8 == 0 and hidden % 128 == 0
            and (force or jnp.dtype(dtype).itemsize == 2)
            and _weight_bytes(d, hidden, dtype) <= _WEIGHT_BUDGET)


def dwmsmlp_fusable(H: int, W: int, d: int, hidden: int, dtype, force=False) -> bool:
    # needs >= 3 halo rows from each neighbour block and zero-pad columns;
    # small spatial tiles starve the MXU and measure slower than composed XLA
    # (scripts/op_bench.py: 24px/2048h fused 5.8 ms vs composed 2.7 ms), so
    # the pixel floor is a perf gate (bypassed by backend='pallas' test mode)
    return (
        mlp_fusable(d, hidden, dtype, force)
        and W % 8 == 0
        and (force or H * W >= 2304)
        and _row_chunk_mlp(H, W, hidden) >= 4
    )


def _pick_chunk(L: int, target: int) -> int:
    best = 0
    for t in range(8, L + 1, 8):
        if L % t == 0 and t <= target:
            best = t
    return best or L


def _hidden_chunk(hidden: int) -> int:
    # 512 max: a single 512-wide chunk measures ~22 MB of Mosaic scoped-vmem
    # stack (the 83 conv-tap temps scale with chunk width) — inside the
    # raised 32 MB limit that entry points set via utils/jit.tramba_jit.
    # Must DIVIDE hidden: the kernels' chunk loops tile exactly (a ragged
    # tail would slice short and break the (rows, W, Hc) reshape — hit by
    # PVTv2-b4 stage 3, hidden 4*320=1280, whose largest 128-multiple
    # divisor <= 512 is 256).
    if hidden <= 512:
        return hidden
    for c in range(512, 127, -128):
        if hidden % c == 0:
            return c
    # unreachable via the *_fusable gates (they require hidden % 128 == 0);
    # fail loudly rather than hand back a non-divisor chunk
    raise ValueError(f"_hidden_chunk: hidden={hidden} not a multiple of 128")


def _row_chunk_mlp(H: int, W: int, hidden: int) -> int:
    """Rows per block: bound the (Tr+6)*(W+6)*chunk tile to ~300K elements.
    Empirical envelope (on-chip compile probes, 32 MB scoped-vmem limit
    via utils/jit.tramba_jit): ~600K elements; the 83 unrolled conv-tap
    temps are charged per element with a large multiplier, so analytic
    byte budgets under-predict."""
    budget = 600_000 // ((W + 6) * _hidden_chunk(hidden))
    best = 0
    for tr in range(2, H + 1, 2):
        if H % tr == 0 and tr + 6 <= budget:
            best = tr
    return best


# ---------------------------------------------------------------------------
# Plain LN + MLP (VSSBlock / VSSMDecoderBlock FFN)
# ---------------------------------------------------------------------------


def _mlp_kernel(hi, x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
    prec = jax.lax.Precision.HIGHEST if hi else jax.lax.Precision.DEFAULT
    x = x_ref[0].astype(jnp.float32)  # (T, D)
    y = _ln(x, s_ref[...].astype(jnp.float32), b_ref[...].astype(jnp.float32))
    h = jax.lax.dot_general(y.astype(x_ref.dtype), w1_ref[...],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32, precision=prec)
    h = _gelu_exact(h + b1_ref[...].astype(jnp.float32))
    o = jax.lax.dot_general(h.astype(x_ref.dtype), w2_ref[...],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32, precision=prec)
    out_ref[0] = (o + b2_ref[...].astype(jnp.float32)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _mlp_pallas(x, ln_scale, ln_bias, w1, b1, w2, b2, interpret=False):
    B, L, D = x.shape
    Hd = w1.shape[1]
    # TRAMBA_MLP_BUDGET: L-chunk element budget (T = budget // Hd).  Round-5
    # tile A/B (VERDICT r4 #3; interleaved 3-round, idle chip): 4x the old
    # 128K budget is uniformly faster on every plain-MLP stage — enc_s4
    # 0.966 -> 0.651 ms (-33%), enc_s3 0.774 -> 0.686 (x15 blocks), enc_s1
    # 1.403 -> 1.248, guides -4..-9% — fewer grid steps amortize the
    # per-step prologue while the fp32 hidden tile stays ~2 MB at any Hd
    # (T*Hd is constant).  Default 512K since; =131072 restores the old
    # tiling (PERF.md 2.12).
    T = _pick_chunk(L, max(8, int(os.environ.get("TRAMBA_MLP_BUDGET", "524288")) // Hd))
    nT = L // T
    cd = x.dtype
    vec = lambda v: v.astype(jnp.float32)[None, :]
    par = lambda a, bdim: pl.BlockSpec((a, bdim), lambda b, t: (0, 0),
                                       memory_space=pltpu.VMEM)
    return _vcall(
        functools.partial(_mlp_kernel, x.dtype == jnp.float32),
        out_shape=jax.ShapeDtypeStruct((B, L, D), x.dtype),
        grid=(B, nT),
        in_specs=[
            pl.BlockSpec((1, T, D), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
            par(1, D), par(1, D), par(D, Hd), par(1, Hd), par(Hd, D), par(1, D),
        ],
        out_specs=pl.BlockSpec((1, T, D), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, vec(ln_scale), vec(ln_bias), w1.astype(cd), vec(b1), w2.astype(cd), vec(b2))


def composed_ln_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2):
    """XLA oracle, fp32 internals matching the kernel's compute dtypes."""
    f32 = jnp.float32
    y = _ln(x.astype(f32), ln_scale.astype(f32), ln_bias.astype(f32))
    h = y.astype(x.dtype) @ w1.astype(x.dtype)
    h = _gelu_exact(h.astype(f32) + b1.astype(f32))
    o = h.astype(x.dtype) @ w2.astype(x.dtype)
    return (o.astype(f32) + b2.astype(f32)).astype(x.dtype)


def _gelu_grad(z):
    """d/dz of exact GELU: Phi(z) + z * phi(z)."""
    phi = jnp.exp(-0.5 * z * z) * jnp.float32(0.3989422804014327)
    return 0.5 * (1.0 + _erf(z * jnp.float32(0.7071067811865476))) + z * phi


def _mlp_bwd_kernel(hi, x_ref, g_ref, s_ref, bn_ref, w1_ref, b1_ref, w2_ref,
                    dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, ds_ref, dbn_ref):
    """Adjoint of LN -> fc1 -> GELU -> fc2 in ONE pass: recompute the tile's
    hidden state in VMEM from x, then dx + all weight grads — the composed
    VJP re-pays ~10 HBM passes over the activation per block."""
    prec = jax.lax.Precision.HIGHEST if hi else jax.lax.Precision.DEFAULT
    f32 = jnp.float32
    cd = x_ref.dtype
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        ds_ref[...] = jnp.zeros_like(ds_ref)
        dbn_ref[...] = jnp.zeros_like(dbn_ref)

    x = x_ref[0].astype(f32)  # (T, D)
    g = g_ref[0].astype(f32)
    D = x.shape[-1]
    s = s_ref[...].astype(f32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + 1e-5)
    xn = (x - mean) * rstd
    xf = (xn * s + bn_ref[...].astype(f32)).astype(cd)
    h0 = jax.lax.dot_general(xf, w1_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=f32, precision=prec) \
        + b1_ref[...].astype(f32)
    hg = _gelu_exact(h0).astype(cd)
    # fc2 adjoint
    dh = jax.lax.dot_general(g.astype(cd), w2_ref[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=f32, precision=prec)
    dh = dh * _gelu_grad(h0)
    dw2_ref[...] += jax.lax.dot_general(hg, g.astype(cd), (((0,), (0,)), ((), ())),
                                        preferred_element_type=f32, precision=prec)
    db2_ref[...] += jnp.sum(g, axis=0, keepdims=True)
    # fc1 adjoint
    dhc = dh.astype(cd)
    dxf = jax.lax.dot_general(dhc, w1_ref[...], (((1,), (1,)), ((), ())),
                              preferred_element_type=f32, precision=prec)
    dw1_ref[...] += jax.lax.dot_general(xf, dhc, (((0,), (0,)), ((), ())),
                                        preferred_element_type=f32, precision=prec)
    db1_ref[...] += jnp.sum(dh, axis=0, keepdims=True)
    # LN adjoint
    ds_ref[...] += jnp.sum(dxf * xn, axis=0, keepdims=True)
    dbn_ref[...] += jnp.sum(dxf, axis=0, keepdims=True)
    dxn = dxf * s
    dx = rstd * (dxn - jnp.mean(dxn, axis=-1, keepdims=True)
                 - xn * jnp.mean(dxn * xn, axis=-1, keepdims=True))
    dx_ref[0] = dx.astype(dx_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _mlp_bwd_pallas(x, g, ln_scale, ln_bias, w1, b1, w2, interpret=False):
    B, L, D = x.shape
    Hd = w1.shape[1]
    # TRAMBA_MLP_BUDGET: L-chunk element budget (T = budget // Hd).  Round-5
    # tile A/B (VERDICT r4 #3; interleaved 3-round, idle chip): 4x the old
    # 128K budget is uniformly faster on every plain-MLP stage — enc_s4
    # 0.966 -> 0.651 ms (-33%), enc_s3 0.774 -> 0.686 (x15 blocks), enc_s1
    # 1.403 -> 1.248, guides -4..-9% — fewer grid steps amortize the
    # per-step prologue while the fp32 hidden tile stays ~2 MB at any Hd
    # (T*Hd is constant).  Default 512K since; =131072 restores the old
    # tiling (PERF.md 2.12).
    T = _pick_chunk(L, max(8, int(os.environ.get("TRAMBA_MLP_BUDGET", "524288")) // Hd))
    nT = L // T
    cd = x.dtype
    vec = lambda v: v.astype(jnp.float32)[None, :]
    par = lambda a, bdim: pl.BlockSpec((a, bdim), lambda b, t: (0, 0),
                                       memory_space=pltpu.VMEM)
    outs = _vcall(
        functools.partial(_mlp_bwd_kernel, x.dtype == jnp.float32),
        out_shape=[
            jax.ShapeDtypeStruct((B, L, D), cd),
            jax.ShapeDtypeStruct((D, Hd), jnp.float32),
            jax.ShapeDtypeStruct((1, Hd), jnp.float32),
            jax.ShapeDtypeStruct((Hd, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ],
        grid=(B, nT),
        in_specs=[
            pl.BlockSpec((1, T, D), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, D), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
            par(1, D), par(1, D), par(D, Hd), par(1, Hd), par(Hd, D),
        ],
        out_specs=[
            pl.BlockSpec((1, T, D), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
            par(D, Hd), par(1, Hd), par(Hd, D), par(1, D), par(1, D), par(1, D),
        ],
        interpret=interpret,
    )(x, g, vec(ln_scale), vec(ln_bias), w1.astype(cd), vec(b1), w2.astype(cd))
    dx, dw1, db1, dw2, db2, ds, dbn = outs
    return (dx, ds[0].astype(ln_scale.dtype), dbn[0].astype(ln_bias.dtype),
            dw1.astype(w1.dtype), db1[0].astype(b1.dtype),
            dw2.astype(w2.dtype), db2[0])


@jax.custom_vjp
def fused_ln_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2):
    """y = fc2(GELU(fc1(LN(x)))) in one kernel pass; residual stays outside."""
    interp = jax.default_backend() != "tpu"
    return _mlp_pallas(x, ln_scale, ln_bias, w1, b1, w2, b2, interpret=interp)


def _mlp_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2):
    return fused_ln_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2), (
        x, ln_scale, ln_bias, w1, b1, w2, b2)


def _mlp_bwd(res, g):
    x, ln_scale, ln_bias, w1, b1, w2, b2 = res
    interp = jax.default_backend() != "tpu"
    dx, ds, dbn, dw1, db1, dw2, db2 = _mlp_bwd_pallas(
        x, g.astype(x.dtype), ln_scale, ln_bias, w1, b1, w2, interpret=interp)
    return dx, ds, dbn, dw1, db1, dw2, db2.astype(b2.dtype)


fused_ln_mlp.defvjp(_mlp_fwd, _mlp_bwd)


# ---------------------------------------------------------------------------
# LN + multi-scale depthwise FFN (MultiScaleDecoderBlock)
#
# hidden = fc1(LN(x)); hidden += dw3(hidden) + dw5(hidden) + dw7(hidden);
# y = fc2(GELU(hidden)).  The depthwise convs need a 3-row halo, provided by
# reading the previous/next row-blocks (clamped at the edges and masked to
# zero, which reproduces SAME zero padding).
# ---------------------------------------------------------------------------


def _dwms_kernel(hi, Tr, H, W, Hc, x0_ref, x1_ref, x2_ref, s_ref, b_ref, w1_ref, b1_ref,
                 k3_ref, c3_ref, k5_ref, c5_ref, k7_ref, c7_ref, w2_ref, b2_ref,
                 out_ref):
    prec = jax.lax.Precision.HIGHEST if hi else jax.lax.Precision.DEFAULT
    t = pl.program_id(1)
    f32 = jnp.float32
    D = x1_ref.shape[-1]
    Hd = w1_ref.shape[-1]
    # (Tr + 6, W, D) extended tile: 3 halo rows each side from the neighbours
    xe = jnp.concatenate(
        [x0_ref[0, Tr - 3 :], x1_ref[0], x2_ref[0, :3]], axis=0
    ).astype(f32)
    y = _ln(xe, s_ref[...].astype(f32), b_ref[...].astype(f32))
    y = y.reshape((Tr + 6) * W, D).astype(x1_ref.dtype)
    # rows outside the image are zero (conv SAME zero padding in hidden space)
    grow = jax.lax.broadcasted_iota(jnp.int32, ((Tr + 6) * W, 1), 0) // W + t * Tr - 3
    rmask = (grow >= 0) & (grow < H)
    # chunk the hidden dim so per-chunk fp32 tiles stay inside scoped VMEM;
    # weights stay resident (constant index maps), traffic is unchanged
    out = jnp.zeros((Tr * W, D), f32) + b2_ref[...].astype(f32)
    for c0 in range(0, Hd, Hc):
        h = jax.lax.dot_general(
            y, w1_ref[:, c0 : c0 + Hc], (((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=prec,
        ) + b1_ref[0, c0 : c0 + Hc].astype(f32)
        h = jnp.where(rmask, h, 0.0).reshape(Tr + 6, W, Hc)
        zc = jnp.zeros((Tr + 6, 3, Hc), f32)
        hp = jnp.concatenate([zc, h, zc], axis=1)  # (Tr+6, W+6, Hc)
        # identity + three depthwise convs (+ their biases) over the hidden map
        acc = hp[3 : 3 + Tr, 3 : 3 + W] \
            + c3_ref[0, c0 : c0 + Hc].astype(f32) \
            + c5_ref[0, c0 : c0 + Hc].astype(f32) \
            + c7_ref[0, c0 : c0 + Hc].astype(f32)
        for K, k_ref in ((3, k3_ref), (5, k5_ref), (7, k7_ref)):
            off = 3 - K // 2
            for i in range(K):
                for j in range(K):
                    w = k_ref[i, j, c0 : c0 + Hc].astype(f32)  # (Hc,)
                    acc = acc + w * hp[off + i : off + i + Tr, off + j : off + j + W]
        out = out + jax.lax.dot_general(
            _gelu_exact(acc).reshape(Tr * W, Hc).astype(x1_ref.dtype),
            w2_ref[c0 : c0 + Hc, :], (((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=prec,
        )
    out_ref[0] = out.reshape(Tr, W, D).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "row_chunk", "hidden_chunk"))
def _dwms_pallas(x, ln_scale, ln_bias, w1, b1, k3, c3, k5, c5, k7, c7, w2, b2,
                 interpret=False, row_chunk=0, hidden_chunk=0):
    B, H, W, D = x.shape
    Hd = w1.shape[1]
    Tr = row_chunk or _row_chunk_mlp(H, W, Hd)
    nT = H // Tr
    cd = x.dtype
    vec = lambda v: v.astype(jnp.float32)[None, :]
    par = lambda *s: pl.BlockSpec(s, lambda b, t: (0,) * len(s), memory_space=pltpu.VMEM)
    xspec = lambda f: pl.BlockSpec((1, Tr, W, D), lambda b, t: (b, f(t), 0, 0),
                                   memory_space=pltpu.VMEM)
    return _vcall(
        functools.partial(_dwms_kernel, x.dtype == jnp.float32, Tr, H, W,
                          hidden_chunk or _hidden_chunk(Hd)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, D), x.dtype),
        grid=(B, nT),
        in_specs=[
            xspec(lambda t: jnp.maximum(t - 1, 0)),
            xspec(lambda t: t),
            xspec(lambda t: jnp.minimum(t + 1, nT - 1)),
            par(1, D), par(1, D), par(D, Hd), par(1, Hd),
            par(3, 3, Hd), par(1, Hd), par(5, 5, Hd), par(1, Hd),
            par(7, 7, Hd), par(1, Hd), par(Hd, D), par(1, D),
        ],
        out_specs=pl.BlockSpec((1, Tr, W, D), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, x, x, vec(ln_scale), vec(ln_bias), w1.astype(cd), vec(b1),
      k3.reshape(3, 3, Hd).astype(cd), vec(c3), k5.reshape(5, 5, Hd).astype(cd),
      vec(c5), k7.reshape(7, 7, Hd).astype(cd), vec(c7), w2.astype(cd), vec(b2))


def _row_chunk_grid(H: int, W: int, Hc: int) -> int:
    """Rows per block for the GRID-chunked forward: only ONE hidden chunk's
    temps are live per invocation, so the ~600K-element envelope buys much
    taller tiles — at 96px/Hc=256 Tr goes 4 -> 16, cutting the 6-row-halo
    LN+fc1 redundancy from 2.5x to 1.4x."""
    budget = 600_000 // ((W + 6) * Hc)
    best = 0
    for tr in range(2, H + 1, 2):
        if H % tr == 0 and tr + 6 <= budget:
            best = tr
    return best


def _dwms_kernel2(hi, Tr, H, W, x0_ref, x1_ref, x2_ref, s_ref, b_ref, w1_ref,
                  b1_ref, k3_ref, c3_ref, k5_ref, c5_ref, k7_ref, c7_ref,
                  w2_ref, b2_ref, out_ref, acc_ref):
    """One hidden chunk (grid axis 2) of LN+fc1+ms-conv+GELU+fc2.  The x
    blocks' index maps ignore the chunk axis (VMEM-resident across chunks);
    the output accumulates in fp32 scratch and lands once at the last chunk."""
    prec = jax.lax.Precision.HIGHEST if hi else jax.lax.Precision.DEFAULT
    t = pl.program_id(1)
    c = pl.program_id(2)
    nC = pl.num_programs(2)
    f32 = jnp.float32
    D = x1_ref.shape[-1]
    Hc = w1_ref.shape[-1]
    xe = jnp.concatenate(
        [x0_ref[0, Tr - 3 :], x1_ref[0], x2_ref[0, :3]], axis=0
    ).astype(f32)
    y = _ln(xe, s_ref[...].astype(f32), b_ref[...].astype(f32))
    y = y.reshape((Tr + 6) * W, D).astype(x1_ref.dtype)
    grow = jax.lax.broadcasted_iota(jnp.int32, ((Tr + 6) * W, 1), 0) // W + t * Tr - 3
    rmask = (grow >= 0) & (grow < H)

    @pl.when(c == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref) + b2_ref[...].astype(f32)

    h = jax.lax.dot_general(
        y, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=f32, precision=prec,
    ) + b1_ref[...].astype(f32)
    h = jnp.where(rmask, h, 0.0).reshape(Tr + 6, W, Hc)
    zc = jnp.zeros((Tr + 6, 3, Hc), f32)
    hp = jnp.concatenate([zc, h, zc], axis=1)  # (Tr+6, W+6, Hc)
    acc = hp[3 : 3 + Tr, 3 : 3 + W] \
        + c3_ref[...].astype(f32) + c5_ref[...].astype(f32) + c7_ref[...].astype(f32)
    for K, k_ref in ((3, k3_ref), (5, k5_ref), (7, k7_ref)):
        off = 3 - K // 2
        for i in range(K):
            for j in range(K):
                w = k_ref[i, j].astype(f32)  # (Hc,)
                acc = acc + w * hp[off + i : off + i + Tr, off + j : off + j + W]
    acc_ref[...] += jax.lax.dot_general(
        _gelu_exact(acc).reshape(Tr * W, Hc).astype(x1_ref.dtype),
        w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=f32, precision=prec,
    )

    @pl.when(c == nC - 1)
    def _():
        out_ref[0] = acc_ref[...].reshape(Tr, W, D).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "row_chunk", "hidden_chunk"))
def _dwms_pallas2(x, ln_scale, ln_bias, w1, b1, k3, c3, k5, c5, k7, c7, w2, b2,
                  interpret=False, row_chunk=0, hidden_chunk=0):
    B, H, W, D = x.shape
    Hd = w1.shape[1]
    Hc = hidden_chunk or min(Hd, 256)
    Tr = row_chunk or _row_chunk_grid(H, W, Hc)
    nT = H // Tr
    nC = Hd // Hc
    cd = x.dtype
    vec = lambda v: v.astype(jnp.float32)[None, :]
    par = lambda *s: pl.BlockSpec(s, lambda b, t, c: (0,) * len(s),
                                  memory_space=pltpu.VMEM)
    parc = lambda *s: pl.BlockSpec(s, lambda b, t, c: (0,) * (len(s) - 1) + (c,),
                                   memory_space=pltpu.VMEM)
    xspec = lambda f: pl.BlockSpec((1, Tr, W, D), lambda b, t, c: (b, f(t), 0, 0),
                                   memory_space=pltpu.VMEM)
    return _vcall(
        functools.partial(_dwms_kernel2, x.dtype == jnp.float32, Tr, H, W),
        out_shape=jax.ShapeDtypeStruct((B, H, W, D), x.dtype),
        grid=(B, nT, nC),
        in_specs=[
            xspec(lambda t: jnp.maximum(t - 1, 0)),
            xspec(lambda t: t),
            xspec(lambda t: jnp.minimum(t + 1, nT - 1)),
            par(1, D), par(1, D), parc(D, Hc), parc(1, Hc),
            parc(3, 3, Hc), parc(1, Hc), parc(5, 5, Hc), parc(1, Hc),
            parc(7, 7, Hc), parc(1, Hc),
            pl.BlockSpec((Hc, D), lambda b, t, c: (c, 0), memory_space=pltpu.VMEM),
            par(1, D),
        ],
        out_specs=pl.BlockSpec((1, Tr, W, D), lambda b, t, c: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((Tr * W, D), jnp.float32)],
        interpret=interpret,
    )(x, x, x, vec(ln_scale), vec(ln_bias), w1.astype(cd), vec(b1),
      k3.reshape(3, 3, Hd).astype(cd), vec(c3), k5.reshape(5, 5, Hd).astype(cd),
      vec(c5), k7.reshape(7, 7, Hd).astype(cd), vec(c7), w2.astype(cd), vec(b2))


def composed_ln_dwmsmlp(x, ln_scale, ln_bias, w1, b1, k3, c3, k5, c5, k7, c7, w2, b2):
    """XLA oracle (and VJP path), fp32 internals matching the kernel."""
    f32 = jnp.float32
    B, H, W, D = x.shape
    Hd = w1.shape[1]
    y = _ln(x.astype(f32), ln_scale.astype(f32), ln_bias.astype(f32))
    h = (y.astype(x.dtype) @ w1.astype(x.dtype)).astype(f32) + b1.astype(f32)
    acc = h
    for K, k, c in ((3, k3, c3), (5, k5, c5), (7, k7, c7)):
        dn = jax.lax.conv_dimension_numbers(h.shape, (K, K, 1, Hd), ("NHWC", "HWIO", "NHWC"))
        conv = jax.lax.conv_general_dilated(
            h, k.astype(f32), (1, 1), "SAME", dimension_numbers=dn,
            feature_group_count=Hd)
        acc = acc + conv + c.astype(f32)
    o = (_gelu_exact(acc).astype(x.dtype) @ w2.astype(x.dtype)).astype(f32) + b2.astype(f32)
    return o.astype(x.dtype)


# --- native DWMS backward -------------------------------------------------


def _bwd_tiles(H: int, W: int, hidden: int) -> tuple:
    """(rows per block, hidden chunk) for the adjoint kernel: needs a 6-row
    halo from ONE neighbour block (Tr >= 6); the backward picks its own
    hidden chunk (smaller than the forward's 512) because its live set is
    ~2x the forward's — larger chunks preferred (fewer dw-block revisits)."""
    for hc in (512, 256, 128):
        if hidden % hc:
            continue
        budget = 300_000 // ((W + 6) * hc)
        best = 0
        for tr in range(6, H + 1, 2):
            if H % tr == 0 and tr + 12 <= budget:
                best = tr
        if best:
            return best, hc
    return 0, 0


def dwms_bwd_native_ok(H: int, W: int, d: int, hidden: int, dtype) -> bool:
    # the extended fp32 x/g tiles scale with d; d<=256 measured safe
    return (W % 8 == 0 and d <= 256 and jnp.dtype(dtype).itemsize == 2
            and _bwd_tiles(H, W, hidden)[0] >= 6)


def _dwms_bwd_kernel(hi, Tr, H, W, Hc, x0, x1, x2, g0, g1, g2, s_ref, bn_ref,
                     w1_ref, b1_ref, k3_ref, c3_ref, k5_ref, c5_ref, k7_ref,
                     c7_ref, w2_ref, dx_ref, dw1_ref, db1_ref, dk3_ref, dc3_ref,
                     dk5_ref, dc5_ref, dk7_ref, dc7_ref, dw2_ref, db2_ref,
                     ds_ref, dbn_ref, dxf_acc):
    """One hidden chunk (grid axis 2) of the LN+fc1+multi-scale-conv+GELU+fc2
    adjoint.  The resident x/g blocks' index maps ignore the chunk axis, so
    Mosaic keeps them in VMEM across chunks; dxf accumulates in fp32 scratch
    and the LN adjoint lands once at the last chunk."""
    prec = jax.lax.Precision.HIGHEST if hi else jax.lax.Precision.DEFAULT
    f32 = jnp.float32
    cd = x1.dtype
    t = pl.program_id(1)
    c = pl.program_id(2)
    nC = pl.num_programs(2)
    # All grad accumulators are FULL-width refs with constant index maps:
    # Mosaic does NOT preserve output-block contents across non-consecutive
    # revisits (hardware-verified), so chunk-keyed blocks lose their sums.
    # Constant-map refs stay VMEM-resident for the whole grid; each chunk
    # accumulates into its pl.ds slice.
    cs = pl.multiple_of(c * Hc, 128)
    first = (pl.program_id(0) == 0) & (t == 0) & (c == 0)

    @pl.when(first)
    def _():
        for r in (dw1_ref, db1_ref, dk3_ref, dc3_ref, dk5_ref, dc5_ref,
                  dk7_ref, dc7_ref, dw2_ref, db2_ref, ds_ref, dbn_ref):
            r[...] = jnp.zeros_like(r)

    @pl.when(c == 0)
    def _():
        dxf_acc[...] = jnp.zeros_like(dxf_acc)

    D = x1.shape[-1]
    # extended tiles: x rows [tTr-6, tTr+Tr+6), g rows [tTr-3, tTr+Tr+3)
    xe = jnp.concatenate([x0[0, Tr - 6 :], x1[0], x2[0, :6]], axis=0).astype(f32)
    ge = jnp.concatenate([g0[0, Tr - 3 :], g1[0], g2[0, :3]], axis=0).astype(f32)
    s = s_ref[...].astype(f32)
    mean = jnp.mean(xe, axis=-1, keepdims=True)
    var = jnp.mean((xe - mean) ** 2, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + 1e-5)
    xn = (xe - mean) * rstd
    ye = (xn * s + bn_ref[...].astype(f32)).reshape((Tr + 12) * W, D).astype(cd)
    xrow = jax.lax.broadcasted_iota(jnp.int32, ((Tr + 12) * W, 1), 0) // W + t * Tr - 6
    xmask = (xrow >= 0) & (xrow < H)
    grow = jax.lax.broadcasted_iota(jnp.int32, ((Tr + 6) * W, 1), 0) // W + t * Tr - 3
    gmask = (grow >= 0) & (grow < H)

    h = jax.lax.dot_general(ye, w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=f32, precision=prec) \
        + b1_ref[...].astype(f32)
    h = jnp.where(xmask, h, 0.0).reshape(Tr + 12, W, Hc)
    zc = jnp.zeros((Tr + 12, 3, Hc), f32)
    hp = jnp.concatenate([zc, h, zc], axis=1)  # (Tr+12, W+6, Hc)

    # acc on the mid rows (image rows tTr-3 .. tTr+Tr+2)
    acc = hp[3 : 3 + Tr + 6, 3 : 3 + W] \
        + c3_ref[...].astype(f32) + c5_ref[...].astype(f32) + c7_ref[...].astype(f32)
    for K, k_ref in ((3, k3_ref), (5, k5_ref), (7, k7_ref)):
        off = 3 - K // 2
        for i in range(K):
            for j in range(K):
                w = k_ref[i, j].astype(f32)
                acc = acc + w * hp[off + i : off + i + Tr + 6, off + j : off + j + W]

    gw2 = jax.lax.dot_general(
        jnp.where(gmask, ge.reshape((Tr + 6) * W, D), 0.0).astype(cd), w2_ref[...],
        (((1,), (1,)), ((), ())), preferred_element_type=f32, precision=prec,
    ).reshape(Tr + 6, W, Hc)
    accrow = jax.lax.broadcasted_iota(jnp.int32, (Tr + 6, 1, 1), 0) + t * Tr - 3
    accmask = (accrow >= 0) & (accrow < H)
    dacc = jnp.where(accmask, _gelu_grad(acc) * gw2, 0.0)  # (Tr+6, W, Hc)

    # fc2 grads over the central rows
    g_c = g1[0].reshape(Tr * W, D).astype(cd)
    hg_c = _gelu_exact(acc[3 : 3 + Tr]).reshape(Tr * W, Hc).astype(cd)
    dw2_ref[pl.ds(cs, Hc), :] += jax.lax.dot_general(
        hg_c, g_c, (((0,), (0,)), ((), ())),
        preferred_element_type=f32, precision=prec)

    @pl.when(c == 0)
    def _():
        db2_ref[...] += jnp.sum(g1[0].astype(f32).reshape(Tr * W, D), axis=0,
                                keepdims=True)

    # conv adjoints: dh central = dacc + sum_k corr(flipped k, dacc)
    zc2 = jnp.zeros((Tr + 6, 3, Hc), f32)
    daccp = jnp.concatenate([zc2, dacc, zc2], axis=1)  # (Tr+6, W+6, Hc)
    dacc_c = dacc[3 : 3 + Tr]  # central dacc, reused for weight/bias grads
    dh = dacc_c
    for K, k_ref, dk_ref, dc_ref in ((3, k3_ref, dk3_ref, dc3_ref),
                                     (5, k5_ref, dk5_ref, dc5_ref),
                                     (7, k7_ref, dk7_ref, dc7_ref)):
        roff = 3 + K // 2
        taps = []
        for i in range(K):
            for j in range(K):
                dh = dh + k_ref[i, j].astype(f32) \
                    * daccp[roff - i : roff - i + Tr, roff - j : roff - j + W]
                # weight grad: central dacc x shifted h
                hoff_r = 6 - K // 2 + i
                hoff_c = 3 - K // 2 + j
                taps.append(jnp.sum(
                    dacc_c * hp[hoff_r : hoff_r + Tr, hoff_c : hoff_c + W],
                    axis=(0, 1)))
        dk_ref[:, pl.ds(cs, Hc)] += jnp.stack(taps)  # (K*K, Hc) rows
        dc_ref[:, pl.ds(cs, Hc)] += jnp.sum(dacc_c, axis=(0, 1))[None]

    # fc1 adjoint
    dh2 = dh.reshape(Tr * W, Hc)
    dhc = dh2.astype(cd)
    y_c = ye.reshape(Tr + 12, W, D)[6 : 6 + Tr].reshape(Tr * W, D)
    dw1_ref[:, pl.ds(cs, Hc)] += jax.lax.dot_general(
        y_c, dhc, (((0,), (0,)), ((), ())),
        preferred_element_type=f32, precision=prec)
    db1_ref[:, pl.ds(cs, Hc)] += jnp.sum(dh2, axis=0, keepdims=True)
    dxf_acc[...] += jax.lax.dot_general(dhc, w1_ref[...], (((1,), (1,)), ((), ())),
                                        preferred_element_type=f32, precision=prec)

    @pl.when(c == nC - 1)
    def _():
        dxf = dxf_acc[...]
        xn_c = xn[6 : 6 + Tr].reshape(Tr * W, D)
        rstd_c = rstd[6 : 6 + Tr].reshape(Tr * W, 1)
        ds_ref[...] += jnp.sum(dxf * xn_c, axis=0, keepdims=True)
        dbn_ref[...] += jnp.sum(dxf, axis=0, keepdims=True)
        dxn = dxf * s
        dx = rstd_c * (dxn - jnp.mean(dxn, axis=-1, keepdims=True)
                       - xn_c * jnp.mean(dxn * xn_c, axis=-1, keepdims=True))
        dx_ref[0] = dx.reshape(Tr, W, D).astype(dx_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "row_chunk"))
def _dwms_bwd_pallas(x, g, ln_scale, ln_bias, w1, b1, k3, c3, k5, c5, k7, c7, w2,
                     interpret=False, row_chunk=None):
    B, H, W, D = x.shape
    Hd = w1.shape[1]
    if row_chunk:
        Tr, Hc = row_chunk, min(Hd, 128)
    else:
        Tr, Hc = _bwd_tiles(H, W, Hd)
    nC = Hd // Hc
    nT = H // Tr
    cd = x.dtype
    vec = lambda v: v.astype(jnp.float32)[None, :]
    par = lambda *s: pl.BlockSpec(s, lambda b, t, c: (0,) * len(s),
                                  memory_space=pltpu.VMEM)
    parc = lambda *s: pl.BlockSpec(s, lambda b, t, c: (0,) * (len(s) - 1) + (c,),
                                   memory_space=pltpu.VMEM)
    xspec = lambda f: pl.BlockSpec((1, Tr, W, D), lambda b, t, c: (b, f(t), 0, 0),
                                   memory_space=pltpu.VMEM)
    outs = _vcall(
        functools.partial(_dwms_bwd_kernel, cd == jnp.float32, Tr, H, W, Hc),
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W, D), cd),       # dx
            jax.ShapeDtypeStruct((D, Hd), jnp.float32),   # dw1
            jax.ShapeDtypeStruct((1, Hd), jnp.float32),   # db1
            jax.ShapeDtypeStruct((9, Hd), jnp.float32),   # dk3 (rows = i*3+j)
            jax.ShapeDtypeStruct((1, Hd), jnp.float32),
            jax.ShapeDtypeStruct((25, Hd), jnp.float32),  # dk5
            jax.ShapeDtypeStruct((1, Hd), jnp.float32),
            jax.ShapeDtypeStruct((49, Hd), jnp.float32),  # dk7
            jax.ShapeDtypeStruct((1, Hd), jnp.float32),
            jax.ShapeDtypeStruct((Hd, D), jnp.float32),   # dw2
            jax.ShapeDtypeStruct((1, D), jnp.float32),    # db2
            jax.ShapeDtypeStruct((1, D), jnp.float32),    # ds
            jax.ShapeDtypeStruct((1, D), jnp.float32),    # dbn
        ],
        grid=(B, nT, nC),
        in_specs=[
            xspec(lambda t: jnp.maximum(t - 1, 0)),
            xspec(lambda t: t),
            xspec(lambda t: jnp.minimum(t + 1, nT - 1)),
            pl.BlockSpec((1, Tr, W, D),
                         lambda b, t, c: (b, jnp.maximum(t - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tr, W, D), lambda b, t, c: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tr, W, D),
                         lambda b, t, c: (b, jnp.minimum(t + 1, nT - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            par(1, D), par(1, D),
            parc(D, Hc), parc(1, Hc),
            parc(3, 3, Hc), parc(1, Hc), parc(5, 5, Hc), parc(1, Hc),
            parc(7, 7, Hc), parc(1, Hc),
            pl.BlockSpec((Hc, D), lambda b, t, c: (c, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Tr, W, D), lambda b, t, c: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            par(D, Hd), par(1, Hd),
            par(9, Hd), par(1, Hd), par(25, Hd), par(1, Hd),
            par(49, Hd), par(1, Hd),
            par(Hd, D),
            par(1, D), par(1, D), par(1, D),
        ],
        scratch_shapes=[pltpu.VMEM((Tr * W, D), jnp.float32)],
        interpret=interpret,
    )(x, x, x, g, g, g, vec(ln_scale), vec(ln_bias), w1.astype(cd), vec(b1),
      k3.reshape(3, 3, Hd).astype(cd), vec(c3), k5.reshape(5, 5, Hd).astype(cd),
      vec(c5), k7.reshape(7, 7, Hd).astype(cd), vec(c7), w2.astype(cd))
    (dx, dw1, db1, dk3, dc3, dk5, dc5, dk7, dc7, dw2, db2, ds, dbn) = outs
    return (dx, ds[0].astype(ln_scale.dtype), dbn[0].astype(ln_bias.dtype),
            dw1.astype(w1.dtype), db1[0].astype(b1.dtype),
            dk3.reshape(k3.shape).astype(k3.dtype), dc3[0].astype(c3.dtype),
            dk5.reshape(k5.shape).astype(k5.dtype), dc5[0].astype(c5.dtype),
            dk7.reshape(k7.shape).astype(k7.dtype), dc7[0].astype(c7.dtype),
            dw2.astype(w2.dtype), db2[0])


@jax.custom_vjp
def fused_ln_dwmsmlp(x, ln_scale, ln_bias, w1, b1, k3, c3, k5, c5, k7, c7, w2, b2):
    """y = fc2(GELU(h + dw3(h) + dw5(h) + dw7(h))), h = fc1(LN(x)) — one kernel."""
    interp = jax.default_backend() != "tpu"
    return _dwms_pallas(x, ln_scale, ln_bias, w1, b1, k3, c3, k5, c5, k7, c7, w2, b2,
                        interpret=interp)


def _dwms_fwd(*args):
    return fused_ln_dwmsmlp(*args), args


def _dwms_bwd(res, g):
    x, ln_scale, ln_bias, w1, b1, k3, c3, k5, c5, k7, c7, w2, b2 = res
    B, H, W, D = x.shape
    Hd = w1.shape[1]
    force = jax.default_backend() != "tpu"
    if dwms_bwd_native_ok(H, W, D, Hd, x.dtype) or (force and H % 6 == 0):
        out = _dwms_bwd_pallas(x, g.astype(x.dtype), ln_scale, ln_bias, w1, b1,
                               k3, c3, k5, c5, k7, c7, w2, interpret=force)
        return (*out[:12], out[12].astype(b2.dtype))
    _, vjp = jax.vjp(composed_ln_dwmsmlp, *res)
    return vjp(g)


fused_ln_dwmsmlp.defvjp(_dwms_fwd, _dwms_bwd)


# ---------------------------------------------------------------------------
# LN + depthwise-conv FFN chain (PVTv2's DWConvMlp: fc1 -> dw3x3 -> GELU ->
# fc2, pvtv2_encoder.py:19-54 — the conv REPLACES the hidden, no identity sum)
# ---------------------------------------------------------------------------


def _row_chunk_dw(H: int, W: int, hidden: int) -> int:
    """Rows per block for the single-conv chain: one 3x3 conv => 9 unrolled
    tap temps (vs the multi-scale kernel's 83), so the envelope is looser."""
    budget = 1_500_000 // ((W + 2) * _hidden_chunk(hidden))
    best = 0
    for tr in range(2, H + 1, 2):
        if H % tr == 0 and tr + 2 <= budget:
            best = tr
    return best


def dwmlp_fusable(H: int, W: int, d: int, hidden: int, dtype, force=False) -> bool:
    return (
        d % 8 == 0 and hidden % 128 == 0
        and (force or jnp.dtype(dtype).itemsize == 2)
        and _weight_bytes(d, hidden, dtype) <= _WEIGHT_BUDGET
        and W % 8 == 0
        and _row_chunk_dw(H, W, hidden) >= 2
    )


def _dwmlp_kernel(hi, Tr, H, W, Hc, eps, x0_ref, x1_ref, x2_ref, s_ref, b_ref,
                  w1_ref, b1_ref, k3_ref, c3_ref, w2_ref, b2_ref, out_ref):
    prec = jax.lax.Precision.HIGHEST if hi else jax.lax.Precision.DEFAULT
    t = pl.program_id(1)
    f32 = jnp.float32
    D = x1_ref.shape[-1]
    Hd = w1_ref.shape[-1]
    # (Tr + 2, W, D) extended tile: 1 halo row each side from the neighbours
    xe = jnp.concatenate(
        [x0_ref[0, Tr - 1 :], x1_ref[0], x2_ref[0, :1]], axis=0
    ).astype(f32)
    y = _ln(xe, s_ref[...].astype(f32), b_ref[...].astype(f32), eps)
    y = y.reshape((Tr + 2) * W, D).astype(x1_ref.dtype)
    grow = jax.lax.broadcasted_iota(jnp.int32, ((Tr + 2) * W, 1), 0) // W + t * Tr - 1
    rmask = (grow >= 0) & (grow < H)
    out = jnp.zeros((Tr * W, D), f32) + b2_ref[...].astype(f32)
    for c0 in range(0, Hd, Hc):
        h = jax.lax.dot_general(
            y, w1_ref[:, c0 : c0 + Hc], (((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=prec,
        ) + b1_ref[0, c0 : c0 + Hc].astype(f32)
        h = jnp.where(rmask, h, 0.0).reshape(Tr + 2, W, Hc)
        zc = jnp.zeros((Tr + 2, 1, Hc), f32)
        hp = jnp.concatenate([zc, h, zc], axis=1)  # (Tr+2, W+2, Hc)
        acc = c3_ref[0, c0 : c0 + Hc].astype(f32) + jnp.zeros((Tr, W, Hc), f32)
        for i in range(3):
            for j in range(3):
                w = k3_ref[i, j, c0 : c0 + Hc].astype(f32)  # (Hc,)
                acc = acc + w * hp[i : i + Tr, j : j + W]
        out = out + jax.lax.dot_general(
            _gelu_exact(acc).reshape(Tr * W, Hc).astype(x1_ref.dtype),
            w2_ref[c0 : c0 + Hc, :], (((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=prec,
        )
    out_ref[0] = out.reshape(Tr, W, D).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def _dwmlp_pallas(x, ln_scale, ln_bias, w1, b1, k3, c3, w2, b2, eps,
                  interpret=False):
    B, H, W, D = x.shape
    Hd = w1.shape[1]
    Tr = _row_chunk_dw(H, W, Hd)
    nT = H // Tr
    cd = x.dtype
    vec = lambda v: v.astype(jnp.float32)[None, :]
    par = lambda *s: pl.BlockSpec(s, lambda b, t: (0,) * len(s), memory_space=pltpu.VMEM)
    xspec = lambda f: pl.BlockSpec((1, Tr, W, D), lambda b, t: (b, f(t), 0, 0),
                                   memory_space=pltpu.VMEM)
    return _vcall(
        functools.partial(_dwmlp_kernel, x.dtype == jnp.float32, Tr, H, W,
                          _hidden_chunk(Hd), eps),
        out_shape=jax.ShapeDtypeStruct((B, H, W, D), x.dtype),
        grid=(B, nT),
        in_specs=[
            xspec(lambda t: jnp.maximum(t - 1, 0)),
            xspec(lambda t: t),
            xspec(lambda t: jnp.minimum(t + 1, nT - 1)),
            par(1, D), par(1, D), par(D, Hd), par(1, Hd),
            par(3, 3, Hd), par(1, Hd), par(Hd, D), par(1, D),
        ],
        out_specs=pl.BlockSpec((1, Tr, W, D), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, x, x, vec(ln_scale), vec(ln_bias), w1.astype(cd), vec(b1),
      k3.reshape(3, 3, Hd).astype(cd), vec(c3), w2.astype(cd), vec(b2))


def composed_ln_dwmlp(x, ln_scale, ln_bias, w1, b1, k3, c3, w2, b2, eps=1e-6):
    """XLA oracle (and VJP path), fp32 internals matching the kernel."""
    f32 = jnp.float32
    B, H, W, D = x.shape
    Hd = w1.shape[1]
    y = _ln(x.astype(f32), ln_scale.astype(f32), ln_bias.astype(f32), eps)
    h = (y.astype(x.dtype) @ w1.astype(x.dtype)).astype(f32) + b1.astype(f32)
    dn = jax.lax.conv_dimension_numbers(h.shape, (3, 3, 1, Hd), ("NHWC", "HWIO", "NHWC"))
    h = jax.lax.conv_general_dilated(
        h, k3.astype(f32), (1, 1), "SAME", dimension_numbers=dn,
        feature_group_count=Hd) + c3.astype(f32)
    o = (_gelu_exact(h).astype(x.dtype) @ w2.astype(x.dtype)).astype(f32) + b2.astype(f32)
    return o.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def fused_ln_dwmlp(x, ln_scale, ln_bias, w1, b1, k3, c3, w2, b2, eps):
    """y = fc2(GELU(dw3(fc1(LN(x))))) — PVTv2's conv-chain FFN in one kernel."""
    interp = jax.default_backend() != "tpu"
    return _dwmlp_pallas(x, ln_scale, ln_bias, w1, b1, k3, c3, w2, b2, eps,
                         interpret=interp)


def _dwmlp_fwd(x, ln_scale, ln_bias, w1, b1, k3, c3, w2, b2, eps):
    return (fused_ln_dwmlp(x, ln_scale, ln_bias, w1, b1, k3, c3, w2, b2, eps),
            (x, ln_scale, ln_bias, w1, b1, k3, c3, w2, b2))


def _dwmlp_bwd(eps, res, g):
    _, vjp = jax.vjp(lambda *a: composed_ln_dwmlp(*a, eps), *res)
    return vjp(g)


fused_ln_dwmlp.defvjp(_dwmlp_fwd, _dwmlp_bwd)
