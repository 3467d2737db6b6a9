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
    # raised 32 MB limit that entry points set via utils/jit.tramba_jit
    return hidden if hidden <= 512 else 512


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
    T = _pick_chunk(L, max(8, 131072 // Hd))
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


@jax.custom_vjp
def fused_ln_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2):
    """y = fc2(GELU(fc1(LN(x)))) in one kernel pass; residual stays outside."""
    interp = jax.default_backend() != "tpu"
    return _mlp_pallas(x, ln_scale, ln_bias, w1, b1, w2, b2, interpret=interp)


def _mlp_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2):
    return fused_ln_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2), (
        x, ln_scale, ln_bias, w1, b1, w2, b2)


def _mlp_bwd(res, g):
    _, vjp = jax.vjp(composed_ln_mlp, *res)
    return vjp(g)


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


@jax.custom_vjp
def fused_ln_dwmsmlp(x, ln_scale, ln_bias, w1, b1, k3, c3, k5, c5, k7, c7, w2, b2):
    """y = fc2(GELU(h + dw3(h) + dw5(h) + dw7(h))), h = fc1(LN(x)) — one kernel."""
    interp = jax.default_backend() != "tpu"
    return _dwms_pallas(x, ln_scale, ln_bias, w1, b1, k3, c3, k5, c5, k7, c7, w2, b2,
                        interpret=interp)


def _dwms_fwd(*args):
    return fused_ln_dwmsmlp(*args), args


def _dwms_bwd(res, g):
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
