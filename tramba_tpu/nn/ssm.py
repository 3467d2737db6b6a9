"""SS2D: the 2-D selective-scan operator (flax, NHWC).

Re-design of the reference ``SS2Dv2`` (Models/vmamba.py:18-323): in-projection
-> depthwise 3x3 conv -> SiLU -> K-direction cross scan -> per-direction
Δ/B/C projections -> selective scan (Pallas) -> cross merge -> LayerNorm ->
GELU -> out-projection.  Parameter shapes keep the reference's stacked
(K, ...) layout (vmamba.py:87-112) so checkpoints convert 1:1.
"""

from __future__ import annotations

import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tramba_tpu.nn.layers import LayerNorm, conv_kaiming_init, trunc_normal_init
from tramba_tpu.ops.fused_ss2d import (
    composed_ss2d_core,
    fused_ss2d_core,
    fused_ss2d_freq,
    fused_ss2d_full,
)
from tramba_tpu.ops.fused_prologue import fused_prologue, prologue_fusable
from tramba_tpu.ops.fused_ss2d_small import fused_ss2d_small, smallmap_ok
from tramba_tpu.ops.scan_orders import cross_merge, cross_scan
from tramba_tpu.ops.selective_scan import selective_scan


class _NormParams(nn.Module):
    """Bare LayerNorm parameters (scale, bias) — applied inside fused kernels.

    Named 'out_norm' in SS2D so the checkpoint tree matches nn.LayerNorm's.
    """

    features: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones, (self.features,)),
            self.param("bias", nn.initializers.zeros, (self.features,)),
        )


class _DenseParams(nn.Module):
    """Bare Dense kernel — applied inside fused kernels.

    Named 'out_proj' in SS2D so the checkpoint tree matches nn.Dense's.
    """

    in_features: int
    out_features: int

    @nn.compact
    def __call__(self):
        return self.param("kernel", trunc_normal_init, (self.in_features, self.out_features))

class _Conv2dParams(nn.Module):
    """Bare depthwise-conv kernel — applied inside the fused prologue.

    Named 'conv2d' in SS2D so the checkpoint tree matches nn.Conv's.
    """

    k: int
    features: int

    @nn.compact
    def __call__(self):
        return self.param("kernel", conv_kaiming_init, (self.k, self.k, 1, self.features))


__all__ = ["SS2D"]


def _resolve_hybrid_backend(L: int) -> str:
    """Per-block routing for ``backend='hybrid_tp_sp'`` (3-axis dp x tp x sp).

    Sequence parallelism pays off where sequences are long (the carry
    exchange is O(1) per block vs O(L) local work) and tensor parallelism
    where channels are wide but L is short — so route each SS2D by its own
    L: >= TRAMBA_HYBRID_SP_MIN_L (default 4096, i.e. the 64px+ maps at
    384px inputs) and divisible over the ambient 'seq' axis -> the
    sequence-parallel scan; everything else -> the tensor-parallel core.
    Both ambient meshes must be installed (use_tensor_mesh +
    use_sequence_mesh over one 3-axis mesh); the two shard_maps are
    siblings over the same mesh, never nested."""
    from tramba_tpu.parallel import seq_scan

    min_l = int(os.environ.get("TRAMBA_HYBRID_SP_MIN_L", "4096"))
    cur = getattr(seq_scan._ctx, "mesh", None)
    if cur is not None:
        mesh, axis, _ = cur
        if L >= min_l and L % mesh.shape[axis] == 0:
            return "seq_parallel"
    return "tensor_parallel"


def _dt_bias_init(dt_min=0.001, dt_max=0.1, dt_init_floor=1e-4):
    """softplus^{-1}(dt) with dt ~ LogUniform[dt_min, dt_max] (mamba_init.py:19-27)."""

    def init(key, shape, dtype=jnp.float32):
        u = jax.random.uniform(key, shape, jnp.float32)
        dt = jnp.exp(u * (math.log(dt_max) - math.log(dt_min)) + math.log(dt_min))
        dt = jnp.clip(dt, min=dt_init_floor)
        inv = dt + jnp.log(-jnp.expm1(-dt))
        return inv.astype(dtype)

    return init


def _a_log_init(key, shape, dtype=jnp.float32):
    """S4D real init: A_log[d, n] = log(n+1) (mamba_init.py:34-48)."""
    K, D, N = shape
    a = jnp.log(jnp.arange(1, N + 1, dtype=jnp.float32))
    return jnp.broadcast_to(a, (K, D, N)).astype(dtype)


def _uniform_fan_in(fan_in: int):
    """U(-1/sqrt(fan_in), +1/sqrt(fan_in)) — torch nn.Linear default weight init."""
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class SS2D(nn.Module):
    d_model: int
    d_state: int = 1
    ssm_ratio: float = 2.0
    dt_rank: int = 0  # 0 => ceil(d_model / 16)
    d_conv: int = 3
    conv_bias: bool = False
    bias: bool = False
    k_group: int = 4
    scan_kind: str = "raster"
    scan_param: int = 0
    backend: Optional[str] = None  # selective-scan backend (None => pallas)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, ln=None) -> jnp.ndarray:
        """``ln``: optional (scale, bias) of the block's pre-norm, folded into
        the fused prologue kernel when eligible (applied composed otherwise)."""
        B, H, W, _ = x.shape
        L = H * W
        d_inner = int(self.ssm_ratio * self.d_model)
        R = self.dt_rank or math.ceil(self.d_model / 16)
        N = self.d_state
        K = self.k_group

        backend = self.backend
        if backend == "hybrid_tp_sp":
            backend = _resolve_hybrid_backend(L)
        if backend == "tensor_parallel":
            # d_inner sharded over the ambient 'model' mesh axis (dp x tp x sp
            # story: parallel/tp.py); identical param tree to the other paths
            if N != 1 or self.bias or self.conv_bias or self.d_conv != 3:
                raise ValueError(
                    "tensor_parallel supports the live SS2D config only "
                    "(d_state 1, no in/conv bias, 3x3 depthwise conv)")
            from tramba_tpu.parallel.tp import ss2d_tensor_parallel

            w_in = _DenseParams(self.d_model, d_inner, name="in_proj")()
            conv_k = _Conv2dParams(self.d_conv, d_inner, name="conv2d")()
            x_proj_w = self.param("x_proj_weight", _uniform_fan_in(d_inner), (K, R + 2 * N, d_inner))
            dt_w = self.param("dt_projs_weight", _uniform_fan_in(R), (K, d_inner, R))
            dt_b = self.param("dt_projs_bias", _dt_bias_init(), (K, d_inner))
            A_logs = self.param("A_logs", _a_log_init, (K, d_inner, N))
            Ds = self.param("Ds", nn.initializers.ones, (K, d_inner))
            ln_scale, ln_bias = _NormParams(d_inner, name="out_norm")()
            w_out = _DenseParams(d_inner, self.d_model, name="out_proj")()
            return ss2d_tensor_parallel(x, ln, w_in, conv_k, x_proj_w, dt_w,
                                        dt_b, A_logs, Ds, ln_scale, ln_bias,
                                        w_out, self.scan_kind, H, W,
                                        self.scan_param or 0)

        on_tpu = jax.default_backend() == "tpu"
        kernel_ok = backend == "pallas" or (backend is None and on_tpu)
        small_base = (
            kernel_ok
            and N == 1
            and self.d_conv == 3
            and not self.bias
            and not self.conv_bias
            and ln is not None
        )
        use_small = (small_base and self.scan_kind == "raster" and K == 4
                     and smallmap_ok(H, W, self.d_model, d_inner, self.dtype))
        if use_small:
            # whole-map megakernel: prologue + 4-dir scan + merge + LN/GELU/proj
            w_in = _DenseParams(self.d_model, d_inner, name="in_proj")()
            conv_k = _Conv2dParams(self.d_conv, d_inner, name="conv2d")()
            x_proj_w = self.param("x_proj_weight", _uniform_fan_in(d_inner), (K, R + 2 * N, d_inner))
            dt_w = self.param("dt_projs_weight", _uniform_fan_in(R), (K, d_inner, R))
            dt_b = self.param("dt_projs_bias", _dt_bias_init(), (K, d_inner))
            A_logs = self.param("A_logs", _a_log_init, (K, d_inner, N))
            Ds = self.param("Ds", nn.initializers.ones, (K, d_inner))
            ln_scale, ln_bias = _NormParams(d_inner, name="out_norm")()
            w_out = _DenseParams(d_inner, self.d_model, name="out_proj")()
            y = fused_ss2d_small(x.reshape(B, L, self.d_model), ln[0], ln[1], w_in,
                                 conv_k, x_proj_w, dt_w, dt_b, A_logs, Ds,
                                 ln_scale, ln_bias, w_out, H, W)
            return y.reshape(B, H, W, self.d_model)
        use_prologue = (
            kernel_ok
            and self.d_conv == 3
            and not self.bias
            and not self.conv_bias
            and prologue_fusable(H, W, self.d_model, d_inner, self.dtype,
                                 force=backend == "pallas")
        )
        if use_prologue:
            w_in = _DenseParams(self.d_model, d_inner, name="in_proj")()
            conv_k = _Conv2dParams(self.d_conv, d_inner, name="conv2d")()
            ln_s, ln_b = ln if ln is not None else (None, None)
            x = fused_prologue(x, ln_s, ln_b, w_in, conv_k)
        else:
            if ln is not None:
                xf = x.astype(jnp.float32)
                mean = jnp.mean(xf, axis=-1, keepdims=True)
                var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
                xf = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
                x = (xf * ln[0].astype(jnp.float32) + ln[1].astype(jnp.float32)).astype(x.dtype)
            x = nn.Dense(
                d_inner, use_bias=self.bias, kernel_init=trunc_normal_init, dtype=self.dtype, name="in_proj"
            )(x)
            if self.d_conv > 1:
                x = nn.Conv(
                    d_inner,
                    (self.d_conv, self.d_conv),
                    feature_group_count=d_inner,
                    padding="SAME",
                    use_bias=self.conv_bias,
                    kernel_init=conv_kaiming_init,
                    dtype=self.dtype,
                    name="conv2d",
                )(x)
            x = nn.silu(x)

        # stacked per-direction projection params (reference layout, vmamba.py:87-112)
        x_proj_w = self.param("x_proj_weight", _uniform_fan_in(d_inner), (K, R + 2 * N, d_inner))
        dt_w = self.param("dt_projs_weight", _uniform_fan_in(R), (K, d_inner, R))
        dt_b = self.param("dt_projs_bias", _dt_bias_init(), (K, d_inner))
        A_logs = self.param("A_logs", _a_log_init, (K, d_inner, N))
        Ds = self.param("Ds", nn.initializers.ones, (K, d_inner))

        # backend None: kernels on TPU, composed elsewhere.  backend='pallas':
        # force the kernels even off-TPU (interpret mode — slow, test-only).
        use_folded = (
            N == 1
            and self.scan_kind in ("raster", "line", "dilation", "window")
            and kernel_ok
            and not self.bias  # out_proj bias would need a kernel variant (never used)
            and not (self.scan_kind == "dilation" and L % (self.scan_param or 4) != 0)
        )
        ln_scale, ln_bias = _NormParams(d_inner, name="out_norm")()
        w_out = _DenseParams(d_inner, self.d_model, name="out_proj")()
        if use_folded:
            # direction-folded kernels: scan orders live as index maps /
            # pre-permuted views; merge + LayerNorm + GELU + out proj fused
            if self.scan_kind in ("raster", "line"):
                y = fused_ss2d_full(
                    x.reshape(B, L, d_inner), x_proj_w, dt_w, dt_b, A_logs, Ds,
                    ln_scale, ln_bias, w_out, self.scan_kind, H, W,
                )
            else:
                y = fused_ss2d_freq(
                    x.reshape(B, L, d_inner), x_proj_w, dt_w, dt_b, A_logs, Ds,
                    ln_scale, ln_bias, w_out, self.scan_kind, H, W, self.scan_param or 4,
                )
        else:
            xs = cross_scan(x.reshape(B, L, d_inner), self.scan_kind, H, W, self.scan_param)
            if N == 1 and kernel_ok:
                ys = fused_ss2d_core(xs, x_proj_w, dt_w, dt_b, A_logs, Ds)
            elif N == 1:
                ys = composed_ss2d_core(xs, x_proj_w, dt_w, dt_b, A_logs, Ds, backend=backend)
            else:
                cd = self.dtype
                dbc = jnp.einsum("bkld,kcd->bklc", xs.astype(cd), x_proj_w.astype(cd))
                dts, Bc, Cc = jnp.split(dbc, [R, R + N], axis=-1)
                dts = jnp.einsum("bklr,kdr->bkld", dts, dt_w.astype(cd))
                A = -jnp.exp(A_logs.astype(jnp.float32))
                ys = selective_scan(xs, dts, A, Bc, Cc, Ds, dt_b, backend=backend)
            y = cross_merge(ys, self.scan_kind, H, W, self.scan_param)
            yf = y.astype(jnp.float32)
            mean = jnp.mean(yf, axis=-1, keepdims=True)
            var = jnp.mean((yf - mean) ** 2, axis=-1, keepdims=True)
            yf = (yf - mean) * jax.lax.rsqrt(var + 1e-5)
            yf = yf * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)
            y = nn.gelu(yf, approximate=False).astype(self.dtype)
            y = (y @ w_out.astype(self.dtype)).astype(self.dtype)
            if self.bias:
                y = y + self.param("out_proj_bias", nn.initializers.zeros, (self.d_model,))
        return y.reshape(B, H, W, self.d_model)
