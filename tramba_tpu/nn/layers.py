"""Shared neural building blocks (flax.linen, channels-last NHWC).

TPU-native re-design of ``Models/modules.py``: the reference's channel-first
helpers (``Linear2d``/``LayerNorm2d``, modules.py:10-27) disappear entirely —
NHWC makes them ordinary ``Dense``/``LayerNorm`` over the trailing axis, the
layout XLA:TPU prefers for convs and matmuls.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    "LayerNorm",
    "trunc_normal_init",
    "conv_kaiming_init",
    "DropPath",
    "Mlp",
    "DWConv",
    "DWMSMlp",
    "PatchExpand",
    "FinalPatchExpandX4",
    "FreqExpand2D",
    "pixel_shuffle",
]

# LayerNorm with torch-matching epsilon (torch default 1e-5; flax default 1e-6)
import functools
LayerNorm = functools.partial(nn.LayerNorm, epsilon=1e-5)

# torch trunc_normal_(std=.02) equivalent (VSSMEncoder._init_weights, vmamba.py:459-471)
trunc_normal_init = nn.initializers.truncated_normal(stddev=0.02)


def conv_kaiming_init(key, shape, dtype=jnp.float32):
    """kaiming_normal_(a=1e-2), fan_in, leaky_relu — torch semantics for convs."""
    # shape: (kh, kw, in_per_group, out)
    fan_in = shape[0] * shape[1] * shape[2]
    gain = math.sqrt(2.0 / (1.0 + 1e-2**2))
    std = gain / math.sqrt(fan_in)
    return jax.random.normal(key, shape, dtype) * jnp.asarray(std, dtype)


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm DropPath semantics)."""

    rate: float = 0.0
    deterministic: Optional[bool] = None

    @nn.compact
    def __call__(self, x, deterministic: Optional[bool] = None):
        det = nn.merge_param("deterministic", self.deterministic, deterministic)
        if det or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class Mlp(nn.Module):
    """fc1 -> act -> fc2 (modules.py:134-153)."""

    hidden_features: int
    out_features: Optional[int] = None
    act: Callable = nn.gelu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = self.out_features or x.shape[-1]
        x = nn.Dense(self.hidden_features, kernel_init=trunc_normal_init, dtype=self.dtype, name="fc1")(x)
        x = self.act(x)
        x = nn.Dense(out, kernel_init=trunc_normal_init, dtype=self.dtype, name="fc2")(x)
        return x


class DWConv(nn.Module):
    """Depthwise KxK conv, NHWC (vmamba.py:595-603)."""

    kernel: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        return nn.Conv(
            features=c,
            kernel_size=(self.kernel, self.kernel),
            feature_group_count=c,
            padding="SAME",
            use_bias=self.use_bias,
            kernel_init=conv_kaiming_init,
            dtype=self.dtype,
        )(x)


class DWMSMlp(nn.Module):
    """Multi-scale depthwise-conv FFN: x + DW3 + DW5 + DW7 (vmamba.py:606-629)."""

    hidden_features: int
    out_features: Optional[int] = None
    act: Callable = nn.gelu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = self.out_features or x.shape[-1]
        x = nn.Dense(self.hidden_features, kernel_init=trunc_normal_init, dtype=self.dtype, name="fc1")(x)
        x = x + DWConv(3, dtype=self.dtype, name="dwc3")(x) \
              + DWConv(5, dtype=self.dtype, name="dwc5")(x) \
              + DWConv(7, dtype=self.dtype, name="dwc7")(x)
        x = self.act(x)
        x = nn.Dense(out, kernel_init=trunc_normal_init, dtype=self.dtype, name="fc2")(x)
        return x


def pixel_shuffle(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """NHWC pixel shuffle with the reference's channel-block order.

    Channel index decomposes as (p1, p2, c) — '(p1 p2 c) h w -> c (h p1) (w p2)'
    (modules.py:213/247/691) — i.e. the leading channel blocks become spatial.
    """
    B, H, W, C = x.shape
    c = C // (p * p)
    x = x.reshape(B, H, W, p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # B H p1 W p2 c
    return x.reshape(B, H * p, W * p, c)


class _ExpandParams(nn.Module):
    """Bare Dense-kernel + LN params mirroring the composed modules' tree."""

    fin: int
    fout: int

    @nn.compact
    def __call__(self):
        k = _KernelP(self.fin, self.fout, name="expand")()
        co = self.fout // 4
        s = _NormP(co, name="norm")()
        return k, s


class _KernelP(nn.Module):
    fin: int
    fout: int

    @nn.compact
    def __call__(self):
        return self.param("kernel", trunc_normal_init, (self.fin, self.fout))


class _NormP(nn.Module):
    features: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.features,)),
                self.param("bias", nn.initializers.zeros, (self.features,)))


def _fused_expand_branch(x, factor):
    """Shared fused path for the x2 pixel-shuffle upsamplers; returns None
    when the fused kernel is not eligible (caller composes instead)."""
    from tramba_tpu.ops.fused_expand import expand2_fusable, fused_expand2

    B, H, W, dim = x.shape
    if jax.default_backend() != "tpu" or not expand2_fusable(H, W, dim, factor):
        return None
    k, (s, b) = _ExpandParams(dim, factor * dim)()
    return fused_expand2(x, k, s, b)


class PatchExpand(nn.Module):
    """x2 upsample: Dense(dim->2dim) + pixel shuffle + LN (modules.py:183-221)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        y = _fused_expand_branch(x, 2)
        if y is not None:
            return y
        x = nn.Dense(2 * dim, use_bias=False, kernel_init=trunc_normal_init, dtype=self.dtype, name="expand")(x)
        x = pixel_shuffle(x, 2)
        x = LayerNorm(dtype=self.dtype, name="norm")(x)
        return x


class FinalPatchExpandX4(nn.Module):
    """x4 upsample: Dense(dim->16dim) + pixel shuffle + LN (modules.py:224-274).

    ``pre_shuffle=True`` returns the LN'd (B, h, w, 16, dim) tensor *before*
    the spatial shuffle — exactly equivalent per pixel (the shuffle is a
    permutation and LN acts per pixel), letting per-pixel heads run on the
    16x smaller coarse grid before upsampling their 1-channel output.
    """

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pre_shuffle: bool = False):
        dim = x.shape[-1]
        x = nn.Dense(16 * dim, use_bias=False, kernel_init=trunc_normal_init, dtype=self.dtype, name="expand")(x)
        if pre_shuffle:
            B, h, w, C = x.shape
            x = x.reshape(B, h, w, 16, dim)
            return LayerNorm(dtype=self.dtype, name="norm")(x)
        x = pixel_shuffle(x, 4)
        x = LayerNorm(dtype=self.dtype, name="norm")(x)
        return x


class FreqExpand2D(nn.Module):
    """DFVSS upsampler: Dense(dim->4dim) + x2 pixel shuffle + LN (modules.py:678-696)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        y = _fused_expand_branch(x, 4)
        if y is not None:
            return y
        x = nn.Dense(4 * dim, use_bias=False, kernel_init=trunc_normal_init, dtype=self.dtype, name="expand")(x)
        x = pixel_shuffle(x, 2)
        x = LayerNorm(dtype=self.dtype, name="norm")(x)
        return x
