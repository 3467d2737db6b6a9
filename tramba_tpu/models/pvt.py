"""PVTv2 encoder (flax, NHWC).

Re-design of ``Models/encoder/pvtv2_encoder.py``: overlapping patch embeds,
spatial-reduction attention (sr_ratio per stage), depthwise-conv MLPs.
``pvt_v2_b4``: embed [64, 128, 320, 512], heads [1, 2, 5, 8], mlp ratios
[8, 8, 4, 4], depths [3, 8, 27, 3], sr [8, 4, 2, 1] (pvtv2_encoder.py:433-438).
Returns the four stage maps deepest-first (pvtv2_encoder.py:358).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tramba_tpu.nn.layers import DropPath, trunc_normal_init

__all__ = ["PVTv2Encoder", "pvt_v2_b4_config"]

_dense = lambda f, name, bias=True, dtype=None: nn.Dense(
    f, use_bias=bias, kernel_init=trunc_normal_init, dtype=dtype, name=name)


class _DenseP(nn.Module):
    """Bare Dense kernel+bias (nn.Dense tree) — applied inside fused kernels."""

    fin: int
    fout: int

    @nn.compact
    def __call__(self):
        return (self.param("kernel", trunc_normal_init, (self.fin, self.fout)),
                self.param("bias", nn.initializers.zeros, (self.fout,)))


class _ConvP(nn.Module):
    """Bare depthwise nn.Conv kernel+bias (flax default inits)."""

    k: int
    feat: int

    @nn.compact
    def __call__(self):
        return (self.param("kernel", nn.initializers.lecun_normal(),
                           (self.k, self.k, 1, self.feat)),
                self.param("bias", nn.initializers.zeros, (self.feat,)))


class _NormP(nn.Module):
    features: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.features,)),
                self.param("bias", nn.initializers.zeros, (self.features,)))


def _fused_ok(force: bool = False) -> bool:
    return force or jax.default_backend() == "tpu"


class SRAttention(nn.Module):
    """Spatial-reduction attention (pvtv2_encoder.py:57-116).

    When ``ln`` (the block's pre-norm params) is passed and the fused kernel
    is eligible, LN + q-proj + all-heads attention + out-proj run as ONE
    Pallas kernel (ops/fused_attn.py); only the tiny reduced-K/V path stays
    composed.  Identical parameter tree either way.
    """

    dim: int
    num_heads: int
    sr_ratio: int
    qkv_bias: bool = True
    force_fused: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, H, W, ln=None):
        """``ln=None``: composed path, ``x`` already pre-normed by the caller.
        ``ln=(scale, bias)``: fused path, ``x`` raw — the kernel norms the
        query tiles on the fly; only the tiny reduced path is normed here."""
        from tramba_tpu.ops.fused_attn import fused_sra

        B, N, C = x.shape
        nh = self.num_heads
        hd = C // nh
        if ln is None:
            xn = x
        else:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
            xn = ((xf - mean) * jax.lax.rsqrt(var + 1e-6) * ln[0].astype(jnp.float32)
                  + ln[1].astype(jnp.float32)).astype(x.dtype)
        if self.sr_ratio > 1:
            xr = xn.reshape(B, H, W, C)
            xr = nn.Conv(C, (self.sr_ratio, self.sr_ratio), strides=self.sr_ratio,
                         dtype=self.dtype, name="sr")(xr)
            xr = xr.reshape(B, -1, C)
            xr = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(xr)
        else:
            xr = xn
        kv = _dense(C * 2, "kv", self.qkv_bias, dtype=self.dtype)(xr).reshape(B, -1, 2, nh, hd).transpose(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]
        if ln is not None:
            wq, bq = _DenseP(C, C, name="q")()
            wp, bp = _DenseP(C, C, name="proj")()
            return fused_sra(x, ln[0], ln[1], wq, bq, k, v, wp, bp, nh, 1e-6)
        q = _dense(C, "q", self.qkv_bias, dtype=self.dtype)(xn).reshape(B, N, nh, hd).transpose(0, 2, 1, 3)
        attn = (q @ k.transpose(0, 1, 3, 2)) * (hd**-0.5)
        attn = nn.softmax(attn, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, N, C)
        return _dense(C, "proj", dtype=self.dtype)(out)


class DWConvMlp(nn.Module):
    """fc1 -> dwconv3x3 -> gelu -> fc2 (pvtv2_encoder.py:19-54, 373-384)."""

    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, H, W):
        B, N, C = x.shape
        x = _dense(self.hidden, "fc1", dtype=self.dtype)(x)
        xr = x.reshape(B, H, W, self.hidden)
        xr = nn.Conv(self.hidden, (3, 3), padding=1, feature_group_count=self.hidden,
                     dtype=self.dtype, name="dwconv")(xr)
        x = xr.reshape(B, N, self.hidden)
        x = nn.gelu(x, approximate=False)
        x = _dense(C, "fc2", dtype=self.dtype)(x)
        return x


class _DWMlpP(nn.Module):
    """Bare DWConvMlp params (fc1 / dwconv / fc2 tree) for the fused kernel."""

    d: int
    hidden: int

    @nn.compact
    def __call__(self):
        return (_DenseP(self.d, self.hidden, name="fc1")(),
                _ConvP(3, self.hidden, name="dwconv")(),
                _DenseP(self.hidden, self.d, name="fc2")())


class PVTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float
    sr_ratio: int
    drop_path: float = 0.0
    force_fused: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, H, W, deterministic: bool = True):
        from tramba_tpu.ops.fused_attn import sra_fusable
        from tramba_tpu.ops.fused_mlp import dwmlp_fusable, fused_ln_dwmlp

        B, N, C = x.shape
        Lk = (H // self.sr_ratio) * (W // self.sr_ratio) if self.sr_ratio > 1 else N
        attn = SRAttention(self.dim, self.num_heads, self.sr_ratio,
                           force_fused=self.force_fused, dtype=self.dtype,
                           name="attn")
        if (_fused_ok(self.force_fused)
                and sra_fusable(N, C, self.num_heads, Lk, self.dtype,
                                force=self.force_fused)):
            ln1 = _NormP(C, name="norm1")()
            y = attn(x, H, W, ln=ln1)
        else:
            y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
            y = attn(y, H, W)
        x = x + DropPath(self.drop_path)(y, deterministic)
        hidden = int(self.dim * self.mlp_ratio)
        if (_fused_ok(self.force_fused)
                and dwmlp_fusable(H, W, C, hidden, self.dtype,
                                  force=self.force_fused)):
            ln2 = _NormP(C, name="norm2")()
            (w1, b1), (k3, c3), (w2, b2) = _DWMlpP(C, hidden, name="mlp")()
            y = fused_ln_dwmlp(x.reshape(B, H, W, C), ln2[0], ln2[1],
                               w1, b1, k3, c3, w2, b2, 1e-6).reshape(B, N, C)
        else:
            y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
            y = DWConvMlp(hidden, dtype=self.dtype, name="mlp")(y, H, W)
        x = x + DropPath(self.drop_path)(y, deterministic)
        return x


def pvt_v2_b4_config():
    return dict(embed_dims=(64, 128, 320, 512), num_heads=(1, 2, 5, 8), mlp_ratios=(8, 8, 4, 4),
                depths=(3, 8, 27, 3), sr_ratios=(8, 4, 2, 1), drop_path_rate=0.1)


class PVTv2Encoder(nn.Module):
    embed_dims: Sequence[int] = (64, 128, 320, 512)
    num_heads: Sequence[int] = (1, 2, 5, 8)
    mlp_ratios: Sequence[float] = (8, 8, 4, 4)
    depths: Sequence[int] = (3, 8, 27, 3)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    drop_path_rate: float = 0.1
    force_fused: bool = False  # exercise fused kernels off-TPU (interpret mode)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))
        outs = []
        cur = 0
        for s in range(len(self.depths)):
            patch, stride = (7, 4) if s == 0 else (3, 2)
            x = nn.Conv(self.embed_dims[s], (patch, patch), strides=stride, padding=patch // 2,
                        dtype=self.dtype, name=f"patch_embed{s + 1}")(x)
            B, H, W, C = x.shape
            h = x.reshape(B, H * W, C)
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"patch_norm{s + 1}")(h)
            for d in range(self.depths[s]):
                h = PVTBlock(
                    dim=self.embed_dims[s],
                    num_heads=self.num_heads[s],
                    mlp_ratio=self.mlp_ratios[s],
                    sr_ratio=self.sr_ratios[s],
                    drop_path=float(dpr[cur + d]),
                    force_fused=self.force_fused,
                    dtype=self.dtype,
                    name=f"block{s + 1}_{d}",
                )(h, H, W, deterministic)
            h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=f"norm{s + 1}")(h)
            x = h.reshape(B, H, W, C)
            outs.append(x)
            cur += self.depths[s]
        return outs[::-1]
