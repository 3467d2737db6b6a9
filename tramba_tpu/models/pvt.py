"""PVTv2 encoder (flax, NHWC).

Re-design of ``Models/encoder/pvtv2_encoder.py``: overlapping patch embeds,
spatial-reduction attention (sr_ratio per stage), depthwise-conv MLPs.
``pvt_v2_b4``: embed [64, 128, 320, 512], heads [1, 2, 5, 8], mlp ratios
[8, 8, 4, 4], depths [3, 8, 27, 3], sr [8, 4, 2, 1] (pvtv2_encoder.py:433-438).
Returns the four stage maps deepest-first (pvtv2_encoder.py:358).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tramba_tpu.nn.layers import DropPath, trunc_normal_init

__all__ = ["PVTv2Encoder", "pvt_v2_b4_config"]

_dense = lambda f, name, bias=True, dtype=None: nn.Dense(
    f, use_bias=bias, kernel_init=trunc_normal_init, dtype=dtype, name=name)


class SRAttention(nn.Module):
    """Spatial-reduction attention (pvtv2_encoder.py:57-116)."""

    dim: int
    num_heads: int
    sr_ratio: int
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, H, W):
        B, N, C = x.shape
        nh = self.num_heads
        hd = C // nh
        q = _dense(C, "q", self.qkv_bias, dtype=self.dtype)(x).reshape(B, N, nh, hd).transpose(0, 2, 1, 3)
        if self.sr_ratio > 1:
            xr = x.reshape(B, H, W, C)
            xr = nn.Conv(C, (self.sr_ratio, self.sr_ratio), strides=self.sr_ratio,
                         dtype=self.dtype, name="sr")(xr)
            xr = xr.reshape(B, -1, C)
            xr = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(xr)
        else:
            xr = x
        kv = _dense(C * 2, "kv", self.qkv_bias, dtype=self.dtype)(xr).reshape(B, -1, 2, nh, hd).transpose(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]
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


class PVTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float
    sr_ratio: int
    drop_path: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, H, W, deterministic: bool = True):
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        y = SRAttention(self.dim, self.num_heads, self.sr_ratio, dtype=self.dtype, name="attn")(y, H, W)
        x = x + DropPath(self.drop_path)(y, deterministic)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = DWConvMlp(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="mlp")(y, H, W)
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
                    dtype=self.dtype,
                    name=f"block{s + 1}_{d}",
                )(h, H, W, deterministic)
            h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=f"norm{s + 1}")(h)
            x = h.reshape(B, H, W, C)
            outs.append(x)
            cur += self.depths[s]
        return outs[::-1]
