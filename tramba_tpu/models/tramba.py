"""Tramba model assemblies: DFVSS-guided VSSM decoder + encoder variants.

Re-design of ``Trambav6.py`` (Tramba-V, VMamba encoder) and ``Trambav6_enc.py``
(Swin / PVTv2 / ResNet encoders): a U-shaped decoder where each stage
upsamples the deep feature (PatchExpand), gates the skip feature through a
dual-frequency FreqBlock guide, concatenates, reduces, and runs two
Helix-SS2D MultiScaleDecoderBlocks; deep supervision emits 4 (or 3) logit
maps at 1/16, 1/8, 1/4 and full resolution.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tramba_tpu.nn.blocks import MultiScaleDecoderBlock, VSSMDecoderBlock
from tramba_tpu.nn.freq import FreqBlock
from tramba_tpu.nn.layers import FinalPatchExpandX4, PatchExpand, conv_kaiming_init, trunc_normal_init
from tramba_tpu.models.vssm_encoder import VSSMEncoder

__all__ = ["TrambaDecoder", "TrambaV", "TrambaEnc", "BaseUMamba", "window_for_resolution"]


class _ConcatDense(nn.Module):
    """Bare Dense kernel+bias (nn.Dense checkpoint layout), applied as split
    matmuls so the input concat never materializes."""

    fin: int
    fout: int

    @nn.compact
    def __call__(self):
        return (self.param("kernel", trunc_normal_init, (self.fin, self.fout)),
                self.param("bias", nn.initializers.zeros, (self.fout,)))


class _FinalHeadP(nn.Module):
    """FinalPatchExpandX4 params (expand kernel + LN), checkpoint-tree
    identical to the composed module."""

    dim: int

    @nn.compact
    def __call__(self):
        from tramba_tpu.nn.layers import _KernelP, _NormP

        k = _KernelP(self.dim, 16 * self.dim, name="expand")()
        s, b = _NormP(self.dim, name="norm")()
        return k, s, b


class _SegHeadP(nn.Module):
    """1x1 seg-conv params matching nn.Conv's checkpoint layout."""

    dim: int

    @nn.compact
    def __call__(self):
        return (self.param("kernel", conv_kaiming_init, (1, 1, self.dim, 1)),
                self.param("bias", nn.initializers.zeros, (1,)))

# high-frequency window size per resolution (csms6s.py:107-111)
_WINDOW_BY_RES = {12: 4, 24: 8, 48: 12, 96: 16}


def window_for_resolution(res: int) -> int:
    if res in _WINDOW_BY_RES:
        return _WINDOW_BY_RES[res]
    # fallback: nearest divisor of res to res/5 (reference never defines these)
    target = max(2, res // 5)
    divs = [d for d in range(2, res + 1) if res % d == 0]
    return min(divs, key=lambda d: abs(d - target))


class TrambaDecoder(nn.Module):
    """DFVSS-guided VSSM decoder (Trambav6.py:13-139 / Trambav6_enc.py:27-159).

    ``skips``: [image, shallow..deep feature maps] (NHWC); the image slot is
    unused but kept for index parity with the reference.
    """

    features_per_stage: Sequence[int]  # shallow -> deep, e.g. [128, 256, 512, 1024]
    depths: Optional[Sequence[int]] = None
    drop_path_rate: float = 0.2
    img_size: int = 384
    deep_supervision: bool = True
    use_guides: bool = True  # False => BaseUMamba ablation (no DFVSS, plain skips)
    block_type: str = "ms"  # 'ms' (MultiScaleDecoderBlock) | 'plain' (VSSMDecoderBlock)
    ssm_backend: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, skips, deterministic: bool = True):
        chans = list(self.features_per_stage)
        n_stages = len(chans)
        depths = list(self.depths) if self.depths is not None else [2] * n_stages
        dpr = np.linspace(self.drop_path_rate, 0, (n_stages - 1) * 2)
        base_res = self.img_size // 2 ** len(depths)

        seg_outputs = []
        x = skips[-1]
        for s in range(n_stages):  # s = stage-1 in reference numbering
            if s < n_stages - 1:
                skip_ch = chans[-(s + 2)]
                res = base_res * 2**s
                x = PatchExpand(dtype=self.dtype, name=f"expand_{s}")(x)
                if self.use_guides:
                    mid = FreqBlock(
                        dim=skip_ch,
                        window=window_for_resolution(res),
                        dilation=4,
                        drop_path=0.0,
                        ssm_backend=self.ssm_backend,
                        dtype=self.dtype,
                        name=f"guide_{s}",
                    )(skips[-(s + 2)], deterministic)
                else:
                    mid = skips[-(s + 2)]
                # concat + Dense as two matmuls on the kernel's halves (the
                # (B, H, W, 2C) concat never materializes; same tree/math)
                up_ch = x.shape[-1]
                w, bcb = _ConcatDense(up_ch + mid.shape[-1], skip_ch,
                                      name=f"concat_back_dim_{s}")()
                wd = w.astype(self.dtype)
                x = (x @ wd[:up_ch] + mid @ wd[up_ch:]
                     + bcb.astype(self.dtype))
                block_cls = MultiScaleDecoderBlock if self.block_type == "ms" else VSSMDecoderBlock
                for d in range(depths[s]):
                    x = block_cls(
                        hidden_dim=skip_ch,
                        drop_path=float(dpr[sum(depths[:s]) + d]) if sum(depths[:s]) + d < len(dpr) else 0.0,
                        ssm_backend=self.ssm_backend,
                        dtype=self.dtype,
                        name=f"stage_{s}_block_{d}",
                    )(x, deterministic)
            else:
                # final stage: run LN + the 1-channel head on the coarse grid
                # (exactly equivalent; avoids shuffling the 16x-wide tensor)
                Bx, h, w, dim = x.shape
                from tramba_tpu.nn.blocks import _kernel_ok
                from tramba_tpu.ops.fused_expand import final_head_fusable, fused_final_head

                if _kernel_ok(self.ssm_backend) and final_head_fusable(h, w, dim):
                    # fully fused: the 16x-wide expand never reaches HBM
                    ke, lns, lnb = _FinalHeadP(dim, name=f"expand_{s}")()
                    kc, bc = _SegHeadP(dim, name=f"seg_{s}")()
                    seg16 = fused_final_head(x, ke, lns, lnb,
                                             kc.reshape(dim), bc)
                    seg5 = seg16.reshape(Bx, h, w, 4, 4, 1)
                else:
                    x5 = FinalPatchExpandX4(dtype=self.dtype, name=f"expand_{s}")(x, pre_shuffle=True)
                    seg5 = nn.Conv(1, (1, 1), kernel_init=conv_kaiming_init, dtype=self.dtype,
                                   name=f"seg_{s}")(x5.reshape(Bx, h, w * 16, dim))
                    seg5 = seg5.reshape(Bx, h, w, 4, 4, 1)
                seg5 = seg5.transpose(0, 1, 3, 2, 4, 5)
                seg_outputs.append(seg5.reshape(Bx, 4 * h, 4 * w, 1))
                continue
            if self.deep_supervision or s == n_stages - 1:
                seg = nn.Conv(1, (1, 1), kernel_init=conv_kaiming_init, dtype=self.dtype,
                              name=f"seg_{s}")(x)
                seg_outputs.append(seg)
        return seg_outputs if self.deep_supervision else seg_outputs[-1:]


class TrambaV(nn.Module):
    """Tramba-V: VSSM (VMamba-B) encoder + DFVSS decoder (Trambav6.py:142-200)."""

    img_size: int = 384
    dims: int = 128
    enc_depths: Sequence[int] = (2, 2, 15, 2)
    dec_depths: Sequence[int] = (2, 2, 2, 2)
    deep_supervision: bool = True
    enc_drop_path: float = 0.6
    dec_drop_path: float = 0.2
    ssm_backend: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        skips = VSSMEncoder(
            depths=tuple(self.enc_depths),
            dims=self.dims,
            drop_path_rate=self.enc_drop_path,
            ssm_backend=self.ssm_backend,
            dtype=self.dtype,
            name="vssm_encoder",
        )(x, deterministic)
        return TrambaDecoder(
            features_per_stage=[self.dims * 2**i for i in range(len(self.enc_depths))],
            depths=tuple(self.dec_depths),
            drop_path_rate=self.dec_drop_path,
            img_size=self.img_size,
            deep_supervision=self.deep_supervision,
            ssm_backend=self.ssm_backend,
            dtype=self.dtype,
            name="decoder",
        )(skips, deterministic)


class TrambaEnc(nn.Module):
    """Tramba-S / -P / -R: Swin / PVTv2 / ResNet encoder + DFVSS decoder.

    Re-design of ``Trambav6_enc.py:162-230``: skip assembly per encoder —
    Swin uses stage *inputs* (final stage-4 output discarded, :212), ResNet
    drops the deepest (2048) and shallowest (64) maps (:214), PVT uses all
    four stages (:216).
    """

    enc_type: str  # 'swin' | 'pvt' | 'resnet'
    img_size: int = 384
    deep_supervision: bool = True
    dec_drop_path: float = 0.2
    ssm_backend: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        from tramba_tpu.models.pvt import PVTv2Encoder, pvt_v2_b4_config
        from tramba_tpu.models.resnet import ResNetEncoder
        from tramba_tpu.models.swin import SwinEncoder, swin_b_384_config

        if self.enc_type == "swin":
            stage_inputs = SwinEncoder(img_size=self.img_size, dtype=self.dtype,
                                       **swin_b_384_config(), name="encoder")(x, deterministic)
            skips = [x] + stage_inputs  # shallow -> deep (stage-4 block output unused)
            features = [128, 256, 512, 1024]
            depths = (2, 2, 2, 2)
        elif self.enc_type == "pvt":
            outs = PVTv2Encoder(dtype=self.dtype, **pvt_v2_b4_config(), name="encoder")(x, deterministic)
            skips = [x] + outs[::-1]
            features = [64, 128, 320, 512]
            depths = (2, 2, 2, 2)
        elif self.enc_type == "resnet":
            outs = ResNetEncoder(dtype=self.dtype, name="encoder")(x, deterministic)
            skips = [x] + outs[1:-1][::-1]
            features = [256, 512, 1024]
            depths = (2, 2, 2)
        else:
            raise ValueError(f"unsupported encoder type: {self.enc_type}")

        return TrambaDecoder(
            features_per_stage=features,
            depths=depths,
            drop_path_rate=self.dec_drop_path,
            img_size=self.img_size,
            deep_supervision=self.deep_supervision,
            ssm_backend=self.ssm_backend,
            dtype=self.dtype,
            name="decoder",
        )(skips, deterministic)


class BaseUMamba(nn.Module):
    """Ablation baseline: VSSM encoder + plain decoder, no DFVSS guides
    (BaseUMamba.py:14-181)."""

    img_size: int = 384
    dims: int = 128
    enc_depths: Sequence[int] = (2, 2, 15, 2)
    dec_depths: Sequence[int] = (2, 2, 2, 2)
    deep_supervision: bool = True
    ssm_backend: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        skips = VSSMEncoder(
            depths=tuple(self.enc_depths),
            dims=self.dims,
            drop_path_rate=0.6,
            ssm_backend=self.ssm_backend,
            dtype=self.dtype,
            name="vssm_encoder",
        )(x, deterministic)
        return TrambaDecoder(
            features_per_stage=[self.dims * 2**i for i in range(len(self.enc_depths))],
            depths=tuple(self.dec_depths),
            drop_path_rate=0.2,
            img_size=self.img_size,
            deep_supervision=self.deep_supervision,
            use_guides=False,
            block_type="plain",
            ssm_backend=self.ssm_backend,
            dtype=self.dtype,
            name="decoder",
        )(skips, deterministic)
