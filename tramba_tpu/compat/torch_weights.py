"""PyTorch checkpoint -> flax parameter-tree converter.

Maps the reference state_dicts (Trambav6 BaseUMamba and the upstream VMamba
classification checkpoints loaded by ``load_pretrained_Base``,
vmamba.py:707-732) onto this framework's NHWC flax modules.

Layout rules:
* Linear / Linear2d weight (out, in)  -> Dense kernel (in, out)        [T]
* Conv2d weight (out, in/g, kh, kw)   -> Conv kernel (kh, kw, in/g, out)
* LayerNorm weight/bias               -> scale/bias
* stacked SS2D params x_proj_weight (K, R+2N, D) and dt_projs_weight
  (K, D, R) carry over unchanged; A_logs (K*D, N) / Ds (K*D) reshape to
  (K, D, N) / (K, D).

Works on numpy arrays so it does not require torch at import time.
"""

from __future__ import annotations

from typing import Dict, Mapping, Sequence

import numpy as np

__all__ = ["convert_tramba_v", "convert_vmamba_encoder_pretrained", "state_dict_to_numpy"]


def state_dict_to_numpy(sd: Mapping) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out


class _TrackedSD(dict):
    """State dict that records key accesses so converters can report
    unconsumed reference parameters instead of silently dropping them
    (contrast the reference's own shape asserts, vmamba.py:723-732)."""

    def __init__(self, base):
        super().__init__(base)
        self.accessed = set()

    def __getitem__(self, k):
        self.accessed.add(k)
        return super().__getitem__(k)


# torch buffers / profiler bookkeeping that carry no learned weights, plus
# the reference's precomputed DCT cosine bases (DCT_2D.py:37-45) — computed
# analytically here (ops/dct.py), never loaded
_IGNORABLE = (
    "attn_mask", "relative_position_index", "num_batches_tracked",
    "total_ops", "total_params", "rope", "DCT2D",
)


def _ignorable(key: str, patterns) -> bool:
    """Match patterns against dotted key COMPONENTS (a pattern is a dotted
    component sequence; the final component may be a prefix, for indexed
    buffers like ``attn_mask0``) — not bare substring containment, so a
    learned parameter merely containing e.g. 'rope' inside a longer name is
    still surfaced by the strict leftover check."""
    parts = key.split(".")
    for p in patterns:
        pp = p.split(".")
        n = len(pp)
        for i in range(len(parts) - n + 1):
            seg = parts[i : i + n]
            if all(a == b or (j == n - 1 and a.startswith(b))
                   for j, (a, b) in enumerate(zip(seg, pp))):
                return True
    return False


def check_consumed(sd, strict: bool = True, ignore: Sequence[str] = ()):
    """After conversion: every reference key must have been read (or be a
    known weightless buffer).  Raises on leftovers when ``strict``."""
    if not isinstance(sd, _TrackedSD):
        return []
    left = [k for k in sd if k not in sd.accessed
            and not _ignorable(k, (*_IGNORABLE, *ignore))]
    if left:
        msg = (f"converter left {len(left)} reference parameters unconsumed "
               f"(first 10): {sorted(left)[:10]}")
        if strict:
            raise ValueError(msg)
        import warnings

        warnings.warn(msg)
    return left


def _linear(sd, prefix, bias=True):
    p = {"kernel": sd[f"{prefix}.weight"].T}
    if bias and f"{prefix}.bias" in sd:
        p["bias"] = sd[f"{prefix}.bias"]
    return p


def _conv(sd, prefix, bias=True):
    w = sd[f"{prefix}.weight"]  # (out, in/g, kh, kw)
    p = {"kernel": w.transpose(2, 3, 1, 0)}
    if bias and f"{prefix}.bias" in sd:
        p["bias"] = sd[f"{prefix}.bias"]
    return p


def _ln(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _ss2d(sd, prefix, k_group: int):
    A_logs = sd[f"{prefix}.A_logs"]
    Ds = sd[f"{prefix}.Ds"]
    KD, N = A_logs.shape
    D = KD // k_group
    p = {
        "in_proj": _linear(sd, f"{prefix}.in_proj"),
        "x_proj_weight": sd[f"{prefix}.x_proj_weight"],
        "dt_projs_weight": sd[f"{prefix}.dt_projs_weight"],
        "dt_projs_bias": sd[f"{prefix}.dt_projs_bias"],
        "A_logs": A_logs.reshape(k_group, D, N),
        "Ds": Ds.reshape(k_group, D),
        "out_norm": _ln(sd, f"{prefix}.out_norm"),
        "out_proj": _linear(sd, f"{prefix}.out_proj"),
    }
    if f"{prefix}.conv2d.weight" in sd:
        p["conv2d"] = _conv(sd, f"{prefix}.conv2d")
    return p


def _mlp(sd, prefix):
    return {"fc1": _linear(sd, f"{prefix}.fc1"), "fc2": _linear(sd, f"{prefix}.fc2")}


def _dwmsmlp(sd, prefix):
    return {
        "fc1": _linear(sd, f"{prefix}.fc1"),
        "fc2": _linear(sd, f"{prefix}.fc2"),
        "dwc3": {"Conv_0": _conv(sd, f"{prefix}.dwc3.dw_conv")},
        "dwc5": {"Conv_0": _conv(sd, f"{prefix}.dwc5.dw_conv")},
        "dwc7": {"Conv_0": _conv(sd, f"{prefix}.dwc7.dw_conv")},
    }


def _expand(sd, prefix):
    return {"expand": _linear(sd, f"{prefix}.expand", bias=False), "norm": _ln(sd, f"{prefix}.norm")}


def _vss_block(sd, prefix):
    return {
        "norm": _ln(sd, f"{prefix}.norm"),
        "op": _ss2d(sd, f"{prefix}.op", k_group=4),
        "norm2": _ln(sd, f"{prefix}.norm2"),
        "mlp": _mlp(sd, f"{prefix}.mlp"),
    }


def _ms_decoder_block(sd, prefix):
    return {
        "norm1": _ln(sd, f"{prefix}.norm1"),
        "op": _ss2d(sd, f"{prefix}.op", k_group=8),
        "norm2": _ln(sd, f"{prefix}.norm2"),
        "mlp": _dwmsmlp(sd, f"{prefix}.mlp"),
    }


def _freq_block(sd, prefix):
    return {
        "norm1": _ln(sd, f"{prefix}.norm1"),
        "attn": {
            "h_expand": _expand(sd, f"{prefix}.attn.h_expand"),
            "l_expand": _expand(sd, f"{prefix}.attn.l_expand"),
            "h_ssm": _ss2d(sd, f"{prefix}.attn.h_ssm", k_group=4),
            "l_ssm": _ss2d(sd, f"{prefix}.attn.l_ssm", k_group=4),
            "concat_back_dim": _linear(sd, f"{prefix}.attn.concat_back_dim", bias=False),
        },
        "norm2": _ln(sd, f"{prefix}.norm2"),
        "mlp": _mlp(sd, f"{prefix}.mlp"),
    }


def convert_vssm_encoder(sd: Mapping[str, np.ndarray], prefix: str, depths: Sequence[int]) -> dict:
    enc = {
        "patch_embed_conv1": _conv(sd, f"{prefix}patch_embed.0"),
        "patch_embed_norm1": _ln(sd, f"{prefix}patch_embed.2"),
        "patch_embed_conv2": _conv(sd, f"{prefix}patch_embed.5"),
        "patch_embed_norm2": _ln(sd, f"{prefix}patch_embed.7"),
    }
    for s, depth in enumerate(depths):
        for d in range(depth):
            enc[f"layers_{s}_block_{d}"] = _vss_block(sd, f"{prefix}layers.{s}.blocks.{d}")
        if s < len(depths) - 1:
            enc[f"downsample_{s}_conv"] = _conv(sd, f"{prefix}downsample.{s}.1")
            enc[f"downsample_{s}_norm"] = _ln(sd, f"{prefix}downsample.{s}.3")
    return enc


def convert_tramba_decoder(sd: Mapping[str, np.ndarray], prefix: str, n_stages: int,
                           depths: Sequence[int]) -> dict:
    dec = {}
    for s in range(n_stages - 1):
        dec[f"expand_{s}"] = _expand(sd, f"{prefix}expand_layers.{s}")
        dec[f"guide_{s}"] = _freq_block(sd, f"{prefix}guide_layers.{s}")
        dec[f"concat_back_dim_{s}"] = _linear(sd, f"{prefix}concat_back_dim.{s}")
        for d in range(depths[s]):
            dec[f"stage_{s}_block_{d}"] = _ms_decoder_block(sd, f"{prefix}stage_layers.{s}.blocks.{d}")
        dec[f"seg_{s}"] = _conv(sd, f"{prefix}seg_layers.{s}")
    s = n_stages - 1
    dec[f"expand_{s}"] = _expand(sd, f"{prefix}expand_layers.{s}")
    dec[f"seg_{s}"] = _conv(sd, f"{prefix}seg_layers.{s}")
    return dec


def convert_tramba_v(state_dict: Mapping, enc_depths: Sequence[int] = (2, 2, 15, 2),
                     dec_depths: Sequence[int] = (2, 2, 2, 2), strict: bool = True) -> dict:
    """Full Tramba-V (Trambav6 BaseUMamba) state_dict -> flax params."""
    sd = _TrackedSD(state_dict_to_numpy(state_dict))
    n_stages = len(enc_depths)
    out = {
        "params": {
            "vssm_encoder": convert_vssm_encoder(sd, "vssm_encoder.", enc_depths),
            "decoder": convert_tramba_decoder(sd, "decoder.", n_stages, dec_depths),
        }
    }
    check_consumed(sd, strict)
    return out


def convert_vmamba_encoder_pretrained(ckpt_model: Mapping, depths: Sequence[int] = (2, 2, 15, 2)) -> dict:
    """Upstream VMamba classification ckpt['model'] -> encoder flax params.

    Replicates load_pretrained_Base's key surgery (vmamba.py:707-732): drop
    classifier.*, remap layers.{i}.downsample.* -> downsample.{i}.*.
    """
    import re

    sd = {}
    for k, v in state_dict_to_numpy(ckpt_model).items():
        if "classifier" in k:
            continue
        m = re.match(r"layers\.(\d+)\.downsample\.(.*)", k)
        if m:
            k = f"downsample.{m.group(1)}.{m.group(2)}"
        sd[k] = v
    sd = _TrackedSD(sd)
    out = convert_vssm_encoder(sd, "", depths)
    check_consumed(sd, strict=True)
    return out


# ---------------------------------------------------------------------------
# Encoder-variant converters (Trambav6_enc.py assemblies + BaseUMamba)
# ---------------------------------------------------------------------------


def _plain_decoder_block(sd, prefix):
    return {
        "norm1": _ln(sd, f"{prefix}.norm1"),
        "op": _ss2d(sd, f"{prefix}.op", k_group=8),
        "norm2": _ln(sd, f"{prefix}.norm2"),
        "mlp": _mlp(sd, f"{prefix}.mlp"),
    }


def convert_base_umamba(state_dict: Mapping, enc_depths: Sequence[int] = (2, 2, 15, 2),
                        dec_depths: Sequence[int] = (2, 2, 2, 2)) -> dict:
    """BaseUMamba (ablation) state_dict -> flax params (BaseUMamba.py:126-181)."""
    sd = _TrackedSD(state_dict_to_numpy(state_dict))
    n_stages = len(enc_depths)
    dec = {}
    for s in range(n_stages - 1):
        dec[f"expand_{s}"] = _expand(sd, f"decoder.expand_layers.{s}")
        dec[f"concat_back_dim_{s}"] = _linear(sd, f"decoder.concat_back_dim.{s}")
        for d in range(dec_depths[s]):
            dec[f"stage_{s}_block_{d}"] = _plain_decoder_block(sd, f"decoder.stage_layers.{s}.blocks.{d}")
        dec[f"seg_{s}"] = _conv(sd, f"decoder.seg_layers.{s}")
    s = n_stages - 1
    dec[f"expand_{s}"] = _expand(sd, f"decoder.expand_layers.{s}")
    dec[f"seg_{s}"] = _conv(sd, f"decoder.seg_layers.{s}")
    out = {"params": {
        "vssm_encoder": convert_vssm_encoder(sd, "vssm_encoder.", enc_depths),
        "decoder": dec,
    }}
    check_consumed(sd, strict=True)
    return out


def _bn(sd, prefix):
    return (
        {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]},
        {"mean": sd[f"{prefix}.running_mean"], "var": sd[f"{prefix}.running_var"]},
    )


def convert_resnet_encoder(sd: Mapping[str, np.ndarray], prefix: str = "",
                           layers: Sequence[int] = (3, 4, 6, 3)):
    """torchvision-style ResNet-50 keys -> (params, batch_stats)."""
    params, stats = {}, {}
    params["conv1"] = _conv(sd, f"{prefix}conv1", bias=False)
    params["bn1"], stats["bn1"] = _bn(sd, f"{prefix}bn1")
    for i, blocks in enumerate(layers):
        for b in range(blocks):
            p, s = {}, {}
            tp = f"{prefix}layer{i + 1}.{b}"
            for c in ("conv1", "conv2", "conv3"):
                p[c] = _conv(sd, f"{tp}.{c}", bias=False)
            for bn in ("bn1", "bn2", "bn3"):
                p[bn], s[bn] = _bn(sd, f"{tp}.{bn}")
            if f"{tp}.downsample.0.weight" in sd:
                p["downsample_conv"] = _conv(sd, f"{tp}.downsample.0", bias=False)
                p["downsample_bn"], s["downsample_bn"] = _bn(sd, f"{tp}.downsample.1")
            params[f"layer{i + 1}_{b}"] = p
            stats[f"layer{i + 1}_{b}"] = s
    return params, stats


def convert_pvt_encoder(sd: Mapping[str, np.ndarray], prefix: str = "",
                        depths: Sequence[int] = (3, 8, 27, 3)) -> dict:
    params = {}
    for i in range(len(depths)):
        params[f"patch_embed{i + 1}"] = _conv(sd, f"{prefix}patch_embed{i + 1}.proj")
        params[f"patch_norm{i + 1}"] = _ln(sd, f"{prefix}patch_embed{i + 1}.norm")
        for d in range(depths[i]):
            bp = f"{prefix}block{i + 1}.{d}"
            attn = {
                "q": _linear(sd, f"{bp}.attn.q"),
                "kv": _linear(sd, f"{bp}.attn.kv"),
                "proj": _linear(sd, f"{bp}.attn.proj"),
            }
            if f"{bp}.attn.sr.weight" in sd:
                attn["sr"] = _conv(sd, f"{bp}.attn.sr")
                attn["norm"] = _ln(sd, f"{bp}.attn.norm")
            params[f"block{i + 1}_{d}"] = {
                "norm1": _ln(sd, f"{bp}.norm1"),
                "attn": attn,
                "norm2": _ln(sd, f"{bp}.norm2"),
                "mlp": {
                    "fc1": _linear(sd, f"{bp}.mlp.fc1"),
                    "dwconv": _conv(sd, f"{bp}.mlp.dwconv.dwconv"),
                    "fc2": _linear(sd, f"{bp}.mlp.fc2"),
                },
            }
        params[f"norm{i + 1}"] = _ln(sd, f"{prefix}norm{i + 1}")
    return params


def convert_swin_encoder(sd: Mapping[str, np.ndarray], prefix: str = "",
                         depths: Sequence[int] = (2, 2, 18, 2), include_last_stage: bool = False) -> dict:
    """Swin keys -> flax params.  The stage-4 blocks are dead compute in the
    Tramba assembly (Trambav6_enc.py:212) and skipped unless requested."""
    params = {
        "patch_embed_proj": _conv(sd, f"{prefix}patch_embed.proj"),
        "patch_embed_norm": _ln(sd, f"{prefix}patch_embed.norm"),
    }
    n_run = len(depths) if include_last_stage else len(depths) - 1
    for i in range(len(depths)):
        if i < n_run:
            for d in range(depths[i]):
                bp = f"{prefix}layers.{i}.blocks.{d}"
                params[f"layer{i}_block{d}"] = {
                    "norm1": _ln(sd, f"{bp}.norm1"),
                    "attn": {
                        "qkv": _linear(sd, f"{bp}.attn.qkv"),
                        "proj": _linear(sd, f"{bp}.attn.proj"),
                        "relative_position_bias_table": sd[f"{bp}.attn.relative_position_bias_table"],
                    },
                    "norm2": _ln(sd, f"{bp}.norm2"),
                    "mlp_fc1": _linear(sd, f"{bp}.mlp.fc1"),
                    "mlp_fc2": _linear(sd, f"{bp}.mlp.fc2"),
                }
        if i < len(depths) - 1:
            params[f"layer{i}_downsample"] = {
                "norm": _ln(sd, f"{prefix}layers.{i}.downsample.norm"),
                "reduction": _linear(sd, f"{prefix}layers.{i}.downsample.reduction", bias=False),
            }
    return params


_ENC_CONFIG = {
    "swin": dict(n_stages=4, depths=(2, 2, 2, 2)),
    "pvt": dict(n_stages=4, depths=(2, 2, 2, 2)),
    "resnet": dict(n_stages=3, depths=(2, 2, 2)),
}


def convert_tramba_enc(state_dict: Mapping, enc_type: str, strict: bool = True) -> dict:
    """Full Tramba-S/P/R state_dict -> flax variables (params [+ batch_stats])."""
    sd = _TrackedSD(state_dict_to_numpy(state_dict))
    # swin stage-4 blocks are dead compute in the assembly (skipped by design)
    ignore = ("encoder.layers.3.blocks",) if enc_type == "swin" else ()
    cfg = _ENC_CONFIG[enc_type]
    dec = convert_tramba_decoder(sd, "decoder.", cfg["n_stages"], cfg["depths"])
    if enc_type == "swin":
        out = {"params": {"encoder": convert_swin_encoder(sd, "encoder."), "decoder": dec}}
    elif enc_type == "pvt":
        out = {"params": {"encoder": convert_pvt_encoder(sd, "encoder."), "decoder": dec}}
    elif enc_type == "resnet":
        enc, stats = convert_resnet_encoder(sd, "encoder.")
        out = {"params": {"encoder": enc, "decoder": dec},
               "batch_stats": {"encoder": stats}}
    else:
        raise ValueError(enc_type)
    check_consumed(sd, strict, ignore)
    return out
