"""Harness to run the torch reference (read-only, CPU) for golden parity.

The reference assumes CUDA + timm + external CUDA scan kernels.  This shim
makes it runnable on CPU: a minimal timm stand-in, `.cuda()` as identity, and
a vectorized pure-torch selective scan substituted for SelectiveScanOflex
(same math the CUDA kernel computes, written here independently).
"""

import sys
import types

import torch

REF = "/root/reference"


def _install_timm_shim():
    if "timm" in sys.modules:
        return
    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")

    class DropPath(torch.nn.Module):
        def __init__(self, drop_prob=0.0, scale_by_keep=True):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):  # eval-mode parity only
            if not self.training or self.drop_prob == 0.0:
                return x
            keep = 1 - self.drop_prob
            mask = torch.bernoulli(torch.full((x.shape[0],) + (1,) * (x.ndim - 1), keep))
            return x * mask / keep

    def to_2tuple(v):
        return v if isinstance(v, tuple) else (v, v)

    layers.DropPath = DropPath
    layers.trunc_normal_ = torch.nn.init.trunc_normal_
    layers.to_2tuple = to_2tuple
    models.layers = layers
    timm.models = models
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = layers


class TorchSelectiveScan:
    """Drop-in for SelectiveScanOflex.apply: vectorized log-step scan, fp32."""

    @staticmethod
    def apply(u, delta, A, B, C, D=None, delta_bias=None, delta_softplus=True, *args):
        Bsz, KD, L = u.shape
        _, K, N, _ = B.shape
        Dch = KD // K
        if delta_bias is not None:
            delta = delta + delta_bias.view(1, KD, 1)
        if delta_softplus:
            delta = torch.nn.functional.softplus(delta)
        a = torch.exp(delta.unsqueeze(-1) * A.view(1, KD, 1, N))  # (B, KD, L, N)
        Bt = B.permute(0, 1, 3, 2).reshape(Bsz, K, 1, L, N).expand(Bsz, K, Dch, L, N).reshape(Bsz, KD, L, N)
        b = (delta * u).unsqueeze(-1) * Bt
        # Hillis-Steele inclusive scan over L
        s = 1
        while s < L:
            a_sh = torch.roll(a, s, dims=2)
            b_sh = torch.roll(b, s, dims=2)
            a_sh[:, :, :s] = 1.0
            b_sh[:, :, :s] = 0.0
            b = b + a * b_sh
            a = a * a_sh
            s *= 2
        Ct = C.permute(0, 1, 3, 2).reshape(Bsz, K, 1, L, N).expand(Bsz, K, Dch, L, N).reshape(Bsz, KD, L, N)
        y = (b * Ct).sum(-1)
        if D is not None:
            y = y + D.view(1, KD, 1) * u
        return y


def load_reference():
    """Import reference model builders with all shims active; returns module dict."""
    _install_extra_shims()
    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self  # type: ignore[assignment]
        torch.nn.Module.cuda = lambda self, *a, **k: self  # type: ignore[assignment]
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import Models.SS2D.csms6s as csms6s
    import Models.vmamba as vmamba

    # substitute the CUDA kernel binding everywhere it's referenced
    csms6s.SelectiveScanOflex = TorchSelectiveScan
    vmamba.SelectiveScanOflex = TorchSelectiveScan
    import Trambav6

    return {"vmamba": vmamba, "Trambav6": Trambav6, "csms6s": csms6s}


def _install_extra_shims():
    """Extra stand-ins needed by the alternative encoders."""
    _install_timm_shim()
    import types

    if "timm.models.registry" not in sys.modules:
        reg = types.ModuleType("timm.models.registry")
        reg.register_model = lambda cls=None, **kw: cls if cls is not None else (lambda c: c)
        sys.modules["timm.models"].registry = reg
        sys.modules["timm.models.registry"] = reg
    if "timm.models.vision_transformer" not in sys.modules:
        vit = types.ModuleType("timm.models.vision_transformer")
        vit._cfg = lambda url="", **kw: {"url": url, **kw}
        sys.modules["timm.models"].vision_transformer = vit
        sys.modules["timm.models.vision_transformer"] = vit
    if "dataset" not in sys.modules:  # resnet_encoder.py:8 imports a module absent upstream
        sys.modules["dataset"] = types.ModuleType("dataset")


def load_reference_encoders():
    """Import the three alternative reference encoders, CPU-safe."""
    _install_extra_shims()
    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self  # type: ignore[assignment]
        torch.nn.Module.cuda = lambda self, *a, **k: self  # type: ignore[assignment]
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import Models.encoder.resnet_encoder as resnet_mod

    resnet_mod.ResNet.initialize = lambda self: None  # upstream loads a hardcoded ckpt path
    import Models.encoder.pvtv2_encoder as pvt_mod
    import Models.encoder.swin_encoder as swin_mod

    return {"resnet": resnet_mod, "pvt": pvt_mod, "swin": swin_mod}
