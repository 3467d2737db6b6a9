"""Numerical parity of the alternative encoders vs the torch reference."""

import os

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from tramba_tpu.compat import torch_weights as tw
from tramba_tpu.models.pvt import PVTv2Encoder
from tramba_tpu.models.resnet import ResNetEncoder
from tramba_tpu.models.swin import SwinEncoder

pytestmark = [pytest.mark.slow,  # full tier only (see pytest.ini)
              pytest.mark.skipif(not os.path.isdir("/root/reference"), reason="reference not mounted")]


@pytest.fixture(scope="module")
def refs():
    from tests import ref_shim

    return ref_shim.load_reference_encoders()


def test_resnet_parity(refs):
    import torch

    torch.manual_seed(0)
    model_t = refs["resnet"].ResNet().eval()
    # randomize BN stats so eval-mode normalization is non-trivial
    for m in model_t.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.5, 1.5)
            m.weight.data.normal_(1, 0.1)
            m.bias.data.normal_(0, 0.1)
    x = np.random.default_rng(0).normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        outs_t = model_t(torch.from_numpy(x))

    params, stats = tw.convert_resnet_encoder(tw.state_dict_to_numpy(model_t.state_dict()))
    model_j = ResNetEncoder()
    outs_j = model_j.apply({"params": params, "batch_stats": stats}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(outs_t) == len(outs_j) == 5
    for i, (ot, oj) in enumerate(zip(outs_t, outs_j)):
        np.testing.assert_allclose(np.asarray(oj).transpose(0, 3, 1, 2), ot.numpy(),
                                   rtol=1e-4, atol=1e-4, err_msg=f"out {i}")


def test_pvt_parity(refs):
    import torch
    from functools import partial

    torch.manual_seed(1)
    model_t = refs["pvt"].PyramidVisionTransformerImpr(
        img_size=64, patch_size=4, embed_dims=[8, 16, 32, 64], num_heads=[1, 2, 4, 8],
        mlp_ratios=[2, 2, 2, 2], qkv_bias=True,
        norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
        depths=[1, 1, 1, 1], sr_ratios=[8, 4, 2, 1], drop_path_rate=0.0,
    ).eval()
    x = np.random.default_rng(1).normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        outs_t = model_t(torch.from_numpy(x))

    params = tw.convert_pvt_encoder(tw.state_dict_to_numpy(model_t.state_dict()), depths=(1, 1, 1, 1))
    model_j = PVTv2Encoder(embed_dims=(8, 16, 32, 64), num_heads=(1, 2, 4, 8),
                           mlp_ratios=(2, 2, 2, 2), depths=(1, 1, 1, 1), sr_ratios=(8, 4, 2, 1),
                           drop_path_rate=0.0)
    outs_j = model_j.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(outs_t) == len(outs_j) == 4
    for i, (ot, oj) in enumerate(zip(outs_t, outs_j)):
        np.testing.assert_allclose(np.asarray(oj).transpose(0, 3, 1, 2), ot.numpy(),
                                   rtol=1e-4, atol=1e-4, err_msg=f"out {i}")


def test_swin_parity(refs):
    """Parity of stage *inputs* (what the Tramba assembly consumes).

    The reference's forward() only works at 384px (hardcoded resize_feat
    sizes, swin_encoder.py:584-588); we replicate its forward_features loop
    to collect stage inputs at a small size.
    """
    import torch

    torch.manual_seed(2)
    sw = refs["swin"]
    model_t = sw.SwinTransformer(img_size=64, patch_size=4, embed_dim=8,
                                 depths=[2, 1, 1, 1], num_heads=[1, 2, 4, 8],
                                 window_size=4, drop_path_rate=0.0).eval()
    x = np.random.default_rng(2).normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        h = model_t.patch_embed(torch.from_numpy(x))
        feats_t = []
        res, dim = 16, 8
        for layer in model_t.layers:
            feats_t.append(h.view(1, res, res, dim).permute(0, 3, 1, 2).contiguous())
            h = layer(h)
            if layer.downsample is not None:
                res //= 2
                dim *= 2

    params = tw.convert_swin_encoder(tw.state_dict_to_numpy(model_t.state_dict()),
                                     depths=(2, 1, 1, 1))
    model_j = SwinEncoder(img_size=64, embed_dim=8, depths=(2, 1, 1, 1),
                          num_heads=(1, 2, 4, 8), window=4, drop_path_rate=0.0)
    outs_j = model_j.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(outs_j) == len(feats_t) == 4
    for i, (ot, oj) in enumerate(zip(feats_t, outs_j)):
        np.testing.assert_allclose(np.asarray(oj).transpose(0, 3, 1, 2), ot.numpy(),
                                   rtol=1e-4, atol=1e-4, err_msg=f"stage input {i}")
