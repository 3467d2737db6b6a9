"""End-to-end numerical parity vs the torch reference (CPU, random weights).

Builds the reference Trambav6 model with random init, converts its state_dict
through compat.torch_weights, and compares all deep-supervision outputs for
the same input.  This validates every converted layer and the whole forward
semantics chain (scan orders, selective scan, DCT guides, upsamplers).
"""

import os

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from tramba_tpu.compat.torch_weights import convert_tramba_v
from tramba_tpu.models.tramba import TrambaV

pytestmark = [pytest.mark.slow,  # full tier only (see pytest.ini)
              pytest.mark.skipif(not os.path.isdir("/root/reference"), reason="reference not mounted")]


@pytest.fixture(scope="module")
def ref_modules():
    from tests import ref_shim

    return ref_shim.load_reference()


def test_trambav_parity_small(ref_modules):
    import torch

    Trambav6 = ref_modules["Trambav6"]
    torch.manual_seed(0)
    vss_args = dict(patch_size=4, in_chans=3, depths=[1, 1, 2, 1], dims=32,
                    drop_path_rate=0.0, patch_norm=True, norm_layer="LN2D",
                    posembed=False, imgsize=192)
    decoder_args = dict(deep_supervision=True, features_per_stage=[32, 64, 128, 256],
                        depths=[1, 1, 1, 1], img_size=192, drop_path_rate=0.0)
    model_t = Trambav6.BaseUMamba(vss_args, decoder_args, use_pretrain=False).eval()

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 3, 192, 192)).astype(np.float32)
    with torch.no_grad():
        outs_t = model_t(torch.from_numpy(x))

    params = convert_tramba_v(model_t.state_dict(), enc_depths=(1, 1, 2, 1), dec_depths=(1, 1, 1, 1))
    model_j = TrambaV(img_size=192, dims=32, enc_depths=(1, 1, 2, 1), dec_depths=(1, 1, 1, 1),
                      ssm_backend="assoc")
    outs_j = model_j.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))

    assert len(outs_t) == len(outs_j) == 4
    for i, (ot, oj) in enumerate(zip(outs_t, outs_j)):
        got = np.asarray(oj)[..., 0]
        want = ot.numpy()[:, 0]
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3,
                                   err_msg=f"head {i} mismatch")


def test_base_umamba_parity_small(ref_modules):
    """Ablation model (no DFVSS guides, plain-Mlp decoder blocks)."""
    import importlib

    import torch

    BaseU = importlib.import_module("BaseUMamba")
    from tramba_tpu.compat.torch_weights import convert_base_umamba
    from tramba_tpu.models.tramba import BaseUMamba as BaseUMambaJ

    torch.manual_seed(3)
    vss_args = dict(patch_size=4, in_chans=3, depths=[1, 1, 1, 1], dims=16,
                    drop_path_rate=0.0, patch_norm=True, norm_layer="LN2D",
                    posembed=False, imgsize=192)
    decoder_args = dict(deep_supervision=True, features_per_stage=[16, 32, 64, 128],
                        depths=[1, 1, 1, 1], drop_path_rate=0.0)
    model_t = BaseU.BaseUMamba(vss_args, decoder_args, use_pretrain=False).eval()

    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 3, 192, 192)).astype(np.float32)
    with torch.no_grad():
        outs_t = model_t(torch.from_numpy(x))

    params = convert_base_umamba(model_t.state_dict(), enc_depths=(1, 1, 1, 1), dec_depths=(1, 1, 1, 1))
    model_j = BaseUMambaJ(img_size=192, dims=16, enc_depths=(1, 1, 1, 1), dec_depths=(1, 1, 1, 1),
                          ssm_backend="assoc")
    outs_j = model_j.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(outs_t) == len(outs_j) == 4
    for i, (ot, oj) in enumerate(zip(outs_t, outs_j)):
        np.testing.assert_allclose(np.asarray(oj)[..., 0], ot.numpy()[:, 0],
                                   rtol=1e-3, atol=2e-3, err_msg=f"head {i}")


def test_enc_variant_decoder_parity(ref_modules):
    """Trambav6_enc decoder: exercises the below//2+skip concat path
    (Trambav6_enc.py:89) with PVT-style uneven channel ladders."""
    import importlib

    import torch

    enc_mod = importlib.import_module("Trambav6_enc")
    from tramba_tpu.compat.torch_weights import convert_tramba_decoder, state_dict_to_numpy
    from tramba_tpu.models.tramba import TrambaDecoder

    torch.manual_seed(4)
    feats = [16, 32, 48, 64]
    model_t = enc_mod.VSSMDecoder(deep_supervision=True, features_per_stage=feats,
                                  depths=[1, 1, 1, 1], img_size=192, drop_path_rate=0.0).eval()
    rng = np.random.default_rng(4)
    skips_t = [
        torch.from_numpy(rng.normal(size=(1, 3, 192, 192)).astype(np.float32)),
        torch.from_numpy(rng.normal(size=(1, 16, 48, 48)).astype(np.float32)),
        torch.from_numpy(rng.normal(size=(1, 32, 24, 24)).astype(np.float32)),
        torch.from_numpy(rng.normal(size=(1, 48, 12, 12)).astype(np.float32)),
        torch.from_numpy(rng.normal(size=(1, 64, 6, 6)).astype(np.float32)),
    ]
    with torch.no_grad():
        outs_t = model_t(skips_t)

    sd = state_dict_to_numpy(model_t.state_dict())
    params = {"params": convert_tramba_decoder(sd, "", 4, (1, 1, 1, 1))}
    model_j = TrambaDecoder(features_per_stage=feats, depths=(1, 1, 1, 1), img_size=192,
                            drop_path_rate=0.0, ssm_backend="assoc")
    skips_j = [jnp.asarray(s.numpy().transpose(0, 2, 3, 1)) for s in skips_t]
    outs_j = model_j.apply(params, skips_j)
    assert len(outs_t) == len(outs_j) == 4
    for i, (ot, oj) in enumerate(zip(outs_t, outs_j)):
        np.testing.assert_allclose(np.asarray(oj)[..., 0], ot.numpy()[:, 0],
                                   rtol=1e-3, atol=2e-3, err_msg=f"head {i}")
