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

pytestmark = pytest.mark.skipif(not os.path.isdir("/root/reference"), reason="reference not mounted")


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
