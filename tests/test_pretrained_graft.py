"""Pretrained-encoder grafting for Tramba-S/P/R (Trambav6_enc.py:176-200).

Builds the reference torch encoders at their *full released configurations*
(Swin-B 384/22k, PVTv2-b4, ResNet-50), runs their state_dicts through the
training-time graft path (`train/loop._pretrained_encoder_variables`), and
checks every converted leaf lands on a matching-shape parameter of the flax
model (via jax.eval_shape — no compute).  Also locks in the loud-failure
contract of `_graft_strict`.
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from tramba_tpu.train.loop import _graft_strict, _pretrained_encoder_variables

pytestmark = [pytest.mark.slow,  # full tier only (see pytest.ini)
              pytest.mark.skipif(not os.path.isdir("/root/reference"), reason="reference not mounted")]


# ---------------------------------------------------------------------------
# _graft_strict contract
# ---------------------------------------------------------------------------


def test_graft_strict_overwrites_matching_leaves():
    dst = {"a": {"w": jnp.zeros((2, 3)), "b": jnp.zeros((3,))}, "keep": jnp.ones((1,))}
    src = {"a": {"w": np.full((2, 3), 7.0, np.float32)}}
    _graft_strict(dst, src)
    np.testing.assert_array_equal(np.asarray(dst["a"]["w"]), 7.0)
    np.testing.assert_array_equal(np.asarray(dst["keep"]), 1.0)


def test_graft_strict_rejects_unknown_key():
    dst = {"a": {"w": jnp.zeros((2, 3))}}
    with pytest.raises(KeyError, match="no target parameter"):
        _graft_strict(dst, {"a": {"nope": np.zeros((2, 3), np.float32)}})


def test_graft_strict_rejects_shape_mismatch():
    dst = {"a": {"w": jnp.zeros((2, 3))}}
    with pytest.raises(ValueError, match="shape mismatch"):
        _graft_strict(dst, {"a": {"w": np.zeros((3, 2), np.float32)}})


# ---------------------------------------------------------------------------
# full-config S/P/R conversions land on the flax models
# ---------------------------------------------------------------------------


def _model_shapes(method: str):
    from tramba_tpu.models.registry import build

    class _Args:
        img_size = 384
        method = None

    args = _Args()
    args.method = method
    model = build(method, args, dtype=jnp.float32)
    x = jax.ShapeDtypeStruct((1, 384, 384, 3), jnp.float32)
    return jax.eval_shape(model.init, jax.random.key(0), x)


def _check_tree(dst, src, path=""):
    """Every converted leaf must exist in the model with the same shape."""
    for k, v in src.items():
        here = f"{path}/{k}"
        assert k in dst, f"converted leaf has no model target: {here}"
        if isinstance(v, dict):
            _check_tree(dst[k], v, here)
        else:
            assert tuple(np.shape(dst[k])) == tuple(np.shape(v)), (
                f"shape mismatch at {here}: model {np.shape(dst[k])} vs ckpt {np.shape(v)}"
            )


def _count_leaves(tree):
    return sum(_count_leaves(v) if isinstance(v, dict) else 1 for v in tree.values())


@pytest.fixture(scope="module")
def refs():
    from tests import ref_shim

    return ref_shim.load_reference_encoders()


def test_swin_b_384_22k_graft(refs):
    import torch

    with torch.no_grad():
        model_t = refs["swin"].SwinTransformer(
            img_size=384, embed_dim=128, depths=[2, 2, 18, 2],
            num_heads=[4, 8, 16, 32], window_size=12,
        )
    sd = {k: v for k, v in model_t.state_dict().items()}
    graft = _pretrained_encoder_variables("Tramba-S-TSOD", sd)
    shapes = _model_shapes("Tramba-S-TSOD")
    _check_tree(shapes["params"], graft["params"])
    # all grafted-model encoder params are covered (no silently-random subtree)
    assert _count_leaves(graft["params"]["encoder"]) == _count_leaves(
        jax.tree.map(lambda x: x, shapes["params"]["encoder"])
    )


def test_pvt_v2_b4_graft(refs):
    import torch
    from functools import partial

    with torch.no_grad():
        model_t = refs["pvt"].PyramidVisionTransformerImpr(
            patch_size=4, embed_dims=[64, 128, 320, 512], num_heads=[1, 2, 5, 8],
            mlp_ratios=[8, 8, 4, 4], qkv_bias=True,
            norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
            depths=[3, 8, 27, 3], sr_ratios=[8, 4, 2, 1],
        )
    sd = {k: v for k, v in model_t.state_dict().items()}
    graft = _pretrained_encoder_variables("Tramba-P-TSOD", sd)
    shapes = _model_shapes("Tramba-P-TSOD")
    _check_tree(shapes["params"], graft["params"])
    assert _count_leaves(graft["params"]["encoder"]) == _count_leaves(
        jax.tree.map(lambda x: x, shapes["params"]["encoder"])
    )


def test_resnet50_graft(refs):
    model_t = refs["resnet"].ResNet()
    sd = {k: v for k, v in model_t.state_dict().items()}
    graft = _pretrained_encoder_variables("Tramba-R-TSOD", sd)
    shapes = _model_shapes("Tramba-R-TSOD")
    _check_tree(shapes["params"], graft["params"])
    _check_tree(shapes["batch_stats"], graft["batch_stats"])


def test_wrong_checkpoint_is_loud(refs):
    """Feeding the wrong architecture's weights raises, never silently skips."""
    model_t = refs["resnet"].ResNet()
    sd = {k: v for k, v in model_t.state_dict().items()}
    with pytest.raises(Exception):
        _pretrained_encoder_variables("Tramba-S-TSOD", sd)


def test_converter_reports_unconsumed():
    """A bogus extra key in the reference state dict must be reported."""
    import numpy as np
    import pytest
    import torch

    from tests.ref_shim import load_reference
    from tramba_tpu.compat.torch_weights import convert_tramba_v

    Trambav6 = load_reference()["Trambav6"]
    torch.manual_seed(0)
    vss_args = dict(patch_size=4, in_chans=3, depths=[1, 1], dims=16,
                    drop_path_rate=0.0, patch_norm=True, norm_layer="LN2D",
                    posembed=False, imgsize=64)
    decoder_args = dict(deep_supervision=True, features_per_stage=[16, 32],
                        depths=[1, 1], img_size=64, drop_path_rate=0.0)
    ref = Trambav6.BaseUMamba(vss_args, decoder_args, use_pretrain=False).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    convert_tramba_v(sd, enc_depths=(1, 1), dec_depths=(1, 1))  # clean: no raise
    sd["decoder.some_orphan.weight"] = np.zeros((3, 3), np.float32)
    with pytest.raises(ValueError, match="unconsumed"):
        convert_tramba_v(sd, enc_depths=(1, 1), dec_depths=(1, 1))
    # strict=False downgrades to a warning
    with pytest.warns(UserWarning, match="unconsumed"):
        convert_tramba_v(sd, enc_depths=(1, 1), dec_depths=(1, 1), strict=False)
