"""Odd / non-384 resolutions and utility-function coverage."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tramba_tpu.ops import scan_orders as so

# full tier only: big-model / parity / e2e (see pytest.ini)
pytestmark = pytest.mark.slow


def test_line_tables_odd_size_matches_reference():
    import os, sys

    if not os.path.isdir("/root/reference"):
        pytest.skip("reference not mounted")
    import torch

    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import importlib

    sl = importlib.import_module("Models.SS2D.SpiralLine")
    for H in (7, 9):  # odd sizes exercise the H%2 branches (224px model: 7x7)
        ref = sl.generate_indices(H, H)
        ours = so.line_tables(H, H)
        for k in range(4):
            flat = (ref[k][:, 0] + ref[k][:, 1] * H).numpy()
            np.testing.assert_array_equal(ours[k], flat)


def test_tramba_forward_224():
    """224px support: resolutions 14/28/56 (the reference hardcodes 384-only)."""
    from tramba_tpu.models.tramba import TrambaV

    m = TrambaV(img_size=224, dims=8, enc_depths=(1, 1, 1, 1), dec_depths=(1, 1, 1, 1),
                ssm_backend="assoc")
    x = jnp.zeros((1, 224, 224, 3))
    params = m.init(jax.random.key(0), x)
    outs = m.apply(params, x)
    assert [o.shape for o in outs] == [
        (1, 14, 14, 1), (1, 28, 28, 1), (1, 56, 56, 1), (1, 224, 224, 1)]


def test_tramba_forward_512():
    """512px support (upward direction: stage maps 128/64/32/16, all %8)."""
    from tramba_tpu.models.tramba import TrambaV

    m = TrambaV(img_size=512, dims=8, enc_depths=(1, 1, 1, 1), dec_depths=(1, 1, 1, 1),
                ssm_backend="assoc")
    x = jnp.zeros((1, 512, 512, 3))
    params = m.init(jax.random.key(0), x)
    outs = m.apply(params, x)
    assert [o.shape for o in outs] == [
        (1, 32, 32, 1), (1, 64, 64, 1), (1, 128, 128, 1), (1, 512, 512, 1)]


def test_profiling_utils():
    from tramba_tpu.utils.profiling import count_params, selective_scan_flops

    assert count_params({"a": np.zeros((2, 3)), "b": {"c": np.zeros(5)}}) == 11
    assert selective_scan_flops(2, 10, 4, 1, with_D=False) == 9 * 2 * 10 * 4


def test_checkpoint_filename_parsing():
    from tramba_tpu.train.checkpoint import best_mae_path, epoch_from_filename

    p = best_mae_path("/tmp/x", "Tramba-V-TSOD", 0.03141, 59)
    assert p.endswith("Tramba-V-TSOD_MAE_0.0314_60.ckpt")
    assert epoch_from_filename(p) == 60
    assert epoch_from_filename("m_MAE_0.05_17.pth") == 17
