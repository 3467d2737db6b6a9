"""Scan-order table + scan/merge op tests.

Invariants formalized from the reference's ad-hoc __main__ checks
(SURVEY.md §4): round-trip merge(scan(x)) == K*x for permutation orders,
scatter-add parity for line orders, and scan/merge VJP transposition.
Where the reference's torch generators can run on CPU we cross-check our
numpy tables against them exactly.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tramba_tpu.ops import scan_orders as so

SIZES = [(6, 6), (8, 8), (12, 12)]
ORDERS = [
    ("raster", 0, 4),
    ("line", 0, 8),
    ("line4", 0, 4),
    ("dilation", 4, 4),
    ("dilation", 3, 4),
    ("window", 2, 4),
    ("spiral", 0, 4),
    ("spiral8", 0, 8),
    ("hilbert", 0, 4),
    ("diagonal", 0, 4),
    ("diagonal8", 0, 8),
    ("ab1", 0, 4),
    ("ab2", 0, 4),
]


def _numpy_merge(ys, idx):
    """Reference semantics: scatter-add each direction back (SpiralLine.py:109)."""
    B, K, L, D = ys.shape
    out = np.zeros((B, L, D), ys.dtype)
    for k in range(K):
        np.add.at(out, (slice(None), idx[k]), ys[:, k])
    return out


@pytest.mark.parametrize("kind,param,K", ORDERS)
@pytest.mark.parametrize("H,W", SIZES)
def test_scan_covers_L_positions(kind, param, K, H, W):
    order = so.get_order(kind, H, W, param)
    assert order.idx.shape == (K, H * W)
    assert int(order._idx_np.min()) >= 0
    assert int(order._idx_np.max()) < H * W


@pytest.mark.parametrize("kind,param,K", ORDERS)
@pytest.mark.parametrize("H,W", [(8, 8), (12, 12)])
def test_merge_matches_scatter_add(kind, param, K, H, W):
    order = so.get_order(kind, H, W, param)
    rng = np.random.default_rng(0)
    ys = rng.normal(size=(2, K, H * W, 3)).astype(np.float32)
    got = np.asarray(so.cross_merge(jnp.asarray(ys), kind, H, W, param))
    want = _numpy_merge(ys, order._idx_np)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize(
    "kind,param", [("raster", 0), ("dilation", 4), ("window", 2), ("spiral", 0), ("hilbert", 0),
                   ("diagonal", 0), ("ab1", 0), ("ab2", 0)]
)
@pytest.mark.parametrize("H,W", SIZES)
def test_permutation_round_trip(kind, param, H, W):
    """merge(scan(x)) == K * x for permutation orders (Dilation.py:115, Window.py:105)."""
    order = so.get_order(kind, H, W, param)
    assert order.is_permutation
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, H * W, 5)).astype(np.float32)
    xs = so.cross_scan(jnp.asarray(x), kind, H, W, param)
    y = so.cross_merge(xs, kind, H, W, param)
    np.testing.assert_allclose(np.asarray(y), order.K * x, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("kind,param,K", ORDERS)
def test_vjp_transposition(kind, param, K):
    """vjp(scan) == merge and vjp(merge) == scan (csms6s.py:24-55 semantics)."""
    H = W = 8
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, H * W, 2)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(1, K, H * W, 2)).astype(np.float32))

    _, vjp_scan = jax.vjp(lambda a: so.cross_scan(a, kind, H, W, param), x)
    (got,) = vjp_scan(g)
    want = so.cross_merge(g, kind, H, W, param)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)

    _, vjp_merge = jax.vjp(lambda a: so.cross_merge(a, kind, H, W, param), g)
    (got2,) = vjp_merge(x)
    want2 = so.cross_scan(x, kind, H, W, param)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), rtol=1e-6, atol=1e-6)


def test_line_direction_count_is_L():
    """Each Bresenham direction lists exactly L points (lines overlap/miss pixels)."""
    for H in (6, 8, 12, 24):
        t = so.line_tables(H, H)
        assert t.shape == (4, H * H)


def test_raster_tables_explicit():
    t = so.raster_tables(2, 2)
    np.testing.assert_array_equal(t[0], [0, 1, 2, 3])
    np.testing.assert_array_equal(t[1], [0, 2, 1, 3])
    np.testing.assert_array_equal(t[2], [3, 2, 1, 0])
    np.testing.assert_array_equal(t[3], [3, 1, 2, 0])


# ---------------------------------------------------------------------------
# Golden cross-checks against the reference generators (torch CPU, read-only)
# ---------------------------------------------------------------------------

REF = "/root/reference"


def _ref_modules():
    import os

    if not os.path.isdir(REF):
        pytest.skip("reference not mounted")
    import torch

    # the reference generators call .cuda() at table build time; run them on CPU
    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self  # type: ignore[assignment]
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import importlib

    sl = importlib.import_module("Models.SS2D.SpiralLine")
    dil = importlib.import_module("Models.SS2D.Dilation")
    win = importlib.import_module("Models.SS2D.Window")
    return sl, dil, win


@pytest.mark.parametrize("H", [6, 8, 12, 24, 48, 96])
def test_line_tables_match_reference(H):
    sl, _, _ = _ref_modules()
    ref = sl.generate_indices(H, H)
    for k in range(4):
        flat = (ref[k][:, 0] + ref[k][:, 1] * H).numpy()
        np.testing.assert_array_equal(so.line_tables(H, H)[k], flat)


@pytest.mark.parametrize("H,rate", [(8, 4), (12, 4), (12, 3), (48, 4), (96, 4)])
def test_dilation_tables_match_reference(H, rate):
    _, dil, _ = _ref_modules()
    ref = dil.generate_dilation_indices(H, H, dilation_rate=rate)
    ours = so.dilation_tables(H, H, rate)
    for k in range(4):
        flat = (ref[k][:, 0] * H + ref[k][:, 1]).numpy()
        np.testing.assert_array_equal(ours[k], flat)


@pytest.mark.parametrize("H", [6, 8, 12, 24, 96])
def test_diagonal_tables_match_reference(H):
    """diagonal_tables dir0/dir1 == the reference's wrap-diagonal gathers
    (csms6s.py:478-497), dir2/dir3 their reverses."""
    _ref_modules()  # installs the CPU .cuda shim + sys.path
    import importlib

    import torch

    cs = importlib.import_module("Models.SS2D.csms6s")
    x = torch.arange(H * H, dtype=torch.int64).view(1, 1, H, H)
    ref_diag = cs.diagonal_gather(x).view(-1).numpy()  # (h+w)%W walk
    ref_anti = cs.antidiagonal_gather(x).view(-1).numpy()  # (w-h)%W walk
    ours = so.diagonal_tables(H, H)
    np.testing.assert_array_equal(ours[0], ref_diag)
    np.testing.assert_array_equal(ours[1], ref_anti)
    np.testing.assert_array_equal(ours[2], ref_diag[::-1])
    np.testing.assert_array_equal(ours[3], ref_anti[::-1])

    # scatter is the exact inverse (csms6s.py:500-528)
    seq = torch.as_tensor(ref_diag).view(1, 1, -1).to(torch.float32)
    back = cs.diagonal_scatter(seq, (1, 1, H, H)).view(-1).numpy()
    np.testing.assert_array_equal(back, np.arange(H * H))


@pytest.mark.parametrize("H,ws", [(8, 4), (12, 4), (24, 8), (48, 12), (96, 16)])
def test_window_tables_match_reference(H, ws):
    _, _, win = _ref_modules()
    ref = win.generate_window_indices(H, H, window_size=ws)
    ours = so.window_tables(H, H, ws)
    for k in range(4):
        flat = (ref[k][:, 0] * H + ref[k][:, 1]).numpy()
        np.testing.assert_array_equal(ours[k], flat)


@pytest.mark.parametrize(
    "kind,param,K",
    [("raster", 0, 4), ("dilation", 4, 4), ("dilation", 3, 4), ("window", 2, 4), ("line", 0, 8),
     ("line4", 0, 4)],
)
@pytest.mark.parametrize("H,W", [(8, 8), (12, 12), (24, 24)])
def test_structured_fast_paths_match_tables(kind, param, K, H, W):
    """Layout-op fast paths == index-table gathers for every live order."""
    order = so.get_order(kind, H, W, param)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(2, H * W, 3)).astype(np.float32))
    fast = so._structured_scan(x, kind, H, W, param)
    table = so._scan_impl(x, order.idx)
    if fast is None:  # non-divisible dilation rates fall back to tables
        assert kind == "dilation"
        return
    np.testing.assert_allclose(np.asarray(fast), np.asarray(table), rtol=1e-6)

    ys = jnp.asarray(rng.normal(size=(2, K, H * W, 3)).astype(np.float32))
    fastm = so._structured_merge(ys, kind, H, W, param)
    tablem = so._merge_impl(ys, order.inv)
    np.testing.assert_allclose(np.asarray(fastm), np.asarray(tablem), rtol=1e-6, atol=1e-6)
