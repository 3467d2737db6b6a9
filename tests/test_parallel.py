"""Multi-device SPMD tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as graft
from tramba_tpu.parallel.mesh import data_sharding, make_mesh, shard_batch

import pytest

# full tier only: big-model / parity / e2e (see pytest.ini; core tier = -m 'not slow')
pytestmark = pytest.mark.slow


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_dryrun_multichip():
    graft.dryrun_multichip(8)


def test_shard_batch_layout():
    mesh = make_mesh(("data",))
    x = jnp.zeros((8, 4, 4, 3))
    xs = shard_batch(x, mesh)
    assert xs.sharding == data_sharding(mesh)
    # each device holds exactly one batch element
    assert xs.addressable_shards[0].data.shape == (1, 4, 4, 3)


def test_dp_step_matches_single_device():
    """DP-sharded train step computes the same loss as unsharded."""
    from tramba_tpu.models.tramba import TrambaV
    from tramba_tpu.train.optim import make_optimizer
    from tramba_tpu.train.step import create_train_state, make_train_step

    model = TrambaV(img_size=32, dims=8, enc_depths=(1, 1), dec_depths=(1, 1),
                    ssm_backend="assoc")
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(8, 32, 32, 3)).astype(np.float32))
    gts = jnp.asarray((rng.uniform(size=(8, 32, 32, 1)) > 0.5).astype(np.float32))
    params = model.init(jax.random.key(0), images[:1])
    tx = make_optimizer()
    key = jax.random.key(1)

    step = make_train_step(donate=False)
    state1 = create_train_state(model, params, tx)
    _, m1 = step(state1, images, gts, key)

    mesh = make_mesh(("data",))
    from tramba_tpu.parallel.mesh import replicate_tree

    state2 = replicate_tree(create_train_state(model, params, tx), mesh)
    _, m2 = step(state2, shard_batch(images, mesh), shard_batch(gts, mesh),
                 jax.device_put(key, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)


def test_sequence_parallel_linear_scan():
    """L-sharded scan over the 8-device mesh == single-device scan."""
    from tramba_tpu.ops.selective_scan import linear_scan
    from tramba_tpu.parallel.seq_scan import sequence_parallel_linear_scan

    rng = np.random.default_rng(0)
    B, L, C = 2, 64, 8
    a = jnp.asarray((0.9 + 0.1 * rng.uniform(size=(B, L, C))).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(B, L, C)).astype(np.float32))
    mesh = make_mesh(("seq",))
    sharding = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(None, "seq", None))
    a_s, b_s = jax.device_put(a, sharding), jax.device_put(b, sharding)
    got = sequence_parallel_linear_scan(a_s, b_s, mesh, "seq", backend="assoc")
    want = linear_scan(a, b, "assoc")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_model_level_sequence_parallel_768px():
    """768px BaseUMamba forward with ssm_backend='seq_parallel': the pixel
    sequence shards over the 8-device mesh (SURVEY §5.7 lifted to a model
    capability) and matches the single-device composed result."""
    from tramba_tpu.models.tramba import BaseUMamba
    from tramba_tpu.parallel.seq_scan import use_sequence_mesh

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 768, 768, 3)).astype(np.float32))

    def build(backend):
        return BaseUMamba(img_size=768, dims=8, enc_depths=(1, 1, 1, 1),
                          dec_depths=(1, 1, 1, 1), ssm_backend=backend)

    variables = build("assoc").init(jax.random.key(0), x[:, :64, :64])
    want = build("assoc").apply(variables, x)

    mesh = make_mesh(("seq",))
    with use_sequence_mesh(mesh, "seq"):
        got = jax.jit(lambda v, a: build("seq_parallel").apply(v, a))(variables, x)
        got = jax.tree.map(np.asarray, got)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=2e-4, atol=2e-4)


def test_training_overfits_tiny_batch():
    """Repeated steps on one batch must drive the loss down (optimizer sanity)."""
    from tramba_tpu.models.tramba import TrambaV
    from tramba_tpu.train.optim import make_optimizer
    from tramba_tpu.train.step import create_train_state, make_train_step

    model = TrambaV(img_size=32, dims=8, enc_depths=(1, 1), dec_depths=(1, 1),
                    enc_drop_path=0.0, dec_drop_path=0.0, ssm_backend="assoc")
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    gts = jnp.asarray((rng.uniform(size=(2, 32, 32, 1)) > 0.5).astype(np.float32))
    variables = model.init(jax.random.key(0), images)
    state = create_train_state(model, variables, make_optimizer(base_lr=1e-3))
    step = make_train_step(donate=False)
    losses = []
    for _ in range(12):
        state, m = step(state, images, gts, jax.random.key(1))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] - 0.2, losses  # steady descent (loss floor ~2.3 from 4-head BCE+IoU)


def test_ss2d_tensor_parallel_matches_composed():
    """Channel-sharded SS2D (d_inner over the 8-device 'model' axis, three
    psums per block — parallel/tp.py) matches the single-device composed
    path bit-closely, for raster and a windowed guide order."""
    from tramba_tpu.nn.ssm import SS2D
    from tramba_tpu.parallel.tp import use_tensor_mesh

    rng = np.random.default_rng(5)
    mesh = make_mesh(("model",))
    for kind, param, K in (("raster", 0, 4), ("window", 4, 4), ("line", 0, 8)):
        x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)).astype(np.float32))
        ln = (jnp.asarray(rng.normal(size=(16,)).astype(np.float32) * 0.1 + 1),
              jnp.asarray(rng.normal(size=(16,)).astype(np.float32) * 0.1))
        kw = dict(d_model=16, scan_kind=kind, scan_param=param, k_group=K)
        ref = SS2D(backend="assoc", **kw)
        variables = ref.init(jax.random.key(0), x, ln=ln)
        want = ref.apply(variables, x, ln=ln)
        tp = SS2D(backend="tensor_parallel", **kw)
        with use_tensor_mesh(mesh, "model"):
            got = jax.jit(lambda v, a: tp.apply(v, a, ln=ln))(variables, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


def test_model_level_tensor_parallel():
    """Whole tiny flagship with ssm_backend='tensor_parallel' on a dp x tp
    mesh: every SS2D (encoder raster, decoder line, guide window/dilation)
    shards d_inner over 'model' while the batch shards over 'data'."""
    from tramba_tpu.models.tramba import TrambaV
    from tramba_tpu.parallel.tp import use_tensor_mesh

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))

    def build(backend):
        return TrambaV(img_size=64, dims=8, enc_depths=(1, 1, 1, 1),
                       dec_depths=(1, 1, 1, 1), ssm_backend=backend)

    variables = build("assoc").init(jax.random.key(0), x)
    want = build("assoc").apply(variables, x)

    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("data", "model"))
    with use_tensor_mesh(mesh, "model", batch_axis="data"):
        got = jax.jit(lambda v, a: build("tensor_parallel").apply(v, a))(variables, x)
        got = jax.tree.map(np.asarray, got)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=2e-4, atol=2e-4)


def test_model_level_hybrid_tp_sp(monkeypatch):
    """3-axis dp x tp x sp: 'hybrid_tp_sp' routes each SS2D by its own L —
    long sequences through the sequence-parallel scan ('seq'), the rest
    through the tensor-parallel core ('model') — and the whole tiny
    flagship's output matches the composed single-device model."""
    from tramba_tpu.models.tramba import TrambaV
    from tramba_tpu.parallel.seq_scan import use_sequence_mesh
    from tramba_tpu.parallel.tp import use_tensor_mesh

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))

    def build(backend):
        return TrambaV(img_size=64, dims=8, enc_depths=(1, 1, 1, 1),
                       dec_depths=(1, 1, 1, 1), ssm_backend=backend)

    variables = build("assoc").init(jax.random.key(0), x)
    want = build("assoc").apply(variables, x)

    from jax.sharding import Mesh

    monkeypatch.setenv("TRAMBA_HYBRID_SP_MIN_L", "256")  # 64px model: stage 1 -> sp
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 2, 2),
                ("data", "model", "seq"))
    with use_tensor_mesh(mesh, "model", batch_axis="data"), \
            use_sequence_mesh(mesh, "seq", batch_axis="data"):
        got = jax.jit(lambda v, a: build("hybrid_tp_sp").apply(v, a))(variables, x)
        got = jax.tree.map(np.asarray, got)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=2e-4, atol=2e-4)
