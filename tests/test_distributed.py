"""Multi-host DCN data-parallel plumbing, simulated single-process.

The real multi-host path needs N processes; what is testable here: the
deterministic per-host batch partitioning (every host computes the same
global permutation and takes disjoint slices), the local->global array
assembly, and that single-process runs are untouched.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from tramba_tpu.parallel.distributed import (
    global_data_mesh,
    host_shard_batch,
    initialize_from_args,
    local_replica,
)


class _FakeDS:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n


def _loader(n, bs, rank, count, shuffle=True):
    from tramba_tpu.data.pipeline import BatchLoader

    return BatchLoader(_FakeDS(n), batch_size=bs, shuffle=shuffle, seed=7,
                       shard_rank=rank, shard_count=count)


def test_host_shard_partition_is_disjoint_and_complete():
    n, bs, count = 37, 8, 4
    per_host = [_loader(n, bs, r, count)._batches() for r in range(count)]
    n_batches = len(per_host[0])
    assert all(len(b) == n_batches for b in per_host)
    # ragged last global batch dropped: 37 // 8 = 4 full batches
    assert n_batches == 4
    for i in range(n_batches):
        slices = [per_host[r][i] for r in range(count)]
        assert all(len(s) == bs // count for s in slices)
        merged = [idx for s in slices for idx in s]
        assert len(set(merged)) == bs  # disjoint
    all_indices = {idx for b in per_host for batch in b for idx in batch}
    assert len(all_indices) == n_batches * bs  # complete coverage of kept batches


def test_host_shards_agree_on_the_global_permutation():
    a = _loader(100, 10, 0, 2)
    b = _loader(100, 10, 1, 2)
    ba, bb = a._batches(), b._batches()
    # rank slices are contiguous halves of the same shuffled global batch
    full = _loader(100, 10, 0, 1)._batches()
    for i in range(len(ba)):
        assert ba[i] == full[i][:5]
        assert bb[i] == full[i][5:10]


def test_single_process_loader_unchanged():
    assert _loader(20, 8, 0, 1, shuffle=False)._batches() == [
        list(range(0, 8)), list(range(8, 16)), list(range(16, 20))]


def test_initialize_noop_without_env(monkeypatch):
    monkeypatch.delenv("TRAMBA_NUM_PROCESSES", raising=False)
    assert initialize_from_args("tcp://127.0.0.1:33115") is False


def test_host_shard_batch_assembles_global_arrays():
    mesh = global_data_mesh()
    x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    v = np.ones((8,), np.float32)
    gx, gv = host_shard_batch((x, v), mesh)
    assert gx.shape == (8, 3) and gv.shape == (8,)
    np.testing.assert_array_equal(np.asarray(gx), x)
    # sharded over 'data': one row per device
    assert gx.addressable_shards[0].data.shape == (1, 3)


def test_local_replica_roundtrip():
    mesh = global_data_mesh()
    from tramba_tpu.parallel.mesh import replicate_tree

    tree = {"w": jnp.arange(6.0).reshape(2, 3)}
    rep = replicate_tree(tree, mesh)
    back = local_replica(rep)
    np.testing.assert_array_equal(back["w"], np.arange(6.0).reshape(2, 3))
