"""Device mesh + sharding helpers.

The reference has no live distributed path (SURVEY.md §2.11); this is the
framework's first-class replacement: a ``jax.sharding.Mesh`` over all chips,
batch-data-parallel ``NamedSharding`` for inputs, replicated parameters, and
compiler-inserted psums for gradients.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "data_sharding", "replicated", "shard_batch", "replicate_tree"]


def make_mesh(axis_names: Sequence[str] = ("data",), devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    shape = [len(devices)] + [1] * (len(axis_names) - 1)
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the 'data' mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a pytree of per-host arrays with batch axis sharded over 'data'."""
    sh = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate_tree(tree, mesh: Mesh):
    """Replicate a pytree over every device of ``mesh``.

    Multi-host meshes contain non-addressable devices, where ``device_put``
    is not allowed — there, each process contributes its (identical) local
    copy via ``make_array_from_process_local_data``.  Works for typed PRNG
    key arrays too (via key_data round-trip)."""
    sh = replicated(mesh)
    if all(d.process_index == jax.process_index() for d in mesh.devices.flat):
        return jax.tree.map(lambda x: jax.device_put(x, sh), tree)

    def rep(x):
        if jax.dtypes.issubdtype(getattr(x, "dtype", None), jax.dtypes.prng_key):
            data = jax.make_array_from_process_local_data(
                sh, np.asarray(jax.random.key_data(x)))
            return jax.random.wrap_key_data(data)
        return jax.make_array_from_process_local_data(sh, np.asarray(x))

    return jax.tree.map(rep, tree)
