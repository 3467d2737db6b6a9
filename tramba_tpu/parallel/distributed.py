"""Multi-host (DCN-spanning) data parallelism.

The reference's ``run.py`` exposes ``--init_method tcp://...`` and
``--parallel`` but never uses them (run.py:46-53 — dead flags).  Here they
are live: each host launches the same CLI, ``initialize_from_args`` connects
the processes over DCN, the device mesh spans every host's chips, each host
feeds its own slice of the global batch (``BatchLoader(shard_rank=...,
shard_count=...)``), and the compiler-inserted gradient psums ride ICI within
a host and DCN across hosts.

Env protocol (any JAX-standard env also works — TPU pods auto-detect):
  TRAMBA_NUM_PROCESSES  total host processes
  TRAMBA_PROCESS_ID     this host's rank
  coordinator address   from --init_method tcp://host:port
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["initialize_from_args", "global_data_mesh", "host_shard_batch",
           "local_replica"]


def initialize_from_args(init_method: Optional[str] = None) -> bool:
    """Initialize ``jax.distributed`` when multi-process env vars are set.

    Returns True when running multi-host.  Single-process runs are untouched
    (no env vars -> no-op, False).
    """
    n = int(os.environ.get("TRAMBA_NUM_PROCESSES", "1"))
    if n <= 1:
        return jax.process_count() > 1
    pid = int(os.environ["TRAMBA_PROCESS_ID"])
    addr = None
    if init_method and init_method.startswith("tcp://"):
        addr = init_method[len("tcp://"):]
    jax.distributed.initialize(coordinator_address=addr, num_processes=n, process_id=pid)
    return True


def global_data_mesh() -> Mesh:
    """1-D 'data' mesh over every device of every host."""
    return Mesh(np.asarray(jax.devices()).reshape(-1), ("data",))


def host_shard_batch(local_batch, mesh: Mesh):
    """Per-host local arrays -> global arrays batch-sharded over 'data'.

    Each host passes only its slice (global_batch / process_count rows);
    ``jax.make_array_from_process_local_data`` assembles the logical global
    batch without any cross-host copy.
    """
    sh = NamedSharding(mesh, P("data"))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)), local_batch
    )


def local_replica(tree):
    """Fetch the locally-addressable replica of a replicated array tree as
    numpy (for host-local work like in-loop eval on process 0)."""

    def get(x):
        if hasattr(x, "addressable_data"):
            return np.asarray(x.addressable_data(0))
        return np.asarray(x)

    return jax.tree.map(get, tree)
