"""Test config: force an 8-device virtual CPU mesh before JAX backends init.

Multi-chip sharding logic is exercised on CPU (the TPU-world answer to
"test multi-node without a cluster"); the real chip is reserved for bench.

Note: this image registers an `axon` TPU PJRT plugin from sitecustomize at
interpreter start, and the JAX_PLATFORMS env var alone does not demote it —
`jax.config.update('jax_platforms', ...)` after import does.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
