"""Test config: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip sharding logic is exercised on CPU (the TPU-world answer to
"test multi-node without a cluster"); the real chip is reserved for bench.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"
