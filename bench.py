"""Benchmark: flagship Tramba-V 384px inference throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...} — the
extra keys record the chip's measured HBM copy roofline and where the model
sits against it (the full kit is scripts/roofline.py).
Baseline target: 500 images/sec/chip @ 384px (BASELINE.md).

Note: on the tunneled axon backend, block_until_ready does not synchronize;
completion is forced by fetching a scalar reduction of the output.
"""

import json
import time

import jax
import jax.numpy as jnp

from tramba_tpu.utils.cache import enable_compilation_cache
from tramba_tpu.utils.jit import tramba_jit


def main():
    enable_compilation_cache()
    from tramba_tpu.models.tramba import TrambaV

    batch = 16
    dtype = jnp.bfloat16
    model = TrambaV(dtype=dtype)
    x = jnp.zeros((batch, 384, 384, 3), dtype)
    params = tramba_jit(lambda k: model.init(k, x))(jax.random.key(0))

    @tramba_jit
    def fwd(p, a):
        outs = model.apply(p, a)
        # full-res saliency head + a scalar handle to force completion
        return outs[-1], jnp.sum(outs[-1].astype(jnp.float32))

    def sync(out):
        return float(out[1])

    sync(fwd(params, x))  # compile
    # warmup
    for _ in range(3):
        out = fwd(params, x)
    sync(out)

    iters = 30
    t0 = time.time()
    for _ in range(iters):
        out = fwd(params, x)
    sync(out)
    dt = (time.time() - t0) / iters
    ips = batch / dt

    # measured HBM copy roofline on THIS chip (see scripts/roofline.py): the
    # committed probe, not the spec sheet.  Median of 3 — the tunnel is noisy.
    # (Per-op segment timings live in scripts/roofline.py / op_bench.py; they
    # carry a ~2 ms per-call dispatch floor, so their sum is NOT the in-model
    # kernel share and is no longer reported here.)
    import scripts.roofline as rl

    hbm_gbs = sorted(rl.measure_hbm_bandwidth(mbytes=256)[0] for _ in range(3))[1]

    print(
        json.dumps(
            {
                "metric": "images_per_sec_per_chip_384px_bf16",
                "value": round(ips, 2),
                "unit": "img/s",
                "vs_baseline": round(ips / 500.0, 4),
                "hbm_copy_gbps_measured": round(hbm_gbs, 1),
                "model_ms": round(dt * 1e3, 2),
                "vs_baseline_bw_scaled": round(
                    ips / 500.0 * 819.0 / hbm_gbs, 3
                ),  # vs_baseline if this memory-bound model had v5e-spec HBM BW
            }
        )
    )


if __name__ == "__main__":
    main()
