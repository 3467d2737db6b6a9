"""Benchmark: flagship Tramba-V 384px inference throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Baseline target: 500 images/sec/chip @ 384px (BASELINE.md).

Self-auditing perf evidence (VERDICT r2 #2):
  - the HBM copy roofline is the MEDIAN of >=10 probe runs, with the
    min/median/max spread reported so the bandwidth-scaled number is
    auditable (the tunneled chip's probe is noisy run-to-run);
  - per-segment achieved GB/s vs that roofline is embedded under
    "segments" (the full kit is scripts/roofline.py).

Note: on the tunneled axon backend, block_until_ready does not synchronize;
completion is forced by fetching a scalar reduction of the output.
"""

import json
import time

import jax
import jax.numpy as jnp

from tramba_tpu.utils.cache import enable_compilation_cache
from tramba_tpu.utils.jit import tramba_jit

HBM_PROBE_RUNS = 11


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

    # required model FLOPs (fvcore-style: 2MNK dots/convs + the reference's
    # 9-flops/element scan handle, csms6s.py:772-793), traced on the COMPOSED
    # model so nothing hides inside Pallas custom calls; plus XLA's own count
    # of the fused executable (a lower bound — Mosaic custom calls report ~0)
    from tramba_tpu.utils.profiling import analytic_model_flops

    model_seq = TrambaV(dtype=dtype, ssm_backend="seq")
    flops = analytic_model_flops(
        lambda p, a: model_seq.apply(p, a)[-1], params, x)
    gflops = flops["total_flops"] / 1e9
    achieved_gflops = gflops / dt
    try:
        ca = fwd.lower(params, x).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        xla_fused_gflops = round(float(ca.get("flops", 0.0)) / 1e9, 1)
    except Exception:
        xla_fused_gflops = None

    # measured MXU peak on THIS chip (same-process, like the HBM probe)
    import scripts.roofline as rl

    mxu_tflops, _ = rl.measure_mxu_peak()

    # measured HBM copy roofline on THIS chip: median of HBM_PROBE_RUNS
    # passthrough-probe repetitions with the spread reported (the committed
    # probe, not the spec sheet — see scripts/roofline.py).
    probes = sorted(rl.measure_hbm_bandwidth(mbytes=256)[0]
                    for _ in range(HBM_PROBE_RUNS))
    hbm_gbs = probes[len(probes) // 2]

    # per-segment achieved bandwidth vs that roofline: the flagship's fused
    # SS2D kernels at their real shapes (compact; ms + GB/s + roofline frac)
    seg_rows, seg_total = rl.measure_segments(B=batch, dtype=dtype,
                                              hbm_gbs=hbm_gbs)
    segments = [
        {"seg": r["segment"], "ms": r["ms_per_call"], "n": r["blocks"],
         "gbps": r["achieved_gbps_est"], "roof": r["roofline_frac"]}
        for r in seg_rows
    ]

    # the non-SS2D kernels (VERDICT r4 #3): FFN megakernels + final head at
    # flagship shapes with per-kernel matmul GFLOP/s and MFU vs the
    # co-measured MXU peak (depthwise-conv taps are VPU work, listed apart)
    ffn_rows, ffn_total = rl.measure_ffn_segments(B=batch, dtype=dtype,
                                                  mxu_tflops=mxu_tflops)
    ffn_segments = [
        {"seg": r["seg"], "ms": r["ms"], "n": r["n"],
         "gflops_per_s": r["gflops_per_s"], "mfu": r["mfu"]}
        for r in ffn_rows
    ]

    print(
        json.dumps(
            {
                "metric": "images_per_sec_per_chip_384px_bf16",
                "value": round(ips, 2),
                "unit": "img/s",
                "vs_baseline": round(ips / 500.0, 4),
                "model_ms": round(dt * 1e3, 2),
                "hbm_copy_gbps_median": round(hbm_gbs, 1),
                "hbm_probe": {
                    "n": len(probes),
                    "min": round(probes[0], 1),
                    "median": round(hbm_gbs, 1),
                    "max": round(probes[-1], 1),
                },
                "vs_baseline_bw_scaled": round(
                    ips / 500.0 * 819.0 / hbm_gbs, 3
                ),  # vs_baseline if this memory-bound model had v5e-spec HBM BW
                # compute-side roofline: required model GFLOPs (analytic) at
                # the achieved rate, vs the co-measured MXU peak and v5e spec
                "model_gflops": round(gflops, 1),
                "model_gflops_split": {
                    "matmul_conv": round(flops["matmul_conv_flops"] / 1e9, 1),
                    "scan_handle": round(flops["scan_handle_flops"] / 1e9, 1),
                },
                "xla_fused_gflops": xla_fused_gflops,
                "achieved_gflops_per_s": round(achieved_gflops, 1),
                "mxu_bf16_tflops_measured": round(mxu_tflops, 1),
                "mfu_vs_measured_peak": round(
                    achieved_gflops / (mxu_tflops * 1e3), 4),
                "mfu_vs_v5e_spec_197t": round(achieved_gflops / 197e3, 4),
                # NB: segments are standalone stacked-jit timings and carry
                # per-call floors, so their sum OVERCOUNTS the in-model cost
                # and the difference below is a lower bound on the non-SS2D
                # share (it can go negative).  The trustworthy per-component
                # split is scripts/ablate_bench.py (in-model nulling), which
                # fully accounts for the forward: raster 42 + line 43 +
                # freq 19 + FFN 33.5 + guides-rest ~5 + head ~4 ms of 148.
                "ss2d_kernel_ms": round(seg_total * 1e3, 2),
                "model_minus_segments_ms": round(dt * 1e3 - seg_total * 1e3, 2),
                "segments": segments,
                "ffn_kernel_ms": round(ffn_total * 1e3, 2),
                "ffn_segments": ffn_segments,
            }
        )
    )


if __name__ == "__main__":
    main()
