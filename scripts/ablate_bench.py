"""IN-MODEL attribution by ablation: null one component inside the real
flagship model, re-jit, and report the full-model wall-time delta.

Standalone module timings (residual_bench / decoder_bench) overestimate —
XLA fuses differently in context (the composed final head measured 13.5 ms
standalone but ~4 ms in-model).  The delta of the full jitted model with a
component removed is the only trustworthy per-component number.

Usage: python scripts/ablate_bench.py [--batch 16]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from tramba_tpu.utils.cache import enable_compilation_cache
from tramba_tpu.utils.jit import tramba_jit


def _time_model(model, x, iters=20, warmup=3):
    params = tramba_jit(lambda k: model.init(k, x))(jax.random.key(0))

    @tramba_jit
    def fwd(p, a):
        outs = model.apply(p, a)
        return jnp.sum(outs[-1].astype(jnp.float32))

    float(fwd(params, x))
    for _ in range(warmup):
        out = fwd(params, x)
    float(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, x)
    float(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--only", default="")
    args = ap.parse_args()
    enable_compilation_cache()
    B = args.batch
    dt = jnp.bfloat16

    import tramba_tpu.nn.blocks as blocks
    import tramba_tpu.nn.freq as freq
    import tramba_tpu.nn.ssm as ssm
    import tramba_tpu.ops.fused_expand as fx
    from tramba_tpu.models.tramba import TrambaV

    x = jnp.zeros((B, 384, 384, 3), dt)

    orig_ffn = blocks.ffn_branch
    orig_freq_call = freq.FreqBlock.__call__
    orig_ssm_call = ssm.SS2D.__call__
    orig_head_ok = fx.final_head_fusable

    def restore():
        blocks.ffn_branch = orig_ffn
        freq.FreqBlock.__call__ = orig_freq_call
        ssm.SS2D.__call__ = orig_ssm_call
        fx.final_head_fusable = orig_head_ok

    def no_ffn():
        blocks.ffn_branch = lambda x, *a, **k: jnp.zeros_like(x)

    def no_ssm():
        ssm.SS2D.__call__ = lambda self, x, *a, **k: x

    def no_guides():
        freq.FreqBlock.__call__ = lambda self, x, *a, **k: x

    def composed_head():
        fx.final_head_fusable = lambda *a: False

    def _ssm_only_kind(*kinds):
        def patched(self, x, *a, **k):
            if self.scan_kind in kinds:
                return x
            return orig_ssm_call(self, x, *a, **k)

        return lambda: setattr(ssm.SS2D, "__call__", patched)

    cases = [
        ("full", None),
        ("no_ffn", no_ffn),
        ("no_ssm", no_ssm),
        ("no_guides", no_guides),
        ("composed_head", composed_head),
        # SS2D sub-attribution: null only one scan family
        ("no_ssm_raster", _ssm_only_kind("raster")),       # encoder blocks
        ("no_ssm_line", _ssm_only_kind("line")),           # decoder MS blocks
        ("no_ssm_freq", _ssm_only_kind("window", "dilation")),  # guide DFVSS
    ]
    if args.only:
        keep = set(args.only.split(","))
        cases = [c for c in cases if c[0] in keep or c[0] == "full"]

    base = None
    for name, patch in cases:
        restore()
        if patch:
            patch()
        try:
            d = _time_model(TrambaV(dtype=dt), x)
        except Exception as e:  # noqa: BLE001
            print(f"{name:<16} FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
            continue
        if name == "full":
            base = d
            print(f"{name:<16} {d * 1e3:7.2f} ms", flush=True)
        else:
            print(f"{name:<16} {d * 1e3:7.2f} ms   delta {((base or d) - d) * 1e3:+7.2f} ms",
                  flush=True)
    restore()


if __name__ == "__main__":
    main()
