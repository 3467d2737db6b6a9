"""Non-SS2D residual attribution: where the model's time outside the SS2D
kernels goes (stem, FFN kernels, expands, DCT chain, gates, heads).

Each component is timed as _STACK perturbed copies inside ONE jit (amortizes
the ~2 ms tunnel dispatch floor, defeats CSE) — same methodology as
scripts/roofline.measure_segments.  Usage: python scripts/residual_bench.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from tramba_tpu.utils.cache import enable_compilation_cache
from tramba_tpu.utils.jit import tramba_jit

_STACK = 4


def _sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))


def _time(fn, *args, iters=10, warmup=2):
    out = fn(*args)
    _sync(out)
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters / _STACK


def _stacked_apply(mod, x, **kw):
    params = tramba_jit(lambda k: mod.init(k, x, **kw))(jax.random.key(0))

    @tramba_jit
    def f(p, a):
        tot = jnp.float32(0)
        for i in range(_STACK):
            out = mod.apply(p, a + jnp.asarray(i, a.dtype) * jnp.asarray(1e-6, a.dtype), **kw)
            tot = tot + jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32))
        return tot

    return f, params


def main():
    enable_compilation_cache()
    B = 16
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    t = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.1, dt)

    from tramba_tpu.nn.blocks import VSSBlock, MultiScaleDecoderBlock
    from tramba_tpu.nn.freq import FreqBlock
    from tramba_tpu.nn.layers import PatchExpand, FinalPatchExpandX4
    from tramba_tpu.models.vssm_encoder import VSSMEncoder
    from tramba_tpu.models.tramba import window_for_resolution
    from tramba_tpu.ops.dct import dct2d_quadrants

    rows = []

    # encoder stem + downsamples: full encoder minus its blocks is awkward;
    # instead measure the per-stage FFN + the guides' non-SS2D parts directly.
    from flax import linen as nn

    class _FFNOnly(nn.Module):
        dim: int
        kind: str = "plain"
        ratio: float = 4.0

        @nn.compact
        def __call__(self, x):
            from tramba_tpu.nn.blocks import ffn_branch
            return ffn_branch(x, self.dim, self.ratio, None, dt, kind=self.kind)

    for H, dim, kind, n, label in (
        (96, 128, "plain", 2, "enc_s1 FFN"),
        (48, 256, "plain", 2, "enc_s2 FFN"),
        (24, 512, "plain", 15, "enc_s3 FFN"),
        (12, 1024, "plain", 2, "enc_s4 FFN"),
        (24, 512, "dwms", 2, "dec_s0 FFN(dwms)"),
        (48, 256, "dwms", 2, "dec_s1 FFN(dwms)"),
        (96, 128, "dwms", 2, "dec_s2 FFN(dwms)"),
        (24, 512, "plain", 1, "guide24 FFN"),
        (48, 256, "plain", 1, "guide48 FFN"),
        (96, 128, "plain", 1, "guide96 FFN"),
    ):
        x = t(B, H, H, dim)
        try:
            f, p = _stacked_apply(_FFNOnly(dim, kind), x)
            d = _time(f, p, x)
        except Exception as e:
            print(f"{label}: FAILED {type(e).__name__}: {str(e)[:100]}", flush=True)
            continue
        rows.append((label, d, n))

    # upsamplers
    for Hin, cin, label in ((12, 1024, "expand 12->24"), (24, 512, "expand 24->48"),
                            (48, 256, "expand 48->96")):
        x = t(B, Hin, Hin, cin)
        try:
            f, p = _stacked_apply(PatchExpand(dtype=dt), x)
            rows.append((label, _time(f, p, x), 1))
        except Exception as e:
            print(f"{label}: FAILED {type(e).__name__}: {str(e)[:100]}", flush=True)
    x = t(B, 96, 96, 128)
    try:
        f, p = _stacked_apply(FinalPatchExpandX4(dtype=dt), x, pre_shuffle=True)
        rows.append(("final expand x4 (pre-shuffle)", _time(f, p, x), 1))
    except Exception as e:
        print(f"final expand x4: FAILED {type(e).__name__}: {str(e)[:100]}", flush=True)

    # DCT quadrants + the two FreqExpands + gate (the FreqSS2D non-SS2D part)
    for H, dim, label in ((24, 512, "dct+expand 24"), (48, 256, "dct+expand 48"),
                          (96, 128, "dct+expand 96")):
        from tramba_tpu.nn.layers import FreqExpand2D

        class _DctExpand(nn.Module):
            @nn.compact
            def __call__(self, x):
                hi, lo = dct2d_quadrants(x)
                return (FreqExpand2D(dtype=dt, name="h")(hi)
                        + FreqExpand2D(dtype=dt, name="l")(lo))

        x = t(B, H, H, dim)
        try:
            f, p = _stacked_apply(_DctExpand(), x)
            rows.append((label, _time(f, p, x), 1))
        except Exception as e:
            print(f"{label}: FAILED {type(e).__name__}: {str(e)[:100]}", flush=True)

    total = 0.0
    for label, d, n in rows:
        print(f"{label:<28} {d * 1e3:7.3f} ms  x{n} = {d * n * 1e3:6.2f} ms", flush=True)
        total += d * n
    print(f"sum of measured residual components: {total * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
