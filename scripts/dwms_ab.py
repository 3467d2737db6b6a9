"""A/B the dwms FFN forwards on-chip: unrolled-chunk (v1) vs grid-chunked
(v2) at the decoder's live shapes.  Usage: python scripts/dwms_ab.py"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from tramba_tpu.utils.cache import enable_compilation_cache

STACK = 4


def _stacked(fn, args):
    @jax.jit
    def g(*a):
        tot = jnp.float32(0)
        for i in range(STACK):
            out = fn(a[0] + jnp.asarray(i * 1e-6, a[0].dtype), *a[1:])
            tot = tot + jnp.sum(out.astype(jnp.float32))
        return tot

    return g


def _time(g, args, iters=10):
    float(g(*args))
    float(g(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = g(*args)
    float(out)
    return (time.perf_counter() - t0) / iters / STACK


def main():
    enable_compilation_cache()
    from tramba_tpu.ops.fused_mlp import (_dwms_pallas, _dwms_pallas2,
                                          _row_chunk_grid, _row_chunk_mlp,
                                          composed_ln_dwmsmlp)

    rng = np.random.default_rng(0)
    t = lambda *s: jnp.asarray((rng.normal(size=s) * 0.2).astype(np.float32))
    B = 16
    for H, D, Hd in ((96, 128, 512), (48, 256, 1024), (24, 512, 2048)):
        args = [t(B, H, H, D).astype(jnp.bfloat16), t(D) + 1.0, t(D),
                t(D, Hd), t(Hd)]
        for k in (3, 5, 7):
            args += [t(k, k, 1, Hd), t(Hd)]
        args += [t(Hd, D), t(D)]
        print(f"H={H} D={D} Hd={Hd}: v1 Tr={_row_chunk_mlp(H, H, Hd)} "
              f"v2 Tr={_row_chunk_grid(H, H, min(Hd, 256))}", flush=True)
        want = None
        for name, fn in (("v1", _dwms_pallas), ("v2", _dwms_pallas2),
                         ("composed", composed_ln_dwmsmlp)):
            try:
                g = _stacked(fn, args)
                d = _time(g, args)
                out = jax.jit(fn)(*args)
                if want is None and name == "composed":
                    pass
                print(f"  {name:<9} {d * 1e3:7.3f} ms", flush=True)
                if name == "composed":
                    want = out
            except Exception as e:  # noqa: BLE001
                print(f"  {name:<9} FAILED {type(e).__name__}: {str(e)[:90]}",
                      flush=True)
        # parity of v2 vs composed on-chip
        try:
            got = jax.jit(_dwms_pallas2)(*args)
            err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                        - want.astype(jnp.float32))))
            print(f"  v2 max abs err vs composed: {err:.2e}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  parity FAILED {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
