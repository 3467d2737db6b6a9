"""On-device kernel regression check: fused Pallas paths vs composed oracle.

Runs the real (non-interpret) TPU kernels at small shapes and asserts
forward + gradient parity against the composed implementation — the quick
hardware lock-in for what tests/ run in interpreter mode on CPU.

Usage: python scripts/device_check.py   (exits non-zero on failure)
"""

import sys

sys.path.insert(0, "/root/repo")

import jax

# fp32 parity: TPU matmuls default to bf16 MACs, which would make the
# composed ORACLE (einsums) the imprecise side of the comparison
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np


def _inputs(B, K, L, D, R, seed):
    rng = np.random.default_rng(seed)
    return [jnp.asarray(a) for a in (
        rng.normal(size=(B, K, L, D)).astype(np.float32),
        (rng.normal(size=(K, R + 2, D)) * 0.2).astype(np.float32),
        (rng.normal(size=(K, D, R)) * 0.3).astype(np.float32),
        (rng.normal(size=(K, D)) * 0.2).astype(np.float32),
        rng.normal(size=(K, D, 1)).astype(np.float32) * 0.3,
        rng.normal(size=(K, D)).astype(np.float32),
    )]


def _full_inputs(B, K, H, D, R, seed):
    rng = np.random.default_rng(seed)
    L = H * H
    return [jnp.asarray(a) for a in (
        rng.normal(size=(B, L, D)).astype(np.float32),
        (rng.normal(size=(K, R + 2, D)) * 0.2).astype(np.float32),
        (rng.normal(size=(K, D, R)) * 0.3).astype(np.float32),
        (rng.normal(size=(K, D)) * 0.2).astype(np.float32),
        rng.normal(size=(K, D, 1)).astype(np.float32) * 0.3,
        rng.normal(size=(K, D)).astype(np.float32),
        (rng.normal(size=(D,)) * 0.1 + 1).astype(np.float32),
        (rng.normal(size=(D,)) * 0.1).astype(np.float32),
        (rng.normal(size=(D, D // 2)) * 0.2).astype(np.float32),
    )]


def _check(name, got, want, tol):
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))))
    status = "PASS" if err <= tol else "FAIL"
    print(f"  {status} {name}: max abs err {err:.2e} (tol {tol:g})")
    return err <= tol


def main():
    from tramba_tpu.ops.fused_ss2d import (
        composed_ss2d_core, composed_ss2d_full, composed_ss2d_full_p,
        fused_ss2d_core, fused_ss2d_freq, fused_ss2d_full,
    )

    assert jax.default_backend() == "tpu", f"need TPU, got {jax.default_backend()}"
    print(f"device: {jax.devices()[0]}")
    ok = True

    # core kernel, ragged chunks (L=300 crosses the 256 boundary)
    args = _inputs(2, 4, 300, 16, 3, 0)
    y_f = jax.jit(fused_ss2d_core)(*args)
    y_c = jax.jit(lambda *a: composed_ss2d_core(*a, backend="assoc"))(*args)
    ok &= _check("core fwd (L=300)", y_f, y_c, 5e-4)
    gf = jax.jit(jax.grad(lambda *a: jnp.sum(jnp.tanh(fused_ss2d_core(*a))),
                          argnums=tuple(range(6))))(*args)
    gc = jax.jit(jax.grad(lambda *a: jnp.sum(jnp.tanh(composed_ss2d_core(*a, backend="assoc"))),
                          argnums=tuple(range(6))))(*args)
    for i, (a, b) in enumerate(zip(gf, gc)):
        ok &= _check(f"core grad[{i}]", a, b, 5e-3)

    # folded raster + line, fwd + dx grad
    for kind, K in (("raster", 4), ("line", 8)):
        fargs = _full_inputs(2, K, 24, 16, 3, 1)
        y_f = jax.jit(lambda *a: fused_ss2d_full(*a, kind, 24, 24))(*fargs)
        y_c = jax.jit(lambda *a: composed_ss2d_full(*a, kind=kind, H=24, W=24,
                                                    backend="assoc"))(*fargs)
        ok &= _check(f"folded {kind} fwd", y_f, y_c, 1e-3)
        gf = jax.jit(jax.grad(lambda *a: jnp.sum(jnp.tanh(fused_ss2d_full(*a, kind, 24, 24))),
                              argnums=(0, 1, 4)))(*fargs)
        gc = jax.jit(jax.grad(lambda *a: jnp.sum(jnp.tanh(
            composed_ss2d_full(*a, kind=kind, H=24, W=24, backend="assoc"))),
            argnums=(0, 1, 4)))(*fargs)
        for n, a, b in zip(("dx", "dwx", "dAlogs"), gf, gc):
            ok &= _check(f"folded {kind} grad {n}", a, b, 5e-3)

    # freq paths
    for kind, param in (("dilation", 4), ("window", 8)):
        fargs = _full_inputs(2, 4, 24, 16, 3, 2)
        y_f = jax.jit(lambda *a: fused_ss2d_freq(*a, kind, 24, 24, param))(*fargs)
        y_c = jax.jit(lambda *a: composed_ss2d_full_p(*a, kind=kind, H=24, W=24,
                                                      param=param, backend="assoc"))(*fargs)
        ok &= _check(f"freq {kind} fwd", y_f, y_c, 1e-3)
        gf = jax.jit(jax.grad(lambda *a: jnp.sum(jnp.tanh(
            fused_ss2d_freq(*a, kind, 24, 24, param))), argnums=(0, 1)))(*fargs)
        gc = jax.jit(jax.grad(lambda *a: jnp.sum(jnp.tanh(
            composed_ss2d_full_p(*a, kind=kind, H=24, W=24, param=param,
                                 backend="assoc"))), argnums=(0, 1)))(*fargs)
        for n, a, b in zip(("dx", "dwx"), gf, gc):
            ok &= _check(f"freq {kind} grad {n}", a, b, 5e-3)

    # row-chunked dilation merge-fold (96px-class shape: whole map exceeds
    # the single-block budget so the fold tiles Tr=32 rows — round 4)
    from tramba_tpu.ops.fused_ss2d import _freq_merge_rows

    Hs, Dd = 64, 160
    assert _freq_merge_rows("dilation", Hs, Hs, Dd, 4, 4) == 32
    fargs = _full_inputs(1, 4, Hs, Dd, 3, 9)
    y_f = jax.jit(lambda *a: fused_ss2d_freq(*a, "dilation", Hs, Hs, 4))(*fargs)
    y_c = jax.jit(lambda *a: composed_ss2d_full_p(*a, kind="dilation", H=Hs, W=Hs,
                                                  param=4, backend="assoc"))(*fargs)
    ok &= _check("freq dilation row-chunked fwd", y_f, y_c, 1e-3)

    # smallmap megakernel SAVED-STATE backward (round 4): the train forward
    # emits u / pre-LN sum / chunk carries and the adjoint runs the native
    # chunked bwd kernels with NO forward recompute — lock grads on hardware
    from tramba_tpu.ops.fused_ss2d_small import composed_ss2d_small, fused_ss2d_small

    rng = np.random.default_rng(7)
    Hs, dm, Dd = 16, 32, 64
    arr = lambda *s, sc=0.2: jnp.asarray((rng.normal(size=s) * sc).astype(np.float32))
    sargs = (arr(1, Hs * Hs, dm, sc=1.0), arr(dm, sc=0.1) + 1, arr(dm, sc=0.1),
             arr(dm, Dd), arr(3, 3, 1, Dd, sc=0.3), arr(4, 5, Dd),
             arr(4, Dd, 3, sc=0.3), arr(4, Dd), arr(4, Dd, 1, sc=0.3),
             arr(4, Dd, sc=1.0), arr(Dd, sc=0.1) + 1, arr(Dd, sc=0.1), arr(Dd, dm))
    ns = ("dx", "dln1s", "dln1b", "dwin", "dconv", "dwx", "dwdt", "dbias",
          "dAlogs", "dDs", "dlns", "dlnb", "dwout")
    gf = jax.jit(jax.grad(lambda *a: jnp.sum(jnp.tanh(
        fused_ss2d_small(*a, Hs, Hs))), argnums=tuple(range(13))))(*sargs)
    gc = jax.jit(jax.grad(lambda *a: jnp.sum(jnp.tanh(
        composed_ss2d_small(a[0], (a[1], a[2]), *a[3:], Hs, Hs))),
        argnums=tuple(range(13))))(*sargs)
    for n, a, b in zip(ns, gf, gc):
        ok &= _check(f"smallmap saved-bwd grad {n}", a, b, 5e-3)

    # per-block FFN megakernels + SS2D prologue
    from tramba_tpu.ops.fused_mlp import (
        composed_ln_dwmsmlp, composed_ln_mlp, fused_ln_dwmsmlp, fused_ln_mlp,
    )
    from tramba_tpu.ops.fused_prologue import composed_prologue, fused_prologue

    rng = np.random.default_rng(3)
    D, Hd = 128, 512
    x = jnp.asarray(rng.normal(size=(2, 96, D)).astype(np.float32))
    margs = (x, jnp.asarray((rng.normal(size=(D,)) * 0.1 + 1).astype(np.float32)),
             jnp.asarray((rng.normal(size=(D,)) * 0.1).astype(np.float32)),
             jnp.asarray((rng.normal(size=(D, Hd)) * 0.1).astype(np.float32)),
             jnp.asarray((rng.normal(size=(Hd,)) * 0.1).astype(np.float32)),
             jnp.asarray((rng.normal(size=(Hd, D)) * 0.1).astype(np.float32)),
             jnp.asarray((rng.normal(size=(D,)) * 0.1).astype(np.float32)))
    ok &= _check("ln+mlp fwd", jax.jit(fused_ln_mlp)(*margs),
                 jax.jit(composed_ln_mlp)(*margs), 1e-3)

    xi = jnp.asarray(rng.normal(size=(2, 24, 24, D)).astype(np.float32))
    convs = []
    for k in (3, 5, 7):
        convs.append(jnp.asarray((rng.normal(size=(k, k, 1, Hd)) * 0.1).astype(np.float32)))
        convs.append(jnp.asarray((rng.normal(size=(Hd,)) * 0.1).astype(np.float32)))
    dargs = (xi, *margs[1:5], *convs, *margs[5:])
    ok &= _check("ln+dwmsmlp fwd", jax.jit(fused_ln_dwmsmlp)(*dargs),
                 jax.jit(composed_ln_dwmsmlp)(*dargs), 1e-3)

    pargs = (xi, margs[1], margs[2],
             jnp.asarray((rng.normal(size=(D, 2 * D)) * 0.1).astype(np.float32)),
             jnp.asarray((rng.normal(size=(3, 3, 1, 2 * D)) * 0.2).astype(np.float32)))
    ok &= _check("prologue fwd", jax.jit(fused_prologue)(*pargs),
                 jax.jit(composed_prologue)(*pargs), 1e-3)

    # PVTv2 fused kernels: SRA attention + dwconv-chain FFN
    from tramba_tpu.ops.fused_attn import composed_sra, fused_sra
    from tramba_tpu.ops.fused_mlp import composed_ln_dwmlp, fused_ln_dwmlp

    rng = np.random.default_rng(4)
    C, nh, Lk = 128, 2, 16
    t = lambda *s: jnp.asarray((rng.normal(size=s) * 0.2).astype(np.float32))
    sargs = (t(2, 64, C), t(C) + 1.0, t(C), t(C, C), t(C), t(2, nh, Lk, C // nh),
             t(2, nh, Lk, C // nh), t(C, C), t(C))
    ok &= _check("sra fwd", jax.jit(lambda *a: fused_sra(*a, nh, 1e-6))(*sargs),
                 jax.jit(lambda *a: composed_sra(*a, nh, 1e-6))(*sargs), 1e-3)
    gf = jax.jit(jax.grad(lambda *a: jnp.sum(jnp.tanh(fused_sra(*a, nh, 1e-6))),
                          argnums=(0, 3, 7)))(*sargs)
    gc = jax.jit(jax.grad(lambda *a: jnp.sum(jnp.tanh(composed_sra(*a, nh, 1e-6))),
                          argnums=(0, 3, 7)))(*sargs)
    for n, a, b in zip(("dx", "dwq", "dwp"), gf, gc):
        ok &= _check(f"sra grad {n}", a, b, 5e-3)

    # Swin fused window attention (shifted: with mask)
    from tramba_tpu.models.swin import _shift_attn_mask
    from tramba_tpu.ops.fused_attn import composed_window_attn, fused_window_attn

    wH, ww, wnh = 24, 12, 4
    N = ww * ww
    watt = (t(2, wH, wH, C), t(C) + 1.0, t(C), t(C, 3 * C), t(3 * C),
            t(wnh, N, N), jnp.asarray(_shift_attn_mask(wH, wH, ww, ww // 2)),
            t(C, C), t(C))
    ok &= _check("window attn fwd",
                 jax.jit(lambda *a: fused_window_attn(*a, wnh, 1e-5))(*watt),
                 jax.jit(lambda *a: composed_window_attn(*a, wnh, 1e-5))(*watt),
                 1e-3)
    gf = jax.jit(jax.grad(lambda *a: jnp.sum(jnp.tanh(
        fused_window_attn(*a, wnh, 1e-5))), argnums=(0, 3, 7)))(*watt)
    gc = jax.jit(jax.grad(lambda *a: jnp.sum(jnp.tanh(
        composed_window_attn(*a, wnh, 1e-5))), argnums=(0, 3, 7)))(*watt)
    for n, a, b in zip(("dx", "dwqkv", "dwp"), gf, gc):
        ok &= _check(f"window attn grad {n}", a, b, 5e-3)

    wargs = (t(2, 16, 16, C), t(C) + 1.0, t(C), t(C, 256), t(256),
             t(3, 3, 1, 256), t(256), t(256, C), t(C))
    ok &= _check("ln+dwmlp fwd",
                 jax.jit(lambda *a: fused_ln_dwmlp(*a, 1e-6))(*wargs),
                 jax.jit(lambda *a: composed_ln_dwmlp(*a, 1e-6))(*wargs), 1e-3)
    gf = jax.jit(jax.grad(lambda *a: jnp.sum(jnp.tanh(fused_ln_dwmlp(*a, 1e-6))),
                          argnums=(0, 3)))(*wargs)
    gc = jax.jit(jax.grad(lambda *a: jnp.sum(jnp.tanh(composed_ln_dwmlp(*a, 1e-6))),
                          argnums=(0, 3)))(*wargs)
    for n, a, b in zip(("dx", "dw1"), gf, gc):
        ok &= _check(f"ln+dwmlp grad {n}", a, b, 5e-3)

    # whole-map smallmap megakernel (prologue + 4-dir scan + LN/GELU/proj)
    from tramba_tpu.ops.fused_ss2d_small import composed_ss2d_small, fused_ss2d_small

    rng = np.random.default_rng(5)
    t = lambda *s: jnp.asarray((rng.normal(size=s) * 0.2).astype(np.float32))
    dm, Di, R = 64, 128, 4
    smargs = (t(2, 64, dm), t(dm) + 1.0, t(dm), t(dm, Di), t(3, 3, 1, Di),
              t(4, R + 2, Di), t(4, Di, R), t(4, Di), t(4, Di, 1) * 0.3, t(4, Di),
              t(Di) + 1.0, t(Di), t(Di, dm))
    ok &= _check("smallmap fwd",
                 jax.jit(lambda *a: fused_ss2d_small(*a, 8, 8))(*smargs),
                 jax.jit(lambda x, s, b, *rest: composed_ss2d_small(
                     x, (s, b), *rest, 8, 8))(*smargs),
                 1e-3)

    # native FFN backward kernels (bf16 live shapes; relative tolerance —
    # the composed oracle itself runs bf16 matmuls in its recompute)
    def _rcheck(name, got, want, rtol):
        okk = True
        for i, (a, b) in enumerate(zip(got, want)):
            a = np.asarray(a, dtype=np.float32).reshape(np.asarray(b).shape)
            b = np.asarray(b, dtype=np.float32)
            err = float(np.max(np.abs(a - b))) / (float(np.max(np.abs(b))) + 1e-8)
            status = "PASS" if err <= rtol else "FAIL"
            print(f"  {status} {name}[{i}]: max rel err {err:.2e} (tol {rtol:g})")
            okk &= err <= rtol
        return okk

    from tramba_tpu.ops.fused_mlp import _dwms_bwd_pallas, _mlp_bwd_pallas

    rng = np.random.default_rng(7)
    t = lambda *s: jnp.asarray((rng.normal(size=s) * 0.2).astype(np.float32))
    for L, D, Hd in ((576, 512, 2048), (2304, 256, 1024)):
        bargs = [t(2, L, D).astype(jnp.bfloat16), t(D) + 1.0, t(D), t(D, Hd),
                 t(Hd), t(Hd, D), t(D)]
        gb = t(2, L, D).astype(jnp.bfloat16)
        _, vjp = jax.vjp(composed_ln_mlp, *bargs)
        got = jax.jit(_mlp_bwd_pallas)(bargs[0], gb, *bargs[1:6])
        ok &= _rcheck(f"mlp bwd D={D}", got,
                      [vjp(gb)[i] for i in (0, 1, 2, 3, 4, 5, 6)], 3e-2)

    for Hs, D, Hd in ((96, 128, 512), (48, 256, 1024)):
        bargs = [t(1, Hs, Hs, D).astype(jnp.bfloat16), t(D) + 1.0, t(D),
                 t(D, Hd), t(Hd)]
        for k in (3, 5, 7):
            bargs += [t(k, k, 1, Hd), t(Hd)]
        bargs += [t(Hd, D), t(D)]
        gb = t(1, Hs, Hs, D).astype(jnp.bfloat16)
        _, vjp = jax.vjp(composed_ln_dwmsmlp, *bargs)
        ref = vjp(gb)
        got = jax.jit(_dwms_bwd_pallas)(bargs[0], gb, *bargs[1:12])
        ok &= _rcheck(f"dwms bwd H={Hs}", got, ref[:12] + (ref[12],), 3e-2)

    # fused final head (expand + per-slot LN + 1-channel conv, live shape)
    from tramba_tpu.ops.fused_expand import composed_final_head, fused_final_head

    rng = np.random.default_rng(8)
    t = lambda *s: jnp.asarray((rng.normal(size=s) * 0.2).astype(np.float32))
    for Hh, Ch in ((96, 128), (56, 128)):
        hargs = (t(2, Hh, Hh, Ch).astype(jnp.bfloat16), t(Ch, 16 * Ch),
                 t(Ch) + 1.0, t(Ch), t(Ch), t(1))
        got = np.asarray(jax.jit(fused_final_head)(*hargs), dtype=np.float32)
        want = np.asarray(jax.jit(composed_final_head)(*hargs), dtype=np.float32)
        # logits are O(20); bf16 output quantization alone is 0.0625 abs.
        # The oracle quantizes the expanded hidden to bf16 where the kernel
        # keeps fp32 (kernel is the *more* accurate side), so allow a few
        # bf16 ulps relative to the output scale.
        err = float(np.max(np.abs(got - want))) / float(np.max(np.abs(want)))
        status = "PASS" if err <= 1.5e-2 else "FAIL"
        print(f"  {status} final head H={Hh}: max rel err {err:.2e} (tol 0.015)")
        ok &= err <= 1.5e-2

    # 224px-config stage maps (56 / 28) through the folded raster path
    for Hs in (56, 28):
        fargs = _full_inputs(1, 4, Hs, 16, 3, 6)
        y_f = jax.jit(lambda *a: fused_ss2d_full(*a, "raster", Hs, Hs))(*fargs)
        y_c = jax.jit(lambda *a: composed_ss2d_full(*a, kind="raster", H=Hs, W=Hs,
                                                    backend="assoc"))(*fargs)
        ok &= _check(f"folded raster fwd H={Hs}", y_f, y_c, 1e-3)

    print("DEVICE CHECK:", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
