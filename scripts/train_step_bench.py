"""Flagship training-step wall-time on the real chip.

Measures one jitted train step (fwd + native fused bwd + Adam) at the
reference training config (Tramba-V, batch 4, 384px) — the number VERDICT
round 1 put at 0.39 s/step with the composed-VJP fallback.

Usage: python scripts/train_step_bench.py [--batch 4] [--dtype bfloat16]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from tramba_tpu.utils.cache import enable_compilation_cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--img", type=int, default=384)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--dims", type=int, default=128)
    ap.add_argument("--mu_dtype", default=None,
                    help="Adam first-moment storage dtype (e.g. bfloat16)")
    ap.add_argument("--ab_mu", action="store_true",
                    help="interleaved in-process A/B: fp32-mu vs bf16-mu Adam")
    ap.add_argument("--ab_loss", action="store_true",
                    help="interleaved A/B: real deep-supervision loss chain "
                         "vs null loss (floor: what the loss chain costs)")
    ap.add_argument("--ab_knob", default=None,
                    help="interleaved A/B of a trace-time env knob on the "
                         "FULL train step (fwd+bwd+Adam), e.g. "
                         "TRAMBA_DUAL_SCAN — the train-step analogue of "
                         "scripts/scan_ab.py (clear_caches per flip, "
                         "AOT-compiled arms, per-arm param buffers)")
    args = ap.parse_args()
    enable_compilation_cache()

    import numpy as np

    from tramba_tpu.models.tramba import TrambaV
    from tramba_tpu.train.optim import make_optimizer
    from tramba_tpu.train.step import create_train_state, make_train_step

    dtype = jnp.dtype(args.dtype)
    model = TrambaV(img_size=args.img, dims=args.dims, dtype=dtype)
    rng0 = np.random.default_rng(0)
    x = jnp.asarray(rng0.normal(size=(args.batch, args.img, args.img, 3)).astype(np.float32))
    gts = jnp.asarray((rng0.uniform(size=(args.batch, args.img, args.img, 1)) > 0.5)
                      .astype(np.float32))
    t0 = time.time()
    variables = jax.jit(lambda k: model.init(k, x))(jax.random.key(0))
    rng = jax.random.key(1026)

    if args.ab_mu:
        # interleaved same-process A/B (chip weather shared): fp32 vs bf16
        # first-moment Adam.  Same jitted step fn; the mu-dtype difference
        # in the state pytree keys two separate executables.
        step = make_train_step()
        states, res = {}, {}
        for name, mu in (("fp32_mu", None), ("bf16_mu", "bfloat16")):
            tx = make_optimizer(1e-4, [60], [0.2], 100, mu_dtype=mu)
            # each arm gets its OWN param buffers: the donating step frees
            # its input state, so sharing `variables` across arms is a
            # use-after-donate (backend InvalidArgument on arm 2)
            states[name] = create_train_state(
                model, jax.tree.map(jnp.copy, variables), tx)
            tc = time.time()
            states[name], m = step(states[name], x, gts, rng)
            print(f"{name}: compile+first {time.time() - tc:.1f}s, "
                  f"loss {float(m['loss']):.4f}", flush=True)
        for rnd in range(3):
            for name in (("fp32_mu", "bf16_mu") if rnd % 2 == 0
                         else ("bf16_mu", "fp32_mu")):
                s, m = step(states[name], x, gts, rng)  # warm
                float(m["loss"])
                t1 = time.perf_counter()
                for _ in range(args.iters):
                    s, m = step(s, x, gts, rng)
                fin = res.setdefault("loss", {})
                fin[name] = float(m["loss"])
                res.setdefault(name, []).append(
                    (time.perf_counter() - t1) / args.iters * 1e3)
                states[name] = s
        for name in ("fp32_mu", "bf16_mu"):
            v = res[name]
            print(f"{name}: {sorted(v)[1]:.1f} ms/step (samples "
                  f"{['%.1f' % t for t in sorted(v)]}), "
                  f"final loss {res['loss'][name]:.4f}")
        return

    if args.ab_knob:
        # interleaved same-process A/B of a trace-time env knob on the whole
        # train step.  clear_caches() after each flip defeats the inner-jit
        # trace cache (seg_ab.py caveat); AOT-compiling each arm pins its
        # executable so the other arm's flip can't silently re-trace it.
        import os

        steps, states, res = {}, {}, {}
        for name, flag in (("on", "1"), ("off", "0")):
            os.environ[args.ab_knob] = flag
            jax.clear_caches()
            step = make_train_step()
            tx = make_optimizer(1e-4, [60], [0.2], 100)
            st = create_train_state(model, jax.tree.map(jnp.copy, variables), tx)
            tc = time.time()
            steps[name] = step.lower(st, x, gts, rng).compile()
            states[name], m = steps[name](st, x, gts, rng)
            print(f"{args.ab_knob}={flag}: compile+first {time.time() - tc:.1f}s, "
                  f"loss {float(m['loss']):.4f}", flush=True)
        for rnd in range(3):
            for name in (("on", "off") if rnd % 2 == 0 else ("off", "on")):
                s, m = steps[name](states[name], x, gts, rng)  # warm
                float(m["loss"])
                t1 = time.perf_counter()
                for _ in range(args.iters):
                    s, m = steps[name](s, x, gts, rng)
                float(m["loss"])
                res.setdefault(name, []).append(
                    (time.perf_counter() - t1) / args.iters * 1e3)
                states[name] = s
        for name in ("on", "off"):
            v = res[name]
            print(f"{name}: {sorted(v)[1]:.1f} ms/step (samples "
                  f"{['%.1f' % t for t in sorted(v)]})")
        print(f"ratio on/off: {sorted(res['on'])[1] / sorted(res['off'])[1]:.3f}")
        return

    if args.ab_loss:
        # interleaved same-process A/B: real loss chain vs null loss.  Two
        # distinct jitted step closures (no env knob, no trace-cache hazard);
        # each arm owns its param buffers (donation).
        steps = {"real": make_train_step(), "null": make_train_step(null_loss=True)}
        states, res = {}, {}
        for name in ("real", "null"):
            tx = make_optimizer(1e-4, [60], [0.2], 100)
            states[name] = create_train_state(
                model, jax.tree.map(jnp.copy, variables), tx)
            tc = time.time()
            states[name], m = steps[name](states[name], x, gts, rng)
            print(f"{name}: compile+first {time.time() - tc:.1f}s, "
                  f"loss {float(m['loss']):.4f}", flush=True)
        for rnd in range(3):
            for name in (("real", "null") if rnd % 2 == 0 else ("null", "real")):
                s, m = steps[name](states[name], x, gts, rng)  # warm
                float(m["loss"])
                t1 = time.perf_counter()
                for _ in range(args.iters):
                    s, m = steps[name](s, x, gts, rng)
                float(m["loss"])
                res.setdefault(name, []).append(
                    (time.perf_counter() - t1) / args.iters * 1e3)
                states[name] = s
        for name in ("real", "null"):
            v = res[name]
            print(f"{name}: {sorted(v)[1]:.1f} ms/step (samples "
                  f"{['%.1f' % t for t in sorted(v)]})")
        d = sorted(res["real"])[1] - sorted(res["null"])[1]
        print(f"loss-chain cost (fwd+bwd, incl. resize grads): {d:+.1f} ms/step")
        return

    tx = make_optimizer(1e-4, [60], [0.2], 100,
                        mu_dtype=args.mu_dtype)
    state = create_train_state(model, variables, tx)
    step = make_train_step()

    state, m = step(state, x, gts, rng)
    loss0 = float(m["loss"])
    print(f"compile+first step: {time.time() - t0:.1f}s, loss {loss0:.4f}")

    losses = []
    for _ in range(2):
        state, m = step(state, x, gts, rng)
        losses.append(float(m["loss"]))
    t0 = time.time()
    for _ in range(args.iters):
        state, m = step(state, x, gts, rng)
    lossN = float(m["loss"])
    losses.append(lossN)
    dt = (time.time() - t0) / args.iters
    print(f"train step: {dt * 1e3:.0f} ms/step (batch {args.batch} @ {args.img}px, "
          f"{args.dtype}); losses {['%.4f' % l for l in losses]}")
    assert jnp.isfinite(lossN), "loss went non-finite"


if __name__ == "__main__":
    main()
