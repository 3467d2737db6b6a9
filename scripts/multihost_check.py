"""Real multi-process DCN-path proof (VERDICT r2 #5).

Launches TWO OS processes on localhost, each with 4 virtual CPU devices;
they connect through ``jax.distributed.initialize`` (the live version of the
reference's dead ``--init_method tcp://`` flag, run.py:46-53), build the
8-device global mesh, shard one deterministic global batch across hosts with
``host_shard_batch``, and take two real training steps — the gradient psum
rides the inter-process collective.  A third single-process run computes the
same two steps on the same global batch; losses must match.  Process 0 also
exercises the coordinated resume save (barrier + replica write) and both
processes restore it.

Usage: python scripts/multihost_check.py            (parent: spawns + checks)
       recorded output: MULTIHOST_PROC.txt at the repo root.
"""

import json
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _child():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, REPO)
    from tramba_tpu.models.tramba import BaseUMamba
    from tramba_tpu.parallel.distributed import (
        global_data_mesh, host_shard_batch, initialize_from_args, local_replica)
    from tramba_tpu.train import checkpoint as ckpt
    from tramba_tpu.train.optim import make_optimizer
    from tramba_tpu.train.step import create_train_state, make_train_step
    from tramba_tpu.parallel.mesh import replicate_tree

    port = os.environ["MULTIHOST_PORT"]
    multi = initialize_from_args(f"tcp://localhost:{port}")
    pid = jax.process_index()
    nproc = jax.process_count()
    mesh = global_data_mesh()
    assert len(jax.devices()) == 8, jax.devices()

    model = BaseUMamba(img_size=64, dims=16, enc_depths=(1, 1, 1, 1),
                       dec_depths=(1, 1, 1, 1))
    rng = np.random.default_rng(7)
    gx = rng.normal(size=(8, 64, 64, 3)).astype(np.float32) * 0.2
    ggt = (rng.uniform(size=(8, 64, 64, 1)) > 0.5).astype(np.float32)

    variables = jax.jit(lambda k: model.init(k, jnp.zeros((1, 64, 64, 3))))(
        jax.random.key(0))
    tx = make_optimizer(1e-3, [100], [0.1], 10)
    state = create_train_state(model, variables, tx)
    state = replicate_tree(state, mesh)
    step = make_train_step(donate=False)
    key = replicate_tree(jax.random.key(1026), mesh)

    losses = []
    for it in range(2):
        if multi:
            lo = pid * (8 // nproc)
            sl = slice(lo, lo + 8 // nproc)
            images, gts = host_shard_batch((gx[sl], ggt[sl]), mesh)
        else:
            from tramba_tpu.parallel.mesh import shard_batch

            images, gts = shard_batch(gx, mesh), shard_batch(ggt, mesh)
        state, m = step(state, images, gts, key, None)
        losses.append(float(m["loss"]))

    out = {"pid": pid, "nproc": nproc, "losses": losses}

    if multi:
        # coordinated resume save (mirrors train/loop.py): Orbax's save is a
        # collective — EVERY process calls it with its addressable replica
        # (the primary host writes, the rest participate in the barriers)
        path = os.path.join(os.environ["MULTIHOST_TMP"], "resume")
        ckpt.save_resume(path, jax.tree.map(np.asarray, local_replica(state)),
                         epoch=1)
        restored, epoch = ckpt.load_resume(path, jax.tree.map(np.asarray,
                                                              local_replica(state)))
        d = float(np.max(np.abs(
            np.asarray(jax.tree.leaves(restored.params)[0], np.float32)
            - np.asarray(jax.tree.leaves(local_replica(state.params))[0],
                         np.float32))))
        out["resume_epoch"] = int(epoch)
        out["resume_param_delta"] = d
    print("CHILD_RESULT " + json.dumps(out), flush=True)


def _spawn(pid, nproc, port, tmp, ndev):
    env = dict(os.environ)
    env.update({
        "MULTIHOST_CHILD": "1",
        "MULTIHOST_PORT": str(port),
        "MULTIHOST_TMP": tmp,
        "TRAMBA_NUM_PROCESSES": str(nproc),
        "TRAMBA_PROCESS_ID": str(pid),
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": f"--xla_force_host_platform_device_count={ndev}",
    })
    return subprocess.Popen([sys.executable, os.path.abspath(__file__)],
                            env=env, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)


def main():
    import tempfile

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    tmp = tempfile.mkdtemp(prefix="tramba_mh_")

    # reference: ONE process, all 8 devices, full global batch
    ref = _spawn(0, 1, port, tmp, 8)
    ref_out = ref.communicate(timeout=1200)[0]
    assert ref.returncode == 0, ref_out
    ref_res = json.loads([l for l in ref_out.splitlines()
                          if l.startswith("CHILD_RESULT")][0][13:])

    # two processes, 4 devices each, half the global batch each
    procs = [_spawn(i, 2, port, tmp, 4) for i in range(2)]
    outs = [p.communicate(timeout=1200)[0] for p in procs]
    results = []
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o
        results.append(json.loads([l for l in o.splitlines()
                                   if l.startswith("CHILD_RESULT")][0][13:]))

    lines = [f"1-process losses: {ref_res['losses']}"]
    ok = True
    for r in results:
        lines.append(f"process {r['pid']}/{r['nproc']} losses: {r['losses']} "
                     f"resume_epoch={r.get('resume_epoch')} "
                     f"resume_param_delta={r.get('resume_param_delta')}")
        for a, b in zip(ref_res["losses"], r["losses"]):
            ok &= abs(a - b) < 1e-4
        # load_resume returns the NEXT start epoch (saved epoch 1 -> 2)
        ok &= r.get("resume_epoch") == 2 and r.get("resume_param_delta", 1) == 0.0
    lines.append("MULTIHOST CHECK: " + ("PASS" if ok else "FAIL"))
    report = "\n".join(lines)
    print(report)
    with open(os.path.join(REPO, "MULTIHOST_PROC.txt"), "w") as f:
        f.write(report + "\n")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    if os.environ.get("MULTIHOST_CHILD"):
        _child()
    else:
        main()
