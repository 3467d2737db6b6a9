"""Full-scale (384px) numerical parity: torch reference vs tramba_tpu.

Usage:
  python scripts/parity_full.py [--ckpt path.pth] [--method Tramba-V-TSOD]

Without --ckpt, both sides share random reference-init weights.  Compares
all deep-supervision heads and reports the saliency-map MAE delta (the
BASELINE criterion is < 0.001 on real checkpoints).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", default=None, help="reference .pth (random init if absent)")
    parser.add_argument("--img_size", default=384, type=int)
    parser.add_argument("--seed", default=0, type=int)
    args = parser.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp
    import torch

    import ref_shim
    from tramba_tpu.compat.torch_weights import convert_tramba_v
    from tramba_tpu.models.tramba import TrambaV

    refs = ref_shim.load_reference()
    torch.manual_seed(args.seed)
    model_t = refs["Trambav6"].bulid_model(use_pretrain=False, img_size=args.img_size).eval()
    if args.ckpt:
        sd = torch.load(args.ckpt, map_location="cpu")
        model_t.load_state_dict(sd, strict=True)
        print(f"loaded reference weights from {args.ckpt}")

    rng = np.random.default_rng(args.seed)
    x = rng.normal(size=(1, 3, args.img_size, args.img_size)).astype(np.float32)
    with torch.no_grad():
        outs_t = model_t(torch.from_numpy(x))

    params = convert_tramba_v(model_t.state_dict())
    model_j = TrambaV(img_size=args.img_size, ssm_backend="assoc")
    outs_j = model_j.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))

    ok = True
    for i, (ot, oj) in enumerate(zip(outs_t, outs_j)):
        got = np.asarray(oj)[..., 0]
        want = ot.numpy()[:, 0]
        logit_max = np.abs(got - want).max()
        mae = np.abs(1 / (1 + np.exp(-got)) - 1 / (1 + np.exp(-want))).mean()
        print(f"head {i}: logits maxdiff {logit_max:.3e}   saliency MAE delta {mae:.3e}")
        ok &= mae < 1e-3
    print("PARITY:", "PASS (MAE delta < 1e-3)" if ok else "FAIL")


if __name__ == "__main__":
    main()
