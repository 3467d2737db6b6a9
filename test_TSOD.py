"""TSOD saliency-map dump CLI — test_TSOD.py semantics.

Loads checkpoints (native Orbax dirs or reference torch .pth files), runs the
model over the TSOD10K Test split, and writes per-image uint8 saliency PNGs
at each image's original resolution.
"""

import argparse
import os

import jax

# fp32 reference parity: TPU matmuls default to bf16 MACs; eval/training in
# float32 must use full-precision accumulation (MAE budget vs torch is 1e-3)
jax.config.update("jax_default_matmul_precision", "highest")

from tramba_tpu.eval.dump import dump_saliency_maps
from tramba_tpu.models.registry import build
from tramba_tpu.utils.cache import enable_compilation_cache
from tramba_tpu.train.checkpoint import load_params_any

if __name__ == "__main__":
    enable_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--img_size", default=384, type=int)
    parser.add_argument("--method", default="Tramba-V-TSOD", type=str)
    parser.add_argument("--pretrained_path", default="", type=str)
    parser.add_argument("--data_root", default="./TSOD10K/", type=str)
    parser.add_argument("--ckpt", nargs="+", required=True,
                        help="checkpoint path(s): Orbax dir or torch .pth")
    parser.add_argument("--save_root", default="./results", type=str)
    parser.add_argument("--batch_size", default=8, type=int)
    parser.add_argument("--measure_fps", action="store_true",
                        help="run the 200-iter FPS harness (test_TSOD.py:71-108)")
    args = parser.parse_args()

    for path in args.ckpt:
        print(path)
        model = build(args.method, args)
        variables = load_params_any(path, args.method)
        save_path = os.path.join(args.save_root, args.method, "TSOD")
        n = dump_saliency_maps(model, variables, args.data_root, save_path,
                               img_size=args.img_size, batch_size=args.batch_size)
        print(f"wrote {n} maps to {save_path}")
        if args.measure_fps:
            import jax.numpy as jnp

            from tramba_tpu.utils.profiling import measure_inference_speed

            x = jnp.zeros((1, args.img_size, args.img_size, 3), jnp.float32)
            from tramba_tpu.utils.jit import tramba_jit
            fwd = tramba_jit(lambda a: model.apply(variables, a)[-1])
            measure_inference_speed(fwd, (x,), batch=1)
