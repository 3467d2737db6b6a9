"""SOD saliency-map dump CLI — test_SOD.py semantics (per-dataset dump)."""

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


def test(args):
    datasets = {}
    for spec in args.datasets:
        name, _, root = spec.partition("=")
        datasets[name] = root or name
    model = build(args.method, args)
    print(args.resume)
    variables = load_params_any(args.resume, args.method)
    for dataset, root in datasets.items():
        print(dataset)
        save_path = os.path.join(args.image_save_path, args.method, "SOD")
        n = dump_saliency_maps(model, variables, root, save_path, img_size=args.img_size,
                               batch_size=args.batch_size)
        print(f"wrote {n} maps to {save_path}")


if __name__ == "__main__":
    enable_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--method", default="Tramba-V-SOD", type=str)
    parser.add_argument("--resume", required=True, type=str, help="checkpoint (Orbax dir or .pth)")
    parser.add_argument("--image_save_path", default="./results", type=str)
    parser.add_argument("--img_size", default=384, type=int)
    parser.add_argument("--pretrained_path", default="", type=str)
    parser.add_argument("--batch_size", default=8, type=int)
    parser.add_argument("--datasets", nargs="+", default=["SOD=./DUTS"],
                        help="name=root pairs; each root holds Test/image + Test/mask")
    args = parser.parse_args()
    test(args=args)
