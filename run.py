"""Training CLI — same flags and method strings as the reference run.py."""

import argparse
import os

import jax

from tramba_tpu.train.loop import training
from tramba_tpu.utils.cache import enable_compilation_cache

# per-method pretrained encoder checkpoints (Trambav6_enc.py:176-200,
# Trambav6.py:161-166; filenames as released upstream)
_PRETRAINED_BY_VARIANT = {
    "V": "vssm_base_0229_ckpt_epoch_237.pth",
    "S": "swin_base_patch4_window12_384_22k.pth",
    "P": "pvt_v2_b4.pth",
    "R": "resnet50.pth",
    "BaseUMamba": "vssm_base_0229_ckpt_epoch_237.pth",
}


def resolve_pretrained(args) -> None:
    """'auto' -> the method's released encoder checkpoint under
    --pretrained_model; missing default file degrades to a loud warning
    (an explicit --pretrained_path that fails to load is fatal instead)."""
    if args.pretrained_path != "auto":
        return
    variant = "BaseUMamba" if args.method.startswith("BaseUMamba") else args.method.split("-")[1]
    path = os.path.join(args.pretrained_model, _PRETRAINED_BY_VARIANT[variant])
    if os.path.exists(path):
        args.pretrained_path = path
    else:
        print(f"WARNING: default pretrained encoder {path} not found; "
              "training will start from a RANDOM encoder (pass --pretrained_path "
              "to point at the checkpoint)")
        args.pretrained_path = None
        args.allow_random_init = True

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    # kept for CLI compatibility; distribution is handled by the jax mesh
    parser.add_argument("--init_method", default="tcp://127.0.0.1:33115", type=str)
    parser.add_argument("--parallel", action="store_true",
                        help="compat flag; data parallelism engages automatically over all chips")

    parser.add_argument("--data_root", default="./TSOD10K/", type=str, help="data path")
    parser.add_argument("--train_dataset", default="", type=str)
    parser.add_argument("--evaluation_root", default="./TSOD10K/", type=str)
    parser.add_argument("--evaluation_dataset", default="", type=str)

    parser.add_argument("--img_size", default=384, type=int)
    parser.add_argument("--pretrained_model", default="./pretrained_model/", type=str)
    parser.add_argument("--batch_size", default=4, type=int)
    parser.add_argument("--save_model", default="./results", type=str)
    parser.add_argument("--tf_log_path", default="./tf-logs", type=str)
    parser.add_argument("--pretrained_path", default="auto", type=str,
                        help="encoder checkpoint; 'auto' picks the method's released file")
    parser.add_argument("--allow_random_init", action="store_true",
                        help="tolerate a failing pretrained-encoder load (default: fatal)")
    parser.add_argument("--resume", default=None, type=str)

    parser.add_argument("--see", default=40, type=int)
    parser.add_argument("--train_epochs", default=80, type=int)
    parser.add_argument("--decay_epochs", default="60", type=str)
    parser.add_argument("--decay_factors", default="0.2", type=str)
    parser.add_argument("--lr", default=1e-4, type=float)
    parser.add_argument("--method", default=None, type=str)
    parser.add_argument("--best_MAE", default=None, type=float)
    parser.add_argument("--dtype", default="float32", type=str,
                        help="compute dtype: float32 | bfloat16")
    parser.add_argument("--mu_dtype", default="bfloat16", type=str,
                        help="Adam first-moment storage dtype (bfloat16 halves "
                             "that state's HBM traffic; float32 = reference-exact)")

    args = parser.parse_args()
    assert args.method is not None
    from tramba_tpu.parallel.distributed import initialize_from_args

    if initialize_from_args(args.init_method):
        print(f"multi-host: process {jax.process_index()}/{jax.process_count()}, "
              f"{len(jax.devices())} global devices")
    resolve_pretrained(args)
    enable_compilation_cache()

    print("\nArguments:")
    print("=" * 40)
    for arg in vars(args):
        print(f"{arg: <20}: {getattr(args, arg)}")
    print("=" * 40)

    if args.dtype == "float32":
        # fp32 parity: TPU matmuls default to bf16 MACs
        jax.config.update("jax_default_matmul_precision", "highest")
    training(args=args)
