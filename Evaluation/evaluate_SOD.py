"""Offline SOD evaluation CLI — evaluate_SOD.py semantics (multi-dataset)."""

import argparse
import concurrent.futures
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tramba_tpu.eval.dump import evaluate_maps, format_results_row


def evaluate_model(args, model):
    results_list = []
    for spec in args.test_datasets:
        dataset, _, gt_root = spec.partition("=")
        salmap_root = os.path.join(args.dataset_path, model, "SOD")
        r = evaluate_maps(salmap_root, gt_root or args.gt_root,
                          save_pr_dir=os.path.join(args.dataset_path, model))
        print(format_results_row(model, dataset, r))
        results_list.append({"model": model, "dataset": dataset, **r})
    return results_list


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_path", default="./results", type=str)
    parser.add_argument("--gt_root", default="./DUTS/Test/mask/", type=str)
    parser.add_argument("--models", nargs="+", default=["Tramba-V-SOD"])
    parser.add_argument("--test_datasets", nargs="+", default=["DUTS-TE=./DUTS/Test/mask"])
    parser.add_argument("--workers", default=24, type=int)
    args = parser.parse_args()

    with concurrent.futures.ProcessPoolExecutor(max_workers=args.workers) as ex:
        futures = [ex.submit(evaluate_model, args, m) for m in args.models]
        results = [f.result() for f in concurrent.futures.as_completed(futures)]
