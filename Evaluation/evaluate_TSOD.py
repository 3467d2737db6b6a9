"""Offline TSOD evaluation CLI — evaluate_TSOD.py semantics.

Reads dumped saliency maps + GT masks, streams the full metric suite, saves
PR curves per model, prints the results row; parallel over models.
"""

import argparse
import concurrent.futures
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tramba_tpu.eval.dump import evaluate_maps, format_results_row


def evaluate_model(args, model):
    results_list = []
    for dataset in args.test_datasets:
        salmap_root = os.path.join(args.dataset_path, model, dataset)
        print(salmap_root)
        r = evaluate_maps(salmap_root, args.gt_root,
                          save_pr_dir=os.path.join(args.dataset_path, model))
        print(format_results_row(model, dataset, r))
        print(f"Wmeasure_r: {round(r['wFmeasure'], 4)}  fnr_r: {round(r['fnr'], 4)}")
        results_list.append({"model": model, "dataset": dataset, **r})
    return results_list


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_path", default="./results", type=str)
    parser.add_argument("--gt_root", default="./TSOD10K/Test/mask/", type=str)
    parser.add_argument("--models", nargs="+", default=["Tramba-V-TSOD"])
    parser.add_argument("--test_datasets", nargs="+", default=["TSOD"])
    parser.add_argument("--workers", default=24, type=int)
    args = parser.parse_args()

    with concurrent.futures.ProcessPoolExecutor(max_workers=args.workers) as ex:
        futures = [ex.submit(evaluate_model, args, m) for m in args.models]
        results = [f.result() for f in concurrent.futures.as_completed(futures)]
