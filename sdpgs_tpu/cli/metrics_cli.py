"""Metrics CLI (reference metrics.py:95-103 / metrics_dtu.py)."""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="SDP-GS-TPU metrics")
    p.add_argument("--model_paths", "-m", required=True, nargs="+")
    p.add_argument("--lpips_weights", default=None,
                   help=".npz from tools/convert_lpips.py")
    p.add_argument("--masks", default=None, help="DTU object-mask dir")
    p.add_argument("--aggregate", default=None,
                   help="aggregate per-scene results.json under this root")
    args = p.parse_args(argv)

    from sdpgs_tpu.eval.metrics import aggregate_results, evaluate_model_paths

    evaluate_model_paths(args.model_paths, lpips_weights=args.lpips_weights,
                         masks_root=args.masks)
    if args.aggregate:
        aggregate_results(args.aggregate)


if __name__ == "__main__":
    main()
