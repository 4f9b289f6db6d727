#!/usr/bin/env python
"""Batch train+render+metrics over standard suites
(reference full_eval.py:33-75 drives mip360/T&T/DeepBlending via os.system;
here subprocess over the same scene lists with our CLIs)."""

import argparse
import subprocess
import sys
from pathlib import Path

MIPNERF360_OUTDOOR = ["bicycle", "flowers", "garden", "stump", "treehill"]
MIPNERF360_INDOOR = ["room", "counter", "kitchen", "bonsai"]
TANKS_AND_TEMPLES = ["truck", "train"]
DEEP_BLENDING = ["drjohnson", "playroom"]
LLFF = ["flower", "fern", "horns", "leaves", "orchids", "room", "trex", "fortress"]


def run(cmd):
    print("+", " ".join(cmd), flush=True)
    res = subprocess.run(cmd)
    if res.returncode != 0:
        sys.exit(res.returncode)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--output_path", "-o", default="./eval")
    p.add_argument("--llff", default=None, help="LLFF dataset root")
    p.add_argument("--mipnerf360", "-m360", default=None)
    p.add_argument("--skip_training", action="store_true")
    p.add_argument("--skip_rendering", action="store_true")
    p.add_argument("--skip_metrics", action="store_true")
    p.add_argument("--iterations", type=int, default=10000)
    args = p.parse_args()

    jobs = []
    if args.llff:
        jobs += [(Path(args.llff) / s, Path(args.output_path) / "llff" / s, 8)
                 for s in LLFF]
    if args.mipnerf360:
        jobs += [(Path(args.mipnerf360) / s, Path(args.output_path) / "m360" / s, 4)
                 for s in MIPNERF360_OUTDOOR + MIPNERF360_INDOOR]

    if not args.skip_training:
        for src, out, r in jobs:
            run([sys.executable, "train.py", "-s", str(src), "-m", str(out),
                 "-r", str(r), "--iterations", str(args.iterations)])
    if not args.skip_rendering:
        for _, out, _ in jobs:
            run([sys.executable, "render.py", "-m", str(out),
                 "--iteration", str(args.iterations), "--skip_train"])
    if not args.skip_metrics:
        run([sys.executable, "metrics.py", "--model_paths"]
            + [str(out) for _, out, _ in jobs])


if __name__ == "__main__":
    main()
