#!/usr/bin/env python
"""Convert torchvision VGG16 + LPIPS linear-head checkpoints to the .npz
layout consumed by sdpgs_tpu.models.lpips (run on a machine with the weights
available; torch-cpu is enough).

Usage:
  python tools/convert_lpips.py --vgg vgg16.pth --lin lpips_vgg.pth --out lpips_vgg.npz
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vgg", required=True, help="torchvision vgg16 state_dict (.pth)")
    ap.add_argument("--lin", required=True, help="LPIPS vgg linear heads state_dict (.pth)")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import torch

    vgg = torch.load(args.vgg, map_location="cpu")
    if hasattr(vgg, "state_dict"):
        vgg = vgg.state_dict()
    lin = torch.load(args.lin, map_location="cpu")
    if hasattr(lin, "state_dict"):
        lin = lin.state_dict()

    out = {}
    # torchvision vgg16.features conv indices per stage
    stage_conv_idx = [[0, 2], [5, 7], [10, 12, 14], [17, 19, 21], [24, 26, 28]]
    for s, idxs in enumerate(stage_conv_idx):
        for i, li in enumerate(idxs):
            out[f"conv{s}_{i}_w"] = vgg[f"features.{li}.weight"].numpy()
            out[f"conv{s}_{i}_b"] = vgg[f"features.{li}.bias"].numpy()
    for s in range(5):
        for key in (f"lins.{s}.model.1.weight", f"lin{s}.model.1.weight"):
            if key in lin:
                out[f"lin{s}_w"] = lin[key].numpy()
                break
        else:
            raise KeyError(f"linear head for stage {s} not found in {list(lin)[:5]}")

    np.savez(args.out, **out)
    print(f"wrote {args.out} with {len(out)} arrays")


if __name__ == "__main__":
    main()
