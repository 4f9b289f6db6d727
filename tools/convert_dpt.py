#!/usr/bin/env python
"""Convert a transformers DPTForDepthEstimation checkpoint (e.g.
Intel/dpt-large == MiDaS 3.0) to the .npz consumed by
sdpgs_tpu.models.dpt. Run where the weights are available:

  python tools/convert_dpt.py --model Intel/dpt-large --out dpt_large.npz
  python tools/convert_dpt.py --state_dict dpt.pth --out dpt_large.npz
"""

import argparse

import numpy as np


def convert_state_dict(sd) -> dict:
    return {k: v.detach().cpu().numpy() for k, v in sd.items()
            if not k.endswith("num_batches_tracked")}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None, help="HF model id or local dir")
    ap.add_argument("--state_dict", default=None, help="raw torch state dict .pth")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import torch

    if args.model:
        from transformers import DPTForDepthEstimation

        sd = DPTForDepthEstimation.from_pretrained(args.model).state_dict()
    else:
        sd = torch.load(args.state_dict, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
    params = convert_state_dict(sd)

    # Embed the architecture so the loader needs no shape heuristics
    # (models.dpt.save_params / models.depth_estimator.make_mono_depth_fn).
    from sdpgs_tpu.models.dpt import DPTArch, save_params

    arch = (
        DPTArch.hybrid()
        if any(k.startswith("dpt.embeddings.backbone.") for k in params)
        else DPTArch.large()
    )
    save_params(args.out, params, arch)
    print(f"wrote {args.out} ({'hybrid' if arch.is_hybrid else 'large'})")


if __name__ == "__main__":
    main()
