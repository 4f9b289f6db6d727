#!/usr/bin/env python
"""Convert a reference SDP-GS torch checkpoint (``chkpntN.pth``: the
13/15-tuple from ``GaussianModel.capture`` — reference
scene/gaussian_model.py:67-103) into a Gaussian PLY loadable by this
framework, for cross-framework comparisons.

Usage:
  python tools/convert_reference_ckpt.py --ckpt chkpnt10000.pth --out cloud.ply
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--capacity", type=int, default=None,
                    help="slot capacity (default: next pow2 >= N)")
    args = ap.parse_args()

    import torch

    payload = torch.load(args.ckpt, map_location="cpu")
    model_params, iteration = payload
    # tuple layouts (gaussian_model.py:67-103): with language feature (15):
    # (sh_degree, xyz, f_dc, f_rest, language_feature, scaling, rotation,
    #  opacity, max_radii2D, xyz_grad_accum, denom, opt_state, lr_scale,
    #  confidence, ...)  — without (13): same minus language_feature/conf.
    vals = list(model_params)
    sh_degree = int(vals[0])
    if len(vals) >= 15:
        (xyz, f_dc, f_rest, language_feature, scaling, rotation, opacity) = vals[1:8]
    else:
        (xyz, f_dc, f_rest, scaling, rotation, opacity) = vals[1:7]
        language_feature = torch.zeros((xyz.shape[0], 3))

    n = xyz.shape[0]
    capacity = args.capacity or (1 << (n - 1).bit_length())

    import jax.numpy as jnp

    from sdpgs_tpu.core.gaussians import Gaussians
    from sdpgs_tpu.data.ply import save_gaussians_ply

    def pad(t, fill=0.0):
        a = t.detach().cpu().numpy().astype(np.float32)
        out = np.full((capacity,) + a.shape[1:], fill, np.float32)
        out[:n] = a
        return jnp.asarray(out)

    alive = np.zeros(capacity, np.float32)
    alive[:n] = 1.0
    rot = np.zeros((capacity, 4), np.float32)
    rot[:, 0] = 1.0
    rot[:n] = rotation.detach().cpu().numpy()
    g = Gaussians(
        xyz=pad(xyz),
        features_dc=pad(f_dc),
        features_rest=pad(f_rest),
        scaling=pad(scaling, fill=-10.0),
        rotation=jnp.asarray(rot),
        opacity=pad(opacity, fill=-10.0),
        language_feature=pad(language_feature),
        alive=jnp.asarray(alive),
        confidence=jnp.ones((capacity, 1), jnp.float32),
        max_sh_degree=sh_degree,
    )
    save_gaussians_ply(args.out, g)
    print(f"wrote {args.out}: {n} gaussians (iteration {iteration}, "
          f"sh_degree {sh_degree})")


if __name__ == "__main__":
    main()
