"""Remaining vmap-scaling suspects for the V=3 superlinearity: binning
(depth sort + rank kernel + table scatter), the per-view loss block
(SSIM Toeplitz matmuls + L1 + feature CE), and the Adam update.
perf_vbatch2 already cleared composite f/b, payload gather, preprocess
(all flat/sublinear in V). Device-side loops.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_vbatch3.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

WIDTH, HEIGHT = 504, 378
CAPACITY = 1 << 17
ALIVE = 60_000
N = 10


def timed(name, body, *args):
    def loop(eps, *a):
        def it(i, eps):
            return body(eps, *a) * 0.0 + eps
        return jax.lax.fori_loop(0, N, it, eps)

    fn = jax.jit(loop)
    out = fn(jnp.float32(0.0), *args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(out, *args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / N
    print(f"{name:44s} {dt*1000:7.2f} ms", flush=True)
    return dt


def main():
    from sdpgs_tpu.config import RasterizeConfig
    from sdpgs_tpu.core.camera import Camera
    from sdpgs_tpu.core.gaussians import create_from_points
    from sdpgs_tpu.losses import l1_loss_mask, ssim
    from sdpgs_tpu.losses.feature import loss_feature_metric
    from sdpgs_tpu.ops.rasterize import binning as binning_lib
    from sdpgs_tpu.ops.rasterize.preprocess import preprocess_fused

    rng = np.random.default_rng(0)
    pts = (rng.normal(size=(ALIVE, 3)) * [1.2, 0.9, 0.6] + [0, 0, 4.0]).astype(np.float32)
    cols = rng.uniform(size=(ALIVE, 3)).astype(np.float32)
    g = create_from_points(pts, cols, CAPACITY, init_scale=np.full(ALIVE, 1e-4))
    cams = [Camera.create(R=np.eye(3), T=np.array([0.1 * i, 0, 0]), fovx=0.9,
                          fovy=0.7, width=WIDTH, height=HEIGHT) for i in range(3)]
    cfg = RasterizeConfig(chunk=64)

    scale = g.get_scaling()
    quat = g.get_rotation()

    preps = [
        jax.tree_util.tree_map(
            jax.block_until_ready,
            preprocess_fused(g.xyz, scale, quat, cam, g.alive,
                             near=cfg.near, low_pass=cfg.low_pass),
        )
        for cam in cams
    ]
    prep3 = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *preps)

    def bin_one(prep, eps):
        p = prep._replace(depth=prep.depth + eps)
        bins = binning_lib.bin_gaussians(p, WIDTH, HEIGHT, cfg)
        return (jnp.sum(bins.tile_counts.astype(jnp.float32))
                + jnp.sum(bins.tile_index[..., :8].astype(jnp.float32)))

    timed("binning V=1", lambda e: bin_one(preps[0], e))
    timed("binning V=3 vmap", lambda e: jnp.sum(jax.vmap(
        lambda p: bin_one(p, e))(prep3)))

    # per-view loss block (SSIM + L1 + feature CE/smooth), f/b
    img = jnp.asarray(rng.uniform(size=(3, 3, HEIGHT, WIDTH)).astype(np.float32))
    gt = jnp.asarray(rng.uniform(size=(3, 3, HEIGHT, WIDTH)).astype(np.float32))
    feat = jnp.asarray(rng.normal(size=(3, 3, HEIGHT, WIDTH)).astype(np.float32))
    gt_feat = jnp.asarray(rng.normal(size=(3, 3, HEIGHT, WIDTH)).astype(np.float32))
    seg = jnp.zeros((3, HEIGHT, WIDTH), jnp.int32)
    protos = jnp.ones((8, 3))

    def loss_one(im, gt_im, ft, gt_ft, sg, eps):
        def loss(im, ft):
            l = 0.8 * l1_loss_mask(im, gt_im) + 0.2 * (1.0 - ssim(im, gt_im))
            lf, lsm = loss_feature_metric(ft, gt_ft, protos, sg)
            return l + lf + lsm
        gi, gf = jax.grad(loss, argnums=(0, 1))(im + eps, ft)
        return jnp.sum(gi) + jnp.sum(gf)

    timed("loss block V=1", lambda e: loss_one(img[0], gt[0], feat[0], gt_feat[0], seg[0], e))
    timed("loss block V=3 vmap", lambda e: jnp.sum(jax.vmap(
        lambda a, b, c, d, s: loss_one(a, b, c, d, s, e))(img, gt, feat, gt_feat, seg)))


if __name__ == "__main__":
    main()
