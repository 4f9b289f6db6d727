"""Device-side section timing at the 1M-Gaussian / 1008x756 config
(perf_sections.py at large shapes, K=2048 + grouped S=512 lanes compaction).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_sections_large.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from sdpgs_tpu.config import RasterizeConfig
from sdpgs_tpu.core.camera import Camera
from sdpgs_tpu.core.gaussians import create_from_points

WIDTH, HEIGHT = 1008, 756
CAPACITY = 1 << 20
ALIVE = 1_000_000
N = 5


def main():
    rng = np.random.default_rng(0)
    pts = (rng.normal(size=(ALIVE, 3)) * [3.2, 2.4, 1.8] + [0, 0, 6.5]).astype(np.float32)
    cols = rng.uniform(size=(ALIVE, 3)).astype(np.float32)
    g = create_from_points(pts, cols, CAPACITY, init_scale=np.full(ALIVE, 1e-4))
    cam = Camera.create(R=np.eye(3), T=np.zeros(3), fovx=0.9, fovy=0.7,
                        width=WIDTH, height=HEIGHT)
    cfg = RasterizeConfig(chunk=64, max_per_tile=2048, rank_block_slots=512,
                          rank_block_gaussians=2048, tiles_per_kernel_step=4)
    bg = jnp.zeros(3)

    from sdpgs_tpu.ops.rasterize import binning as binning_lib
    from sdpgs_tpu.ops.rasterize.preprocess import preprocess_fused
    from sdpgs_tpu.ops.rasterize.rasterizer import rasterize

    scale = g.get_scaling()
    quat = g.get_rotation()
    color = g.colors_from_sh(cam.cam_pos, 3)
    feature = g.language_feature_normalized()
    opacity = g.get_opacity()[:, 0]

    def timed(name, body):
        def loop(eps):
            def it(i, eps):
                return body(eps) * 0.0 + eps
            return jax.lax.fori_loop(0, N, it, eps)

        fn = jax.jit(loop)
        out = fn(jnp.float32(0.0))
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = fn(out)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / N
        print(f"{name:30s} {dt*1000:7.2f} ms", flush=True)
        return dt

    def prep_only(eps):
        p = preprocess_fused(g.xyz + eps, scale, quat, cam, g.alive,
                             near=cfg.near, low_pass=cfg.low_pass)
        return jnp.sum(p.mean2d) + jnp.sum(p.conic)

    def prep_bin(eps):
        p = preprocess_fused(g.xyz + eps, scale, quat, cam, g.alive,
                             near=cfg.near, low_pass=cfg.low_pass)
        b = binning_lib.bin_gaussians(p, WIDTH, HEIGHT, cfg)
        return jnp.sum(b.tile_index).astype(jnp.float32)

    def fwd(eps):
        out = rasterize(g.xyz + eps, None, opacity, color, feature, g.alive,
                        cam, bg, cfg, scale=scale, quat=quat)
        return jnp.sum(out.color) + jnp.sum(out.depth)

    def fwd_bwd_all(eps):
        def loss(xyz, sc, qt, opa, col, feat):
            out = rasterize(xyz, None, opa, col, feat, g.alive,
                            cam, bg, cfg, scale=sc, quat=qt)
            return jnp.sum(out.color) + jnp.sum(out.depth) * 1e-3
        grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5))(
            g.xyz + eps, scale, quat, opacity, color, feature)
        return sum(jnp.sum(x) for x in grads)

    timed("preprocess", prep_only)
    timed("preprocess+binning", prep_bin)
    timed("render fwd", fwd)
    timed("render fwd+bwd(all)", fwd_bwd_all)


if __name__ == "__main__":
    main()
