"""Multi-view batching cost split: which section scales superlinearly with
V under vmap. Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_vbatch.py"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from sdpgs_tpu.config import RasterizeConfig
from sdpgs_tpu.core.camera import Camera
from sdpgs_tpu.core.gaussians import create_from_points
from sdpgs_tpu.ops.rasterize import binning as binning_lib
from sdpgs_tpu.ops.rasterize.preprocess import preprocess_fused
from sdpgs_tpu.render import render

WIDTH, HEIGHT = 504, 378
CAPACITY = 1 << 17
ALIVE = 60_000
N = 10


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
    print(f"{name:44s} {dt*1000:7.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    pts = (rng.normal(size=(ALIVE, 3)) * [1.2, 0.9, 0.6] + [0, 0, 4.0]).astype(np.float32)
    cols = rng.uniform(size=(ALIVE, 3)).astype(np.float32)
    g = create_from_points(pts, cols, CAPACITY, init_scale=np.full(ALIVE, 1e-4))
    cams = [Camera.create(R=np.eye(3), T=np.array([0.1 * i, 0, 0]), fovx=0.9,
                          fovy=0.7, width=WIDTH, height=HEIGHT) for i in range(3)]
    camb = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cams)
    cfg = RasterizeConfig(chunk=64)
    bg = jnp.zeros(3)
    scale = g.get_scaling()
    quat = g.get_rotation()

    def prep_bin_one(cam, eps):
        p = preprocess_fused(g.xyz + eps, scale, quat, cam, g.alive,
                             near=cfg.near, low_pass=cfg.low_pass)
        b = binning_lib.bin_gaussians(p, WIDTH, HEIGHT, cfg)
        return jnp.sum(b.tile_index).astype(jnp.float32)

    def render_one(cam, eps):
        out = render(cam, g.replace(xyz=g.xyz + eps), cfg, bg, 3)
        return jnp.sum(out.color) + jnp.sum(out.depth)

    def render_grad_one(cam, eps):
        def loss(xyz):
            out = render(cam, g.replace(xyz=xyz), cfg, bg, 3)
            return jnp.sum(out.color) + jnp.sum(out.depth) * 1e-3
        return jnp.sum(jax.grad(loss)(g.xyz + eps))

    cam0 = cams[0]
    timed("prep+bin V=1", lambda e: prep_bin_one(cam0, e))
    timed("prep+bin V=3 vmap", lambda e: jnp.sum(jax.vmap(
        lambda c: prep_bin_one(c, e))(camb)))
    timed("render fwd V=1", lambda e: render_one(cam0, e))
    timed("render fwd V=3 vmap", lambda e: jnp.sum(jax.vmap(
        lambda c: render_one(c, e))(camb)))
    timed("render fwd+bwd V=1", lambda e: render_grad_one(cam0, e))
    timed("render fwd+bwd V=3 vmap", lambda e: jnp.sum(jax.vmap(
        lambda c: render_grad_one(c, e))(camb)))


if __name__ == "__main__":
    main()
