"""Isolate WHICH backward piece scales superlinearly under vmap (V=3):
composite kernel bwd, payload gather transpose (scatter-add), preprocess
bwd. Device-side loops, one process.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_vbatch2.py
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
    from sdpgs_tpu.ops.rasterize import binning as binning_lib
    from sdpgs_tpu.ops.rasterize import composite_xla
    from sdpgs_tpu.ops.rasterize.composite_pallas import composite_tiles_pallas
    from sdpgs_tpu.ops.rasterize.preprocess import preprocess_fused
    from sdpgs_tpu.ops.rasterize.rasterizer import _pad_row

    rng = np.random.default_rng(0)
    pts = (rng.normal(size=(ALIVE, 3)) * [1.2, 0.9, 0.6] + [0, 0, 4.0]).astype(np.float32)
    cols = rng.uniform(size=(ALIVE, 3)).astype(np.float32)
    g = create_from_points(pts, cols, CAPACITY, init_scale=np.full(ALIVE, 1e-4))
    cams = [Camera.create(R=np.eye(3), T=np.array([0.1 * i, 0, 0]), fovx=0.9,
                          fovy=0.7, width=WIDTH, height=HEIGHT) for i in range(3)]
    cfg = RasterizeConfig(chunk=64)
    P = CAPACITY

    scale = g.get_scaling()
    quat = g.get_rotation()
    opacity = g.get_opacity()[:, 0]

    # fixed per-view binned tables + gathered payloads (host-side prep)
    idxs, countss, payloads = [], [], []
    for cam in cams:
        prep = preprocess_fused(g.xyz, scale, quat, cam, g.alive,
                                near=cfg.near, low_pass=cfg.low_pass)
        bins = binning_lib.bin_gaussians(prep, WIDTH, HEIGHT, cfg)
        idxs.append(jax.block_until_ready(bins.tile_index))
        countss.append(jax.block_until_ready(bins.tile_counts))
        cols_p = jnp.zeros((P, 3)).at[:ALIVE].set(jnp.asarray(cols))
        payloads.append(jax.block_until_ready(jnp.concatenate(
            [prep.mean2d, prep.conic, (opacity * prep.valid)[:, None],
             cols_p, prep.depth[:, None], jnp.zeros((P, 3))],
            axis=-1)))
    idx3 = jnp.stack(idxs)           # [3, T, K]
    counts3 = jnp.stack(countss)
    pay3 = jnp.stack(payloads)       # [3, P, 13]
    T, K = idxs[0].shape

    tiles_x, tiles_y = binning_lib.tile_grid(WIDTH, HEIGHT, cfg.tile)
    px, py = composite_xla.tile_pixel_coords(tiles_x, tiles_y, cfg.tile)
    gathered1 = jax.block_until_ready(_pad_row(payloads[0])[idxs[0]])
    gathered3 = jax.block_until_ready(
        jax.vmap(lambda p, i: _pad_row(p)[i])(pay3, idx3))

    def comp_fb_one(gth, counts, eps):
        def loss(gth):
            out = composite_tiles_pallas(
                gth[..., 0:2], gth[..., 2:5], gth[..., 5], gth[..., 6:13],
                px, py, cfg, counts=counts)
            return jnp.sum(out.values) + jnp.sum(out.final_t)
        return jnp.sum(jax.grad(loss)(gth + eps))

    timed("composite f/b V=1", lambda e: comp_fb_one(gathered1, countss[0], e))
    timed("composite f/b V=3 vmap", lambda e: jnp.sum(jax.vmap(
        lambda gt, c: comp_fb_one(gt, c, e))(gathered3, counts3)))

    gvals = jax.block_until_ready(
        jnp.asarray(rng.uniform(size=(T, K, 13)).astype(np.float32)))

    def gather_grad_one(payload, idx, eps):
        def loss(pl_):
            gth = _pad_row(pl_)[idx]
            return jnp.sum(gth * gvals)
        return jnp.sum(jax.grad(loss)(payload + eps))

    timed("payload gather+transpose V=1",
          lambda e: gather_grad_one(payloads[0], idxs[0], e))
    timed("payload gather+transpose V=3 vmap", lambda e: jnp.sum(jax.vmap(
        lambda p, i: gather_grad_one(p, i, e))(pay3, idx3)))

    def prep_fb_one(cam, eps):
        def loss(xyz, sc, qt):
            p = preprocess_fused(xyz, sc, qt, cam, g.alive,
                                 near=cfg.near, low_pass=cfg.low_pass)
            return jnp.sum(p.mean2d) + jnp.sum(p.conic) + jnp.sum(p.depth)
        gs = jax.grad(loss, argnums=(0, 1, 2))(g.xyz + eps, scale, quat)
        return sum(jnp.sum(x) for x in gs)

    camb = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cams)
    timed("preprocess f/b V=1", lambda e: prep_fb_one(cams[0], e))
    timed("preprocess f/b V=3 vmap", lambda e: jnp.sum(jax.vmap(
        lambda c: prep_fb_one(c, e))(camb)))

    # composite fwd alone, for the bwd-only subtraction
    def comp_f_one(gth, counts, eps):
        out = composite_tiles_pallas(
            gth[..., 0:2], gth[..., 2:5], gth[..., 5], gth[..., 6:13],
            px, py, cfg, counts=counts)
        return jnp.sum(out.values) + jnp.sum(out.final_t)

    timed("composite fwd V=1", lambda e: comp_f_one(gathered1, countss[0], e))
    timed("composite fwd V=3 vmap", lambda e: jnp.sum(jax.vmap(
        lambda gt, c: comp_f_one(gt, c, e))(gathered3, counts3)))


if __name__ == "__main__":
    main()
