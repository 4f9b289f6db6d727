"""Lane-major rank kernel vs row-major, across grid block sizes, plus the
full-step effect. Run after scripts/perf_rank_pb.py.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_rank_lanes.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from sdpgs_tpu.config import RasterizeConfig, TrainConfig
from sdpgs_tpu.core.camera import Camera
from sdpgs_tpu.core.gaussians import create_from_points
from sdpgs_tpu.ops.rasterize import binning as binning_lib
from sdpgs_tpu.ops.rasterize.preprocess import Preprocessed, preprocess_fused
from sdpgs_tpu.train.state import TrainState
from sdpgs_tpu.train.step import ViewBatch, make_train_step

WIDTH, HEIGHT = 504, 378
CAPACITY = 1 << 17
ALIVE = 60_000
N = 20


def timed(name, body, n=N):
    def loop(eps):
        def it(i, eps):
            return body(eps) * 0.0 + eps
        return jax.lax.fori_loop(0, n, it, eps)

    fn = jax.jit(loop)
    out = fn(jnp.float32(0.0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(out)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:46s} {dt*1000:7.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    pts = (rng.normal(size=(ALIVE, 3)) * [1.2, 0.9, 0.6] + [0, 0, 4.0]).astype(np.float32)
    cols = rng.uniform(size=(ALIVE, 3)).astype(np.float32)
    g = create_from_points(pts, cols, CAPACITY, init_scale=np.full(ALIVE, 1e-4))
    cam = Camera.create(R=np.eye(3), T=np.zeros(3), fovx=0.9, fovy=0.7,
                        width=WIDTH, height=HEIGHT)
    bg = jnp.zeros(3)

    prep0 = jax.block_until_ready(preprocess_fused(
        g.xyz, g.get_scaling(), g.get_rotation(), cam, g.alive,
        near=RasterizeConfig().near, low_pass=RasterizeConfig().low_pass))

    ref_table = None
    for lanes in (False, True):
        for Pb in (256, 1024, 2048):
            cfg = RasterizeConfig(chunk=64, rank_block_gaussians=Pb,
                                  rank_kernel_lanes=lanes)

            def bin_full(eps):
                p2 = Preprocessed(valid=prep0.valid, mean2d=prep0.mean2d + eps,
                                  depth=prep0.depth, conic=prep0.conic,
                                  radius=prep0.radius)
                b = binning_lib.bin_gaussians(p2, WIDTH, HEIGHT, cfg)
                return jnp.sum(b.tile_index).astype(jnp.float32)

            timed(f"bin_gaussians lanes={int(lanes)} Pb={Pb}", bin_full)
            b = jax.block_until_ready(binning_lib.bin_gaussians(
                prep0, WIDTH, HEIGHT, cfg))
            if ref_table is None:
                ref_table = np.asarray(b.tile_index)
            else:
                same = np.array_equal(np.asarray(b.tile_index), ref_table)
                print(f"  identical: {same} overflow={int(b.overflow)}",
                      flush=True)

    batch = ViewBatch(
        camera=jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *[cam]),
        image=jnp.asarray(rng.uniform(size=(1, 3, HEIGHT, WIDTH)).astype(np.float32)),
        depth_mono=jnp.asarray(rng.uniform(1, 8, size=(1, HEIGHT, WIDTH)).astype(np.float32)),
        feature=jnp.asarray(rng.uniform(size=(1, 3, HEIGHT, WIDTH)).astype(np.float32)),
        seg_map=jnp.zeros((1, HEIGHT, WIDTH), np.int32),
    )
    protos = jnp.ones((8, 3))
    for lanes, Pb, tps in ((True, 1024, 4), (True, 2048, 4), (True, 1024, 1)):
        tc = TrainConfig()
        tc.raster = RasterizeConfig(chunk=64, rank_block_gaussians=Pb,
                                    rank_kernel_lanes=lanes,
                                    tiles_per_kernel_step=tps)
        g2 = create_from_points(pts, cols, CAPACITY,
                                init_scale=np.full(ALIVE, 1e-4))
        state = TrainState.create(g2)
        step = make_train_step(tc, sh_degree=3)
        state, m = step(state, batch, protos, bg, jnp.float32(1.0))
        jax.block_until_ready(m)
        t0 = time.perf_counter()
        for _ in range(30):
            state, m = step(state, batch, protos, bg, jnp.float32(1.0))
        jax.block_until_ready(m)
        dt = (time.perf_counter() - t0) / 30
        print(f"full plain step lanes={int(lanes)} Pb={Pb} tps={tps}: "
              f"{dt*1000:.2f} ms ({1/dt:.1f} it/s)", flush=True)


if __name__ == "__main__":
    main()
