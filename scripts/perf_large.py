"""Large-scene single-chip lab (VERDICT r2 next #4): 1M alive Gaussians,
1008x756 — find a drop-free configuration at <= 200 ms/step.

r2 state: K=2048 uncompacted 278 ms zero-overflow; K=1024 S=512 grouped
184 ms with 14k drops. New levers: rank_block_gaussians (grid-overhead),
tiles_per_kernel_step, flat (ungrouped) S, larger S.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_large.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from sdpgs_tpu.config import RasterizeConfig, TrainConfig
from sdpgs_tpu.core.camera import Camera
from sdpgs_tpu.core.gaussians import create_from_points
from sdpgs_tpu.train.state import TrainState
from sdpgs_tpu.train.step import ViewBatch, make_train_step

WIDTH, HEIGHT = 1008, 756
CAPACITY = 1 << 20
ALIVE = 1_000_000


def main():
    rng = np.random.default_rng(0)
    pts = (rng.normal(size=(ALIVE, 3)) * [3.2, 2.4, 1.8] + [0, 0, 6.5]).astype(np.float32)
    cols = rng.uniform(size=(ALIVE, 3)).astype(np.float32)
    cam = Camera.create(R=np.eye(3), T=np.zeros(3), fovx=0.9, fovy=0.7,
                        width=WIDTH, height=HEIGHT)
    bg = jnp.zeros(3)
    batch = ViewBatch(
        camera=jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *[cam]),
        image=jnp.asarray(rng.uniform(size=(1, 3, HEIGHT, WIDTH)).astype(np.float32)),
        depth_mono=jnp.asarray(rng.uniform(1, 8, size=(1, HEIGHT, WIDTH)).astype(np.float32)),
        feature=jnp.asarray(rng.uniform(size=(1, 3, HEIGHT, WIDTH)).astype(np.float32)),
        seg_map=jnp.zeros((1, HEIGHT, WIDTH), np.int32),
    )
    protos = jnp.ones((8, 3))

    # scene shape report: per-tile load at this spread
    from sdpgs_tpu.ops.rasterize import binning as binning_lib
    from sdpgs_tpu.ops.rasterize.preprocess import preprocess_fused

    g0 = create_from_points(pts, cols, CAPACITY, init_scale=np.full(ALIVE, 1e-4))
    cfg0 = RasterizeConfig(chunk=64, max_per_tile=2048, rank_block_slots=0)
    prep = preprocess_fused(g0.xyz, g0.get_scaling(), g0.get_rotation(), cam,
                            g0.alive, near=cfg0.near, low_pass=cfg0.low_pass)
    b0 = binning_lib.bin_gaussians(prep, WIDTH, HEIGHT, cfg0)
    c = np.asarray(b0.tile_counts)
    print(f"scene: entries={int(np.sum(c))} max/tile={int(c.max())} "
          f"p99/tile={int(np.percentile(c, 99))} overflow@2048="
          f"{int(b0.overflow)}", flush=True)
    del g0, b0, prep

    configs = [
        # windowed two-phase payload backward auto-on (1.57M table rows >=
        # grad_window_min_rows): replaces the ~120-130 ms scatter-add
        # transpose with window-local small-destination scatters
        # (ops/rasterize/grad_window.py).
        ("K=2048 uncompacted + grad-window",
         dict(max_per_tile=2048, rank_block_slots=0,
              rank_block_gaussians=2048, tiles_per_kernel_step=4)),
        ("K=2048 S=512 grouped + grad-window",
         dict(max_per_tile=2048, rank_block_slots=512,
              rank_block_gaussians=2048, tiles_per_kernel_step=4)),
        # r5 best drop-free: grouped with the enlarged pooled tail
        # (rank_block_tail; 169.7 ms overflow=0 measured perf_r5_large2)
        ("K=2048 S=512 grp tail=768 + grad-window",
         dict(max_per_tile=2048, rank_block_slots=512, rank_block_tail=768,
              rank_block_gaussians=2048, tiles_per_kernel_step=4)),
        ("K=2048 uncompacted, grad-window OFF",
         dict(max_per_tile=2048, rank_block_slots=0,
              rank_block_gaussians=2048, tiles_per_kernel_step=4,
              grad_window_min_rows=1 << 62)),
    ]
    for label, kw in configs:
        tc = TrainConfig()
        tc.raster = RasterizeConfig(chunk=64, **kw)
        g = create_from_points(pts, cols, CAPACITY,
                               init_scale=np.full(ALIVE, 1e-4))
        state = TrainState.create(g)
        step = make_train_step(tc, sh_degree=3)
        try:
            state, m = step(state, batch, protos, bg, jnp.float32(1.0))
            jax.block_until_ready(m)
            t0 = time.perf_counter()
            for _ in range(10):
                state, m = step(state, batch, protos, bg, jnp.float32(1.0))
            jax.block_until_ready(m)
            dt = (time.perf_counter() - t0) / 10
            print(f"{label:42s} {dt*1000:7.1f} ms  overflow={int(m.overflow)} "
                  f"clipped={int(m.clipped)}", flush=True)
        except Exception as e:  # noqa: BLE001 - lab prints and continues
            print(f"{label:42s} FAILED: {type(e).__name__}: {e}", flush=True)
        del state, step, g


if __name__ == "__main__":
    main()
