"""R5 large-scene levers (VERDICT r4 items #5/#7) at 1M alive / 1008x756:

1. The grouped pooled-TAIL capacity rung (rank_block_tail): grouped S=512
   keeps the ~4.5x smaller one-hot emit scan; growing only the d>=2 region
   chases the 3.4k drops that made r4 fall back to flat S=1536 (178.6 ms
   drop-free vs 134.4 grouped at 0.4% drops).
2. Window-count (nw) sweep for the windowed payload backward
   (grad_window_bits): smaller windows make the per-window scatters
   cheaper per row (XLA scatter cost falls with destination size) at the
   price of a bigger [T, nw, K] map build. r4 shipped nw=8; the optimum is
   empirical.
3. slab slack sensitivity at the best nw (slab rows are gathered+scattered
   at ~23 ms per 1M rows).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_r5_large.py
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

    configs = [
        # r4 best-known endpoints for drift control
        ("S=512  grp tail128*", dict()),
        ("S=1536 flat        ", dict(rank_block_slots=1536,
                                     rank_block_grouped=False)),
        # 1. the tail rung
        ("S=512  grp tail256 ", dict(rank_block_tail=256)),
        ("S=512  grp tail512 ", dict(rank_block_tail=512)),
        # 2. nw sweep at the best r4 binning config (flat 1536, drop-free)
        ("flat1536 nw=16     ", dict(rank_block_slots=1536,
                                     rank_block_grouped=False,
                                     grad_window_bits=16)),
        ("flat1536 nw=32     ", dict(rank_block_slots=1536,
                                     rank_block_grouped=False,
                                     grad_window_bits=15)),
        ("flat1536 nw=64     ", dict(rank_block_slots=1536,
                                     rank_block_grouped=False,
                                     grad_window_bits=14)),
        # 3. nw on the tail-rung config (if drop-free it becomes the ladder)
        ("grp tail512 nw=32  ", dict(rank_block_tail=512,
                                     grad_window_bits=15)),
        ("grp tail512 nw=64  ", dict(rank_block_tail=512,
                                     grad_window_bits=14)),
    ]
    for label, kw in configs:
        tc = TrainConfig()
        tc.raster = RasterizeConfig(**{
            "chunk": 64, "max_per_tile": 2048, "rank_block_gaussians": 2048,
            "tiles_per_kernel_step": 4, "rank_block_slots": 512, **kw})
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
            print(f"{label} {dt*1000:7.1f} ms  overflow={int(m.overflow)} "
                  f"clipped={int(m.clipped)} slab={int(m.slab)}", flush=True)
        except Exception as e:  # noqa: BLE001 - lab prints and continues
            print(f"{label} FAILED: {type(e).__name__}: {e}", flush=True)
        del state, step, g


if __name__ == "__main__":
    main()
