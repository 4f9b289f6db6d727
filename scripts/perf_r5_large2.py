"""R5 follow-up: walk the grouped pooled tail past S toward drop-free
(tail 512 left 237 drops at the 1M scene; 6 tail columns x 256 = 1536 is
the structural ceiling) and combine with the nw=64 windowed backward.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_r5_large2.py
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
        ("grp tail768  nw64 ", dict(rank_block_tail=768, grad_window_bits=14)),
        ("grp tail1024 nw64 ", dict(rank_block_tail=1024, grad_window_bits=14)),
        ("grp tail1536 nw64 ", dict(rank_block_tail=1536, grad_window_bits=14)),
        ("grp tail1024 nw8  ", dict(rank_block_tail=1024)),
        ("flat1536 nw16 ref ", dict(rank_block_slots=1536,
                                    rank_block_grouped=False,
                                    grad_window_bits=16)),
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
        except Exception as e:  # noqa: BLE001
            print(f"{label} FAILED: {type(e).__name__}: {e}", flush=True)
        del state, step, g


if __name__ == "__main__":
    main()
