"""R4: find a DROP-FREE <= 200 ms config at 1M alive / 1008x756 now that the
windowed payload backward removed the scatter wall (perf_large.py: 280 ->
218 ms uncompacted drop-free, 149 ms S=512-grouped with 3.4k block drops).

The remaining lever: the binning table scatter. Uncompacted it processes
P*D = 8M mostly-dead rows (~70 ms); block compaction (S slots per
256-Gaussian block) shrinks it to ~live rows but drops entries past S.
Sweep S upward (grouped and flat layouts) until drops reach zero.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_large_s.py
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
        ("S=768  grouped", dict(rank_block_slots=768, rank_block_grouped=True)),
        ("S=1024 grouped", dict(rank_block_slots=1024, rank_block_grouped=True)),
        ("S=1536 grouped", dict(rank_block_slots=1536, rank_block_grouped=True)),
        ("S=1024 flat   ", dict(rank_block_slots=1024, rank_block_grouped=False)),
        ("S=1536 flat   ", dict(rank_block_slots=1536, rank_block_grouped=False)),
        ("S=2048 flat   ", dict(rank_block_slots=2048, rank_block_grouped=False)),
    ]
    for label, kw in configs:
        tc = TrainConfig()
        tc.raster = RasterizeConfig(
            chunk=64, max_per_tile=2048, rank_block_gaussians=2048,
            tiles_per_kernel_step=4, **kw)
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
            print(f"{label:18s} {dt*1000:7.1f} ms  overflow={int(m.overflow)} "
                  f"clipped={int(m.clipped)}", flush=True)
        except Exception as e:  # noqa: BLE001 - lab prints and continues
            print(f"{label:18s} FAILED: {type(e).__name__}: {e}", flush=True)
        del state, step, g


if __name__ == "__main__":
    main()
