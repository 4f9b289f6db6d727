"""Benchmark: full train-step throughput on an LLFF-3-view-shaped synthetic
workload (504x378 @ downsample 8, the reference's benchmark protocol,
run_llff_mvs.sh). Prints one JSON line.

``vs_baseline``: the reference repo ships no measured numbers
(BASELINE.md — timing events are dead code); the comparison constant below
is the commonly observed ~15 train iters/s of the single-GPU FSGS/SDP-GS
lineage at this protocol (10k iterations in ~11 min). Replace with a
measured figure when reference hardware is available.
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_ITERS_PER_S = 15.0

WIDTH, HEIGHT = 504, 378          # LLFF at resolution /8 (run_llff_mvs.sh)
CAPACITY = 1 << 17                # 131k Gaussian slots
ALIVE = 60_000                    # typical mid-training population
VIEWS = 1                         # reference protocol: 1 view/iter


def main():
    import jax
    import jax.numpy as jnp

    from sdpgs_tpu.config import RasterizeConfig, TrainConfig
    from sdpgs_tpu.core.camera import Camera
    from sdpgs_tpu.core.gaussians import create_from_points
    from sdpgs_tpu.train.state import TrainState
    from sdpgs_tpu.train.step import ViewBatch, make_train_step

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(ALIVE, 3)).astype(np.float32) * np.array(
        [1.2, 0.9, 0.6], np.float32
    ) + np.array([0, 0, 4.0], np.float32)
    cols = rng.uniform(size=(ALIVE, 3)).astype(np.float32)
    g = create_from_points(pts, cols, CAPACITY, init_scale=np.full(ALIVE, 1e-4))

    cams = [
        Camera.create(
            R=np.eye(3), T=np.array([0.1 * i, 0.0, 0.0]), fovx=0.9, fovy=0.7,
            width=WIDTH, height=HEIGHT,
        )
        for i in range(VIEWS)
    ]
    batch = ViewBatch(
        camera=jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cams),
        image=jnp.asarray(rng.uniform(size=(VIEWS, 3, HEIGHT, WIDTH)).astype(np.float32)),
        depth_mono=jnp.asarray(
            rng.uniform(1, 8, size=(VIEWS, HEIGHT, WIDTH)).astype(np.float32)
        ),
        feature=jnp.asarray(rng.uniform(size=(VIEWS, 3, HEIGHT, WIDTH)).astype(np.float32)),
        seg_map=jnp.zeros((VIEWS, HEIGHT, WIDTH), np.int32),
    )

    cfg = TrainConfig()
    cfg.raster = RasterizeConfig(chunk=64)

    state = TrainState.create(g)
    step = make_train_step(cfg, sh_degree=3)
    protos = jnp.ones((8, 3))
    bg = jnp.zeros(3)
    lr_scale = jnp.float32(1.0)

    # warmup/compile
    state, metrics = step(state, batch, protos, bg, lr_scale)
    jax.block_until_ready(metrics)

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch, protos, bg, lr_scale)
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0

    ips = iters / dt
    print(
        json.dumps(
            {
                "metric": "train_iters_per_s",
                "value": round(ips, 3),
                "unit": "it/s",
                "vs_baseline": round(ips / REFERENCE_ITERS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
