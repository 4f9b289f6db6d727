"""Scaling benchmark: train-step throughput across device meshes.

Reports iterations/s for every (data, gauss, tile) mesh factorization that
fits the available devices, plus the single-device reference, and derives
scaling efficiency = (it/s_n / n) / it/s_1 with the per-device view load
held constant (weak scaling over the view batch: V = data axis size).

On real hardware (a v5e/v5p slice or a multi-host job under jax.distributed)
this produces the BASELINE.md target table (1 chip / 1 host / N hosts). On a
single-chip machine run it functionally on the virtual CPU mesh:

  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      PYTHONPATH=/root/repo python scripts/bench_scaling.py --iters 3

(CPU timings validate mechanics, not performance.)
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def build_inputs(views: int, alive: int, capacity: int, width: int, height: int):
    import jax
    import jax.numpy as jnp

    from sdpgs_tpu.core.camera import Camera
    from sdpgs_tpu.core.gaussians import create_from_points
    from sdpgs_tpu.train.step import ViewBatch

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(alive, 3)).astype(np.float32) * np.array(
        [1.2, 0.9, 0.6], np.float32
    ) + np.array([0, 0, 4.0], np.float32)
    cols = rng.uniform(size=(alive, 3)).astype(np.float32)
    g = create_from_points(pts, cols, capacity, init_scale=np.full(alive, 1e-4))
    cams = [
        Camera.create(R=np.eye(3), T=np.array([0.1 * i, 0.0, 0.0]), fovx=0.9,
                      fovy=0.7, width=width, height=height)
        for i in range(views)
    ]
    batch = ViewBatch(
        camera=jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cams),
        image=jnp.asarray(rng.uniform(size=(views, 3, height, width)).astype(np.float32)),
        depth_mono=jnp.asarray(rng.uniform(1, 8, size=(views, height, width)).astype(np.float32)),
        feature=jnp.asarray(rng.uniform(size=(views, 3, height, width)).astype(np.float32)),
        seg_map=jnp.zeros((views, height, width), np.int32),
    )
    return g, batch


def bench_mesh(data: int, gauss: int, tile: int, iters: int,
               alive: int, capacity: int, width: int, height: int):
    import jax
    import jax.numpy as jnp

    from sdpgs_tpu.config import RasterizeConfig, TrainConfig
    from sdpgs_tpu.parallel.mesh import make_mesh
    from sdpgs_tpu.parallel.sharding import shard_batch, shard_train_state
    from sdpgs_tpu.train.state import TrainState
    from sdpgs_tpu.train.step import make_train_step

    n = data * gauss * tile
    cfg = TrainConfig()
    cfg.raster = RasterizeConfig(chunk=64)
    g, batch = build_inputs(max(data, 1), alive, capacity, width, height)
    state = TrainState.create(g)
    protos = jnp.ones((8, 3))
    bg = jnp.zeros(3)

    if n == 1:
        step = make_train_step(cfg, sh_degree=3)
    else:
        mesh = make_mesh(data=data, gauss=gauss, tile=tile)
        state = shard_train_state(state, mesh)
        batch = shard_batch(batch, mesh)
        step = make_train_step(
            cfg, sh_degree=3, tile_mesh=mesh if tile > 1 else None
        )

    state, metrics = step(state, batch, protos, bg, jnp.float32(1.0))
    jax.block_until_ready(metrics)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch, protos, bg, jnp.float32(1.0))
    jax.block_until_ready(metrics)
    dt = (time.perf_counter() - t0) / iters
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--alive", type=int, default=60_000)
    ap.add_argument("--capacity", type=int, default=1 << 17)
    ap.add_argument("--width", type=int, default=504)
    ap.add_argument("--height", type=int, default=378)
    ap.add_argument("--meshes", type=str, default="",
                    help="comma list like 1x1x1,8x1x1,4x2x1,4x1x2; default: auto")
    args = ap.parse_args()

    import jax
    n = len(jax.devices())
    print(f"backend={jax.default_backend()} devices={n}", flush=True)

    if args.meshes:
        meshes = [tuple(map(int, m.split("x"))) for m in args.meshes.split(",")]
    else:
        meshes = [(1, 1, 1)]
        if n > 1:
            meshes += [(n, 1, 1), (n // 2, 2, 1) if n % 2 == 0 else None,
                       (n // 2, 1, 2) if n % 2 == 0 else None]
            meshes = [m for m in meshes if m]

    results = []
    base = None
    for (d, gz, t) in meshes:
        dt = bench_mesh(d, gz, t, args.iters, args.alive, args.capacity,
                        args.width, args.height)
        n_dev = d * gz * t
        its = 1.0 / dt
        views = max(d, 1)
        per_view_ms = dt * 1000 / views
        if n_dev == 1:
            base = per_view_ms
        eff = (base / per_view_ms) if base else float("nan")
        results.append(dict(mesh=f"{d}x{gz}x{t}", devices=n_dev,
                            ms_per_step=round(dt * 1000, 2),
                            views_per_step=views,
                            ms_per_view=round(per_view_ms, 2),
                            scaling_efficiency=round(eff, 3)))
        print(json.dumps(results[-1]), flush=True)

    print(json.dumps({"scaling_table": results}))


if __name__ == "__main__":
    main()
