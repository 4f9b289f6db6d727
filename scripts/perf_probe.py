"""One-process TPU perf probe: full-step baseline + targeted variants.

Measures the ROADMAP levers without killing/restarting TPU clients:
  1. bench-identical baseline step (tile=32, K=1024, D=8)
  2. D=4 (halves binning scatter candidates) — speed + clip telemetry
  3. losses isolated: L1-only step vs full loss stack
  4. forward-only render and fwd+bwd render (rasterizer share of the step)
  5. views_per_batch=3 step (per-view amortization)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_probe.py
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

WIDTH, HEIGHT = 504, 378
CAPACITY = 1 << 17
ALIVE = 60_000


def make_inputs(views=1, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(ALIVE, 3)).astype(np.float32) * np.array(
        [1.2, 0.9, 0.6], np.float32
    ) + np.array([0, 0, 4.0], np.float32)
    cols = rng.uniform(size=(ALIVE, 3)).astype(np.float32)
    g = create_from_points(pts, cols, CAPACITY, init_scale=np.full(ALIVE, 1e-4))
    cams = [
        Camera.create(R=np.eye(3), T=np.array([0.1 * i, 0.0, 0.0]), fovx=0.9,
                      fovy=0.7, width=WIDTH, height=HEIGHT)
        for i in range(views)
    ]
    batch = ViewBatch(
        camera=jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cams),
        image=jnp.asarray(rng.uniform(size=(views, 3, HEIGHT, WIDTH)).astype(np.float32)),
        depth_mono=jnp.asarray(rng.uniform(1, 8, size=(views, HEIGHT, WIDTH)).astype(np.float32)),
        feature=jnp.asarray(rng.uniform(size=(views, 3, HEIGHT, WIDTH)).astype(np.float32)),
        seg_map=jnp.zeros((views, HEIGHT, WIDTH), np.int32),
    )
    return g, cams, batch


def time_step(name, cfg, views=1, iters=30):
    g, cams, batch = make_inputs(views)
    state = TrainState.create(g)
    step = make_train_step(cfg, sh_degree=3)
    protos = jnp.ones((8, 3))
    bg = jnp.zeros(3)
    state, metrics = step(state, batch, protos, bg, jnp.float32(1.0))
    jax.block_until_ready(metrics)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch, protos, bg, jnp.float32(1.0))
    jax.block_until_ready(metrics)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt*1000:7.2f} ms/step  {1/dt:6.2f} it/s  "
          f"overflow={int(metrics.overflow)}", flush=True)
    return dt


def time_render(name, cfg, backward: bool, iters=30):
    from sdpgs_tpu.render import render

    g, cams, _ = make_inputs(1)
    cam = cams[0]
    bg = jnp.zeros(3)

    if backward:
        def f(g, eps):
            def loss(xyz):
                out = render(cam, g.replace(xyz=xyz), cfg, bg, 3)
                return jnp.sum(out.color) + jnp.sum(out.depth) * 1e-3
            return jax.grad(loss)(g.xyz + eps)
        fn = jax.jit(f)
    else:
        def f(g, eps):
            out = render(cam, g.replace(xyz=g.xyz + eps), cfg, bg, 3)
            return out.color
        fn = jax.jit(f)

    eps = jnp.float32(0.0)
    out = fn(g, eps)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(g, eps)
        eps = jnp.mean(out) * 0.0   # chain iterations
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt*1000:7.2f} ms/iter", flush=True)
    return dt


def time_binning(name, cfg, iters=30):
    from sdpgs_tpu.ops.rasterize.binning import bin_gaussians
    from sdpgs_tpu.ops.rasterize.preprocess import preprocess_fused

    g, cams, _ = make_inputs(1)
    cam = cams[0]

    def f(g, eps):
        prep = preprocess_fused(
            g.xyz + eps, g.get_scaling(), g.get_rotation(), cam, g.alive,
            near=cfg.near, low_pass=cfg.low_pass,
        )
        bins = bin_gaussians(prep, cam.width, cam.height, cfg)
        return bins.tile_index, bins.overflow, bins.clipped, bins.num_entries

    fn = jax.jit(f)
    eps = jnp.float32(0.0)
    out = fn(g, eps)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(g, eps)
        eps = jnp.float32(out[0][0, 0] * 0)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt*1000:7.2f} ms/iter  overflow={int(out[1])} "
          f"clipped={int(out[2])} entries={int(out[3])}", flush=True)
    return dt


def main():
    print("backend:", jax.default_backend(), jax.devices()[0], flush=True)

    base = RasterizeConfig(chunk=64)
    cfg_d4 = RasterizeConfig(chunk=64, max_tiles_per_gaussian=4)
    cfg_d16 = RasterizeConfig(chunk=64, max_tiles_per_gaussian=16)

    cfg = TrainConfig(); cfg.raster = base
    cfg4 = TrainConfig(); cfg4.raster = cfg_d4

    # 1-2. full steps
    time_step("step D=8 (bench baseline)", cfg)
    time_step("step D=4", cfg4)

    # 3. loss stack isolation: photometric-only step
    import dataclasses
    lite = TrainConfig(); lite.raster = base
    lite.optim = dataclasses.replace(
        cfg.optim, include_feature=False, depth_weight=0.0, depth_weight_late=0.0
    )
    time_step("step L1+SSIM only", lite)

    # 4. render fwd / fwd+bwd
    time_render("render fwd", base, backward=False)
    time_render("render fwd+bwd(xyz)", base, backward=True)

    # 5. binning piece, D sweep
    time_binning("preprocess+binning D=8", base)
    time_binning("preprocess+binning D=4", cfg_d4)
    time_binning("preprocess+binning D=16", cfg_d16)

    # 6. multi-view batching
    time_step("step V=3 D=8", cfg, views=3)


if __name__ == "__main__":
    main()
