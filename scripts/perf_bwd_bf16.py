"""A/B the composite backward kernel's bf16 triangular matmuls at the
full-train-step level (the bench.py workload), plus gradient parity.

One process (the relay serializes clients). Run:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_bwd_bf16.py
"""

from __future__ import annotations

import dataclasses
import time

import numpy as np

WIDTH, HEIGHT = 504, 378
CAPACITY = 1 << 17
ALIVE = 60_000


def make_gaussians():
    # Rebuilt per experiment: the train step donates the state, so one
    # bench run consumes the arrays of a shared GaussianState.
    from sdpgs_tpu.core.gaussians import create_from_points

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(ALIVE, 3)).astype(np.float32) * np.array(
        [1.2, 0.9, 0.6], np.float32
    ) + np.array([0, 0, 4.0], np.float32)
    cols = rng.uniform(size=(ALIVE, 3)).astype(np.float32)
    return create_from_points(pts, cols, CAPACITY, init_scale=np.full(ALIVE, 1e-4))


def build():
    import jax
    import jax.numpy as jnp

    from sdpgs_tpu.core.camera import Camera
    from sdpgs_tpu.train.step import ViewBatch

    rng = np.random.default_rng(0)
    cam = Camera.create(
        R=np.eye(3), T=np.zeros(3), fovx=0.9, fovy=0.7, width=WIDTH, height=HEIGHT
    )
    batch = ViewBatch(
        camera=jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), cam),
        image=jnp.asarray(rng.uniform(size=(1, 3, HEIGHT, WIDTH)).astype(np.float32)),
        depth_mono=jnp.asarray(
            rng.uniform(1, 8, size=(1, HEIGHT, WIDTH)).astype(np.float32)
        ),
        feature=jnp.asarray(rng.uniform(size=(1, 3, HEIGHT, WIDTH)).astype(np.float32)),
        seg_map=jnp.zeros((1, HEIGHT, WIDTH), np.int32),
    )
    return None, batch


def bench_step(g, batch, bwd_bf16: bool) -> float:
    import jax
    import jax.numpy as jnp

    from sdpgs_tpu.config import RasterizeConfig, TrainConfig
    from sdpgs_tpu.train.state import TrainState
    from sdpgs_tpu.train.step import make_train_step

    cfg = TrainConfig()
    cfg.raster = RasterizeConfig(chunk=64, bwd_bf16=bwd_bf16)
    state = TrainState.create(g)
    step = make_train_step(cfg, sh_degree=3)
    protos = jnp.ones((8, 3))
    bg = jnp.zeros(3)
    lr_scale = jnp.float32(1.0)

    state, metrics = step(state, batch, protos, bg, lr_scale)
    jax.block_until_ready(metrics)
    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch, protos, bg, lr_scale)
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0
    return iters / dt


def grad_parity(g, batch):
    import jax
    import jax.numpy as jnp

    from sdpgs_tpu.config import RasterizeConfig
    from sdpgs_tpu.core.camera import Camera
    from sdpgs_tpu.ops.rasterize.rasterizer import rasterize

    cam = jax.tree_util.tree_map(lambda x: x[0], batch.camera)
    bg = jnp.zeros(3)
    tgt = batch.image[0].transpose(1, 2, 0)

    def loss(xyz, scale, quat, opa, col, feat, cfg):
        out = rasterize(
            xyz, None, opa, col, feat, g.alive, cam, bg, cfg,
            scale=scale, quat=quat,
        )
        return (
            jnp.abs(out.color - tgt).mean()
            + out.depth.mean() * 1e-2
            + jnp.abs(out.feature).mean()
            + out.alpha.mean() * 1e-2
        )

    args = (
        g.xyz, g.get_scaling(), g.get_rotation(), g.get_opacity()[:, 0],
        g.colors_from_sh(cam.cam_pos, 3), g.language_feature_normalized(),
    )
    grads = {}
    for bf16 in (False, True):
        cfg = RasterizeConfig(chunk=64, bwd_bf16=bf16)
        fn = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5)), static_argnums=6)
        grads[bf16] = jax.block_until_ready(fn(*args, cfg))
    names = ["xyz", "scale", "quat", "opacity", "color", "feature"]
    for n, a, b in zip(names, grads[False], grads[True]):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        denom = np.abs(a).max() + 1e-30
        print(f"grad {n:8s} max_abs_f32={np.abs(a).max():.3e} "
              f"max_rel_err={np.abs(a - b).max() / denom:.3e}", flush=True)


def main():
    _, batch = build()
    ips_f32 = bench_step(make_gaussians(), batch, bwd_bf16=False)
    print(f"bench bwd_bf16=False: {ips_f32:.2f} it/s", flush=True)
    ips_bf16 = bench_step(make_gaussians(), batch, bwd_bf16=True)
    print(f"bench bwd_bf16=True:  {ips_bf16:.2f} it/s", flush=True)
    grad_parity(make_gaussians(), batch)


if __name__ == "__main__":
    main()
