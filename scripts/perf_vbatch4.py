"""R4 (VERDICT #6): the V>1 composed-step regression — vmap-batched render
vs a static view unroll.

r2/r3 facts: V=3 composed step = 20.0 ms/view vs 15.1 single (+30%/view),
yet EVERY isolated section scales flat or sublinear under vmap; and the
pseudo step measured ~6 ms FASTER with its render unvmapped than folded
into the view vmap. Hypothesis: the vmap-batched render (binning + Pallas
composite under batching rules) lowers worse composed than V unbatched
renders. Test: make_train_step(unroll_views=True) unrolls the render loop
(single-chip only; DP meshes need the batched form).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_vbatch4.py
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


def make_inputs(rng, views):
    pts = rng.normal(size=(ALIVE, 3)).astype(np.float32) * np.array(
        [1.2, 0.9, 0.6], np.float32) + np.array([0, 0, 4.0], np.float32)
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
    return g, batch


def time_step(step, state, args, iters=30):
    state, m = step(state, *args)
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, *args)
    jax.block_until_ready(m)
    return (time.perf_counter() - t0) / iters, m


def main():
    cfg = TrainConfig()
    cfg.raster = RasterizeConfig(chunk=64)
    protos = jnp.ones((8, 3))
    bg = jnp.zeros(3)
    one = jnp.float32(1.0)

    for views in (1, 3):
        for unroll in (False, True):
            rng = np.random.default_rng(0)
            g, batch = make_inputs(rng, views)
            state = TrainState.create(g)
            step = make_train_step(cfg, sh_degree=3, unroll_views=unroll)
            dt, m = time_step(step, state, (batch, protos, bg, one))
            print(f"V={views} unroll={unroll}: {dt*1000:7.2f} ms "
                  f"({dt*1000/views:6.2f} ms/view) loss={float(m.loss):.4f}",
                  flush=True)

    # exactness: unrolled == vmapped at V=3
    rng = np.random.default_rng(0)
    g, batch = make_inputs(rng, 3)
    s0 = TrainState.create(g)
    sv = make_train_step(cfg, sh_degree=3)(s0, batch, protos, bg, one)
    rng = np.random.default_rng(0)
    g, batch = make_inputs(rng, 3)
    s0 = TrainState.create(g)
    su = make_train_step(cfg, sh_degree=3, unroll_views=True)(
        s0, batch, protos, bg, one)
    dx = float(jnp.max(jnp.abs(sv[0].gaussians.xyz - su[0].gaussians.xyz)))
    dl = abs(float(sv[1].loss) - float(su[1].loss))
    print(f"unroll-vs-vmap: |d xyz|={dx:.2e} |d loss|={dl:.2e}", flush=True)


if __name__ == "__main__":
    main()
