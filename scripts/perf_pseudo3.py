"""Pseudo-step overhead split: full with_pseudo train step + the individual
pseudo-branch losses (segment pearson, reprojection scatter-min z-buffer)
so the non-DPT overhead is attributable. Device-side loops.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_pseudo3.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

WIDTH, HEIGHT = 504, 378
CAPACITY = 1 << 17
ALIVE = 60_000
N = 10


def timed(name, body, *args):
    def loop(eps, *a):
        def it(i, eps):
            return body(eps, *a) * 0.0 + eps
        return jax.lax.fori_loop(0, N, it, eps)

    fn = jax.jit(loop)
    out = fn(jnp.float32(0.0), *args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(out, *args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / N
    print(f"{name:44s} {dt*1000:7.2f} ms", flush=True)
    return dt


def main():
    import bench as benchmod
    from sdpgs_tpu.losses import segment_pearson_loss
    from sdpgs_tpu.losses.depth import loss_reproject_depth
    from sdpgs_tpu.losses.feature import segment_cluster_assign

    rng = np.random.default_rng(0)
    g, cams, batch = benchmod._make_inputs(rng)
    pseudo, mono = benchmod._make_pseudo(rng, cams)

    depth = jnp.asarray(rng.uniform(1, 8, (HEIGHT, WIDTH)).astype(np.float32))
    monod = jnp.asarray(rng.uniform(0, 1, (HEIGHT, WIDTH)).astype(np.float32))
    feat = jnp.asarray(rng.normal(size=(3, HEIGHT, WIDTH)).astype(np.float32))
    protos = jnp.ones((8, 3))

    def seg_pearson_fb(eps):
        def loss(d):
            labels = segment_cluster_assign(feat, protos)
            return jnp.nan_to_num(
                segment_pearson_loss(d, monod, labels, protos.shape[0]))
        return jnp.sum(jax.grad(loss)(depth + eps))

    def reproj_fb(eps):
        def loss(d):
            return jnp.nan_to_num(loss_reproject_depth(
                d, pseudo.train_depths, pseudo.K, pseudo.R_train,
                pseudo.t_train, pseudo.R_pseudo, pseudo.t_pseudo))
        return jnp.sum(jax.grad(loss)(depth + eps))

    timed("segment pearson f/b", seg_pearson_fb)
    timed("reprojection z-buffer f/b", reproj_fb)

    # full steps for the record (plain vs pseudo), same shapes as bench.py
    from sdpgs_tpu.config import RasterizeConfig, TrainConfig
    from sdpgs_tpu.train.state import TrainState
    from sdpgs_tpu.train.step import make_train_step

    cfg = TrainConfig()
    cfg.raster = RasterizeConfig(chunk=64)
    bg = jnp.zeros(3)
    lr = jnp.float32(1.0)

    state = TrainState.create(g)
    step = make_train_step(cfg, sh_degree=3)
    state, m = step(state, batch, protos, bg, lr)
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    for _ in range(30):
        state, m = step(state, batch, protos, bg, lr)
    jax.block_until_ready(m)
    print(f"{'plain step':44s} {(time.perf_counter()-t0)/30*1000:7.2f} ms",
          flush=True)

    def time_pseudo(label, mono_v, pseudo_v):
        g2, _, batch2 = benchmod._make_inputs(np.random.default_rng(0))
        state2 = TrainState.create(g2)
        state2 = state2.replace(step=jnp.int32(2500))
        pstep = make_train_step(cfg, sh_degree=3, with_pseudo=True,
                                mono_depth_fn=mono_v.apply)
        state2, m2 = pstep(state2, batch2, protos, bg, lr, pseudo_v)
        jax.block_until_ready(m2)
        t0 = time.perf_counter()
        for _ in range(15):
            state2, m2 = pstep(state2, batch2, protos, bg, lr, pseudo_v)
        jax.block_until_ready(m2)
        print(f"{label:44s} {(time.perf_counter()-t0)/15*1000:7.2f} ms",
              flush=True)

    time_pseudo("pseudo step (bench dtype)", mono, pseudo)

    # f32-params DPT variant for the dtype split
    from sdpgs_tpu.models.depth_estimator import mono_depth_from_params
    from sdpgs_tpu.models.dpt import DPTArch, random_params

    mono32 = mono_depth_from_params(random_params(DPTArch.hybrid(), seed=0),
                                    arch=DPTArch.hybrid())
    pseudo32 = pseudo._replace(mono_params=mono32.params)
    time_pseudo("pseudo step (f32 DPT)", mono32, pseudo32)


if __name__ == "__main__":
    main()
