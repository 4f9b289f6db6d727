"""R4 pseudo-step budget after the view unroll: full step + attributable
sections (DPT f/g, pseudo render f/b, pseudo losses) to pick the next lever
toward pseudo >= 27 it/s (37 ms honest). Device-side loops.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_pseudo4.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

WIDTH, HEIGHT = 504, 378
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
    print(f"{name:48s} {dt*1000:7.2f} ms", flush=True)
    return dt


def main():
    import bench as benchmod
    from sdpgs_tpu.config import RasterizeConfig, TrainConfig
    from sdpgs_tpu.losses import segment_pearson_loss
    from sdpgs_tpu.losses.depth import loss_reproject_from_fused
    from sdpgs_tpu.losses.feature import segment_cluster_assign
    from sdpgs_tpu.render import render
    from sdpgs_tpu.train.state import TrainState
    from sdpgs_tpu.train.step import make_train_step

    rng = np.random.default_rng(0)
    g, cams, batch = benchmod._make_inputs(rng)
    pseudo, mono, reproj_s = benchmod._make_pseudo(rng, cams)
    print(f"reproj precompute per cam: {reproj_s*1000:.2f} ms", flush=True)

    cfg = TrainConfig()
    cfg.raster = RasterizeConfig(chunk=64)
    protos = jnp.ones((8, 3))
    bg = jnp.zeros(3)
    one = jnp.float32(1.0)

    # full steps (fresh state per timing; steps donate)
    def step_time(with_pseudo):
        g2, _, batch2 = benchmod._make_inputs(np.random.default_rng(0))
        state = TrainState.create(g2)
        step = make_train_step(
            cfg, sh_degree=3, with_pseudo=with_pseudo,
            mono_depth_fn=mono.apply if with_pseudo else None,
            unroll_views=True)
        args = (batch2, protos, bg, one) + ((pseudo,) if with_pseudo else ())
        state, m = step(state, *args)
        jax.block_until_ready(m)
        t0 = time.perf_counter()
        for _ in range(15):
            state, m = step(state, *args)
        jax.block_until_ready(m)
        dt = (time.perf_counter() - t0) / 15
        print(f"{'pseudo step' if with_pseudo else 'plain step':48s} "
              f"{dt*1000:7.2f} ms", flush=True)
        return dt

    step_time(False)
    step_time(True)

    # DPT fwd + input grad on the rendered-image path shape
    img = jnp.asarray(rng.uniform(size=(3, HEIGHT, WIDTH)).astype(np.float32))

    def dpt_fg(eps):
        def f(x):
            return jnp.sum(mono.apply(pseudo.mono_params, x))
        v, gr = jax.value_and_grad(f)(img + eps)
        return v + jnp.sum(gr)

    def dpt_fwd(eps):
        return jnp.sum(mono.apply(pseudo.mono_params, img + eps))

    timed("DPT-Hybrid fwd", dpt_fwd)
    timed("DPT-Hybrid fwd + input grad", dpt_fg)

    # pseudo render forward/backward (params grads like the step)
    params = dict(xyz=g.xyz, opacity=g.opacity, scaling=g.scaling,
                  rotation=g.rotation, features_dc=g.features_dc,
                  language_feature=g.language_feature)

    def ps_render_fb(eps):
        def f(p):
            out = render(pseudo.camera, g.replace(**p), cfg.raster, bg, 3)
            return (jnp.sum(out.color) + jnp.sum(out.depth)
                    + jnp.sum(out.feature) + jnp.sum(out.alpha)) * (1.0 + eps)
        v, gr = jax.value_and_grad(f)(params)
        return v + sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(gr))

    def ps_render_fwd(eps):
        out = render(pseudo.camera, g, cfg.raster, bg, 3)
        return (jnp.sum(out.color) + jnp.sum(out.depth)) * (1.0 + eps)

    timed("pseudo render fwd", ps_render_fwd)
    timed("pseudo render fwd+bwd(params)", ps_render_fb)

    # pseudo losses (on fixed tensors, f/b wrt depth input)
    depth = jnp.asarray(rng.uniform(1, 8, (HEIGHT, WIDTH)).astype(np.float32))
    feat = jnp.asarray(rng.uniform(size=(3, HEIGHT, WIDTH)).astype(np.float32))

    def seg_pearson_fb(eps):
        def f(d):
            labels = segment_cluster_assign(feat, protos)
            return segment_pearson_loss(d, depth * 0.5, labels, 8)
        v, gr = jax.value_and_grad(f)(depth + eps)
        return v + jnp.sum(gr)

    def reproj_fb(eps):
        def f(d):
            return loss_reproject_from_fused(
                d, pseudo.reproj_fused, pseudo.reproj_weight)
        v, gr = jax.value_and_grad(f)(depth + eps)
        return v + jnp.sum(gr)

    timed("segment pearson f/b", seg_pearson_fb)
    timed("reproj-from-fused loss f/b", reproj_fb)


if __name__ == "__main__":
    main()
