"""Device-side section timing: each section runs N times inside ONE jit via
lax.fori_loop with a data dependence, so wall time = N * section time with
no dispatch/relay noise. Run: PYTHONPATH=/root/repo:/root/.axon_site
python scripts/perf_sections.py"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from sdpgs_tpu.config import RasterizeConfig
from sdpgs_tpu.core.camera import Camera
from sdpgs_tpu.core.gaussians import create_from_points

WIDTH, HEIGHT = 504, 378
CAPACITY = 1 << 17
ALIVE = 60_000
N = 20


def main():
    rng = np.random.default_rng(0)
    pts = (rng.normal(size=(ALIVE, 3)) * [1.2, 0.9, 0.6] + [0, 0, 4.0]).astype(np.float32)
    cols = rng.uniform(size=(ALIVE, 3)).astype(np.float32)
    g = create_from_points(pts, cols, CAPACITY, init_scale=np.full(ALIVE, 1e-4))
    cam = Camera.create(R=np.eye(3), T=np.zeros(3), fovx=0.9, fovy=0.7,
                        width=WIDTH, height=HEIGHT)
    cfg = RasterizeConfig(chunk=64)
    bg = jnp.zeros(3)

    from sdpgs_tpu.ops.rasterize import binning as binning_lib
    from sdpgs_tpu.ops.rasterize import composite_xla
    from sdpgs_tpu.ops.rasterize.preprocess import Preprocessed, preprocess_fused
    from sdpgs_tpu.ops.rasterize.rasterizer import rasterize, rasterize_tiles

    scale = g.get_scaling()
    quat = g.get_rotation()
    color = g.colors_from_sh(cam.cam_pos, 3)
    feature = g.language_feature_normalized()
    opacity = g.get_opacity()[:, 0]

    def timed(name, body):
        def loop(eps):
            def it(i, eps):
                return body(eps) * 0.0 + eps
            return jax.lax.fori_loop(0, N, it, eps)

        fn = jax.jit(loop)
        out = fn(jnp.float32(0.0))
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = fn(out)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / N
        print(f"{name:30s} {dt*1000:7.2f} ms", flush=True)
        return dt

    def prep_only(eps):
        p = preprocess_fused(g.xyz + eps, scale, quat, cam, g.alive,
                             near=cfg.near, low_pass=cfg.low_pass)
        return jnp.sum(p.mean2d) + jnp.sum(p.conic)

    def prep_bin(eps):
        p = preprocess_fused(g.xyz + eps, scale, quat, cam, g.alive,
                             near=cfg.near, low_pass=cfg.low_pass)
        b = binning_lib.bin_gaussians(p, WIDTH, HEIGHT, cfg)
        return jnp.sum(b.tile_index).astype(jnp.float32)

    def fwd(eps):
        out = rasterize(g.xyz + eps, None, opacity, color, feature, g.alive,
                        cam, bg, cfg, scale=scale, quat=quat)
        return jnp.sum(out.color) + jnp.sum(out.depth)

    def fwd_bwd(eps):
        def loss(xyz):
            out = rasterize(xyz, None, opacity, color, feature, g.alive,
                            cam, bg, cfg, scale=scale, quat=quat)
            return jnp.sum(out.color) + jnp.sum(out.depth) * 1e-3
        return jnp.sum(jax.grad(loss)(g.xyz + eps))

    def fwd_bwd_all(eps):
        def loss(xyz, sc, qt, opa, col, feat):
            out = rasterize(xyz, None, opa, col, feat, g.alive,
                            cam, bg, cfg, scale=sc, quat=qt)
            return jnp.sum(out.color) + jnp.sum(out.depth) * 1e-3
        grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5))(
            g.xyz + eps, scale, quat, opacity, color, feature)
        return sum(jnp.sum(x) for x in grads)

    timed("preprocess", prep_only)
    timed("preprocess+binning", prep_bin)
    timed("render fwd", fwd)
    timed("render fwd+bwd(xyz)", fwd_bwd)
    timed("render fwd+bwd(all params)", fwd_bwd_all)


def step_parts():
    """Times the train-step pieces outside the renderer."""
    import sys
    sys.path.insert(0, "/root/repo/scripts")
    from perf_probe import make_inputs

    from sdpgs_tpu.config import TrainConfig
    from sdpgs_tpu.opt.adam import adam_update, learning_rates, trainable_params
    from sdpgs_tpu.opt.densify import add_densification_stats
    from sdpgs_tpu.train.state import TrainState
    from sdpgs_tpu.train.step import _render_view, _view_losses_from_out
    from sdpgs_tpu.losses import psnr

    cfg = TrainConfig()
    cfg.raster = RasterizeConfig(chunk=64)
    g, cams, batch = make_inputs(1)
    state = TrainState.create(g)
    protos = jnp.ones((8, 3))
    bg = jnp.zeros(3)

    def timed(name, body):
        def loop(eps):
            def it(i, eps):
                return body(eps) * 0.0 + eps
            return jax.lax.fori_loop(0, N, it, eps)
        fn = jax.jit(loop)
        out = fn(jnp.float32(0.0))
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = fn(out)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / N
        print(f"{name:30s} {dt*1000:7.2f} ms", flush=True)

    V = 1
    def loss_grads(eps):
        params = trainable_params(g)
        params = {k: v + eps for k, v in params.items()}
        offsets = jnp.zeros((V, g.capacity, 2), jnp.float32)
        def total_loss(params, offsets):
            gg = g.replace(**params)
            outs = jax.vmap(lambda cam, off: _render_view(
                gg, cam, off, cfg, 3, bg))(batch.camera, offsets)
            losses, aux = jax.vmap(
                lambda out, img, mono, feat, seg: _view_losses_from_out(
                    out, img, mono, feat, seg, protos, cfg, state.step)
            )(outs, batch.image, batch.depth_mono, batch.feature, batch.seg_map)
            return jnp.mean(losses), aux
        (loss, aux), grads = jax.value_and_grad(total_loss, argnums=(0, 1),
                                                has_aux=True)(params, offsets)
        return loss + sum(jnp.sum(v) for v in grads[0].values())

    def adam_only(eps):
        params = trainable_params(g)
        grads = {k: v * 0 + eps for k, v in params.items()}
        lrs = learning_rates(cfg.optim, state.step, jnp.float32(1.0))
        g2, opt2 = adam_update(g, grads, state.opt_state, lrs)
        return jnp.sum(g2.xyz)

    def stats_only(eps):
        off = jnp.zeros((g.capacity, 2), jnp.float32) + eps
        vis = g.alive > 0
        radii = g.alive * 3.0
        s = add_densification_stats(state.stats, off, vis, radii, WIDTH, HEIGHT)
        return jnp.sum(s.xyz_gradient_accum)

    def ssim_only(eps):
        from sdpgs_tpu.losses import ssim, l1_loss_mask
        img = batch.image[0] + eps
        return (1 - ssim(img, batch.image[0] * 0.9)) + l1_loss_mask(img, batch.image[0] * 0.9)

    timed("loss fwd+bwd (render+losses)", loss_grads)
    timed("adam update", adam_only)
    timed("densify stats", stats_only)
    timed("ssim+l1 only", ssim_only)


if __name__ == "__main__":
    main()
    step_parts()
