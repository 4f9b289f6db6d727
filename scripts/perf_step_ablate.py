"""Full-step ablations: measure each non-render section's TRUE in-step cost
by removing it from an otherwise identical jitted step (isolated section
timings over-state costs that fuse with neighbors in context).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_step_ablate.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from sdpgs_tpu.config import RasterizeConfig, TrainConfig
from sdpgs_tpu.core.camera import Camera
from sdpgs_tpu.core.gaussians import create_from_points
from sdpgs_tpu.losses import l1_loss_mask, psnr, ssim
from sdpgs_tpu.opt.adam import adam_update, learning_rates, trainable_params
from sdpgs_tpu.opt.densify import add_densification_stats_batched
from sdpgs_tpu.train.state import TrainState
from sdpgs_tpu.train.step import StepMetrics, ViewBatch, _render_view, _view_losses_from_out

WIDTH, HEIGHT = 504, 378
CAPACITY = 1 << 17
ALIVE = 60_000


def make_step(cfg, sh_degree, *, do_stats=True, do_adam=True, full_losses=True):
    def step_fn(state, batch, prototypes, bg, spatial_lr_scale):
        g = state.gaussians
        params = trainable_params(g)
        V = batch.image.shape[0]
        offsets = jnp.zeros((V, g.capacity, 2), jnp.float32)

        def total_loss(params, offsets):
            gg = g.replace(**params)
            outs = jax.vmap(
                lambda cam, off: _render_view(gg, cam, off, cfg, sh_degree, bg)
            )(batch.camera, offsets)
            if full_losses:
                losses, (ll1, images) = jax.vmap(
                    lambda out, img, mono, feat, seg: _view_losses_from_out(
                        out, img, mono, feat, seg, prototypes, cfg, state.step
                    )
                )(outs, batch.image, batch.depth_mono, batch.feature,
                  batch.seg_map)
            else:
                def photo(out, img):
                    image = out.color.transpose(2, 0, 1)
                    ll1 = l1_loss_mask(image, img)
                    return 0.8 * ll1 + 0.2 * (1.0 - ssim(image, img)), (ll1, image)
                losses, (ll1, images) = jax.vmap(photo)(outs, batch.image)
            return jnp.mean(losses), (ll1, images, outs)

        (loss, (ll1, images, outs)), grads = jax.value_and_grad(
            total_loss, argnums=(0, 1), has_aux=True)(params, offsets)
        param_grads, offset_grads = grads

        if do_adam:
            lrs = learning_rates(cfg.optim, state.step, spatial_lr_scale)
            g_new, opt_state = adam_update(g, param_grads, state.opt_state, lrs)
        else:
            g_new = g.replace(**{k: getattr(g, k) - 1e-4 * param_grads[k]
                                 for k in param_grads})
            opt_state = state.opt_state

        H, W = batch.image.shape[-2:]
        if do_stats:
            stats = add_densification_stats_batched(
                state.stats, offset_grads, outs.visibility, outs.radii, W, H)
        else:
            stats = state.stats

        metrics = StepMetrics(
            loss=loss, l1=jnp.mean(ll1),
            psnr=jnp.mean(jax.vmap(lambda a, b: psnr(
                jnp.clip(a, 0, 1), jnp.clip(b, 0, 1)))(images, batch.image)),
            overflow=jnp.max(outs.overflow), clipped=jnp.max(outs.clipped),
            num_alive=g_new.num_alive(), slab=jnp.max(outs.slab),
        )
        return state.replace(
            gaussians=g_new, opt_state=opt_state, stats=stats,
            step=state.step + 1,
            max_overflow=jnp.maximum(state.max_overflow, metrics.overflow),
            max_clipped=jnp.maximum(state.max_clipped, metrics.clipped),
            max_slab=jnp.maximum(state.max_slab, metrics.slab),
        ), metrics

    return jax.jit(step_fn, donate_argnums=(0,))


def main():
    rng = np.random.default_rng(0)
    pts = (rng.normal(size=(ALIVE, 3)) * [1.2, 0.9, 0.6] + [0, 0, 4.0]).astype(np.float32)
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

    variants = [
        ("full step", dict()),
        ("no stats", dict(do_stats=False)),
        ("no adam (sgd)", dict(do_adam=False)),
        ("photometric losses only", dict(full_losses=False)),
    ]
    for name, kw in variants:
        tc = TrainConfig()
        tc.raster = RasterizeConfig(chunk=64)
        g = create_from_points(pts, cols, CAPACITY,
                               init_scale=np.full(ALIVE, 1e-4))
        state = TrainState.create(g)
        step = make_step(tc, 3, **kw)
        state, m = step(state, batch, protos, bg, jnp.float32(1.0))
        jax.block_until_ready(m)
        t0 = time.perf_counter()
        for _ in range(30):
            state, m = step(state, batch, protos, bg, jnp.float32(1.0))
        jax.block_until_ready(m)
        dt = (time.perf_counter() - t0) / 30
        print(f"{name:28s} {dt*1000:7.2f} ms ({1/dt:5.1f} it/s)", flush=True)


if __name__ == "__main__":
    main()
