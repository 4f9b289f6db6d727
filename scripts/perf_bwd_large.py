"""Backward-pass cost split at the 1M-Gaussian / 1008x756 config: composite bwd kernel / payload scatter-add /
preprocess backward, each chained inside ONE jit.
Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_bwd.py"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from sdpgs_tpu.config import RasterizeConfig
from sdpgs_tpu.core.camera import Camera
from sdpgs_tpu.core.gaussians import create_from_points
from sdpgs_tpu.ops.rasterize import binning as binning_lib
from sdpgs_tpu.ops.rasterize import composite_xla
from sdpgs_tpu.ops.rasterize.preprocess import preprocess_fused
from sdpgs_tpu.ops.rasterize.rasterizer import _pad_row

WIDTH, HEIGHT = 1008, 756
CAPACITY = 1 << 20
ALIVE = 1_000_000
N = 5


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
    print(f"{name:42s} {dt*1000:7.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    pts = (rng.normal(size=(ALIVE, 3)) * [3.2, 2.4, 1.8] + [0, 0, 6.5]).astype(np.float32)
    cols = rng.uniform(size=(ALIVE, 3)).astype(np.float32)
    g = create_from_points(pts, cols, CAPACITY, init_scale=np.full(ALIVE, 1e-4))
    cam = Camera.create(R=np.eye(3), T=np.zeros(3), fovx=0.9, fovy=0.7,
                        width=WIDTH, height=HEIGHT)
    cfg = RasterizeConfig(chunk=64, max_per_tile=2048, rank_block_slots=512, rank_block_gaussians=2048, tiles_per_kernel_step=4)
    P = CAPACITY

    scale = g.get_scaling()
    quat = g.get_rotation()
    opacity = g.get_opacity()[:, 0]
    feature = g.language_feature_normalized()

    prep = preprocess_fused(g.xyz, scale, quat, cam, g.alive,
                            near=cfg.near, low_pass=cfg.low_pass)
    bins = binning_lib.bin_gaussians(prep, WIDTH, HEIGHT, cfg)
    idx = jax.block_until_ready(bins.tile_index)           # [T, K]
    counts = jax.block_until_ready(bins.tile_counts)
    T, K = idx.shape

    payload = jnp.concatenate(
        [prep.mean2d, prep.conic, (opacity * prep.valid)[:, None],
         cols if False else jnp.zeros((P, 3)), prep.depth[:, None],
         jnp.zeros((P, 3))], axis=-1)
    payload = jax.block_until_ready(payload)

    tiles_x, tiles_y = binning_lib.tile_grid(WIDTH, HEIGHT, cfg.tile)
    px, py = composite_xla.tile_pixel_coords(tiles_x, tiles_y, cfg.tile)

    from sdpgs_tpu.ops.rasterize.composite_pallas import composite_tiles_pallas

    gathered0 = jax.block_until_ready(_pad_row(payload)[idx])

    # 1. composite kernel fwd only (gathered inputs fixed)
    def comp_fwd(eps):
        gth = gathered0 + eps
        out = composite_tiles_pallas(
            gth[..., 0:2], gth[..., 2:5], gth[..., 5], gth[..., 6:13],
            px, py, cfg, counts=counts)
        return jnp.sum(out.values) + jnp.sum(out.final_t)

    # 2. composite kernel fwd+bwd w.r.t. gathered payload (no scatter)
    def comp_fwd_bwd(eps):
        def loss(gth):
            out = composite_tiles_pallas(
                gth[..., 0:2], gth[..., 2:5], gth[..., 5], gth[..., 6:13],
                px, py, cfg, counts=counts)
            return jnp.sum(out.values) + jnp.sum(out.final_t)
        return jnp.sum(jax.grad(loss)(gathered0 + eps))

    # 3. scatter-add of per-entry grads back to the payload rows
    gvals = jax.block_until_ready(
        jnp.asarray(rng.uniform(size=(T * K, 13)).astype(np.float32)))
    flat_idx = jax.block_until_ready(idx.reshape(-1))

    def scatter_add(eps):
        z = jnp.zeros((P + 1, 13), jnp.float32)
        z = z.at[flat_idx].add(gvals + eps)
        return jnp.sum(z[0])

    # 4. gather+scatter pair via jax.grad through the gather
    def gather_grad(eps):
        def loss(pl_):
            gth = _pad_row(pl_)[idx]
            return jnp.sum(gth * gvals.reshape(T, K, 13))
        return jnp.sum(jax.grad(loss)(payload + eps))

    # 5. preprocess fwd+bwd
    def prep_fwd_bwd(eps):
        def loss(xyz, sc, qt):
            p = preprocess_fused(xyz, sc, qt, cam, g.alive,
                                 near=cfg.near, low_pass=cfg.low_pass)
            return jnp.sum(p.mean2d) + jnp.sum(p.conic) + jnp.sum(p.depth)
        gs = jax.grad(loss, argnums=(0, 1, 2))(g.xyz + eps, scale, quat)
        return sum(jnp.sum(x) for x in gs)

    # 2b. same, with bf16 triangular matmuls in the bwd kernel
    cfg_bf16 = RasterizeConfig(chunk=64, bwd_bf16=True)

    def comp_fwd_bwd_bf16(eps):
        def loss(gth):
            out = composite_tiles_pallas(
                gth[..., 0:2], gth[..., 2:5], gth[..., 5], gth[..., 6:13],
                px, py, cfg_bf16, counts=counts)
            return jnp.sum(out.values) + jnp.sum(out.final_t)
        return jnp.sum(jax.grad(loss)(gathered0 + eps))

    # r3 measured (v5e): composite fwd 22.0, f/b 46.7 (bf16 tri 46.6),
    # explicit scatter 121.8, "gather f/b pair" 5.7 (MEASUREMENT TRAP —
    # XLA deletes a scatter whose output is only summed), preprocess 7.5.
    timed("composite fwd (fixed gather)", comp_fwd)
    timed("composite fwd+bwd (no scatter)", comp_fwd_bwd)
    timed("composite fwd+bwd bf16 tri", comp_fwd_bwd_bf16)
    timed("payload scatter-add [T*K,13]", scatter_add)
    timed("preprocess fwd+bwd", prep_fwd_bwd)







if __name__ == "__main__":
    main()


def composed():
    """gather -> composite -> backward -> scatter, composed as in rasterize:
    isolates whether the in-context scatter lowers like the cheap micro form
    (6.7 ms) or the slow explicit form (120 ms)."""
    rng = np.random.default_rng(0)
    pts = (rng.normal(size=(ALIVE, 3)) * [3.2, 2.4, 1.8] + [0, 0, 6.5]).astype(np.float32)
    cols = rng.uniform(size=(ALIVE, 3)).astype(np.float32)
    g = create_from_points(pts, cols, CAPACITY, init_scale=np.full(ALIVE, 1e-4))
    cam = Camera.create(R=np.eye(3), T=np.zeros(3), fovx=0.9, fovy=0.7,
                        width=WIDTH, height=HEIGHT)
    cfg = RasterizeConfig(chunk=64, max_per_tile=2048, rank_block_slots=512,
                          rank_block_gaussians=2048, tiles_per_kernel_step=4)
    P = CAPACITY

    prep = preprocess_fused(g.xyz, g.get_scaling(), g.get_rotation(), cam,
                            g.alive, near=cfg.near, low_pass=cfg.low_pass)
    bins = binning_lib.bin_gaussians(prep, WIDTH, HEIGHT, cfg)
    idx = jax.block_until_ready(bins.tile_index)
    counts = jax.block_until_ready(bins.tile_counts)
    T, K = idx.shape
    payload = jax.block_until_ready(
        jnp.asarray(rng.uniform(0.1, 0.9, size=(P, 13)).astype(np.float32)))
    tiles_x, tiles_y = binning_lib.tile_grid(WIDTH, HEIGHT, cfg.tile)
    px, py = composite_xla.tile_pixel_coords(tiles_x, tiles_y, cfg.tile)

    from sdpgs_tpu.ops.rasterize.composite_pallas import composite_tiles_pallas

    def pair_composed(eps):
        def loss(pl_):
            gth = _pad_row(pl_)[idx]
            out = composite_tiles_pallas(
                gth[..., 0:2], gth[..., 2:5], gth[..., 5], gth[..., 6:13],
                px, py, cfg, counts=counts)
            return jnp.sum(out.values) + jnp.sum(out.final_t)
        return jnp.sum(jax.grad(loss)(payload + eps))

    timed("gather+composite f/b composed", pair_composed)


# composed()  # measured: 172.3 ms (in-context scatter ~120)


def scatter_layout_probe():
    """Is the in-context scatter slowness (120 ms vs 5.7 standalone) caused
    by XLA fusing the [T,C,K]->[T,K,C] transpose of the kernel cotangent
    into the scatter (element-random access instead of row writes)?"""
    rng = np.random.default_rng(0)
    P = CAPACITY
    Tn = 768 * 2048
    gvals13 = jax.block_until_ready(
        jnp.asarray(rng.uniform(size=(13, Tn)).astype(np.float32)))
    flat_idx = jax.block_until_ready(
        jnp.asarray(rng.integers(0, P, size=(Tn,)).astype(np.int32)))

    def scatter_plain(eps):
        z = jnp.zeros((P + 1, 13), jnp.float32)
        z = z.at[flat_idx].add(gvals13.T + eps)
        return jnp.sum(z[0])

    def scatter_barrier(eps):
        upd = jax.lax.optimization_barrier(gvals13.T + eps)
        z = jnp.zeros((P + 1, 13), jnp.float32)
        z = z.at[flat_idx].add(upd)
        return jnp.sum(z[0])

    timed("scatter w/ fused transposed updates", scatter_plain)
    timed("scatter w/ barrier (materialized)", scatter_barrier)


# scatter_layout_probe()  # 134 fused, 133 barrier


def scatter_layout_fixes():
    """Force a row-major materialization of the transposed updates before
    the scatter: (a) identity matmul (dot outputs are row-major and dots
    never fuse into scatters), (b) reshape->barrier->reshape."""
    rng = np.random.default_rng(0)
    P = CAPACITY
    Tn = 768 * 2048
    gvals13 = jax.block_until_ready(
        jnp.asarray(rng.uniform(size=(13, Tn)).astype(np.float32)))
    flat_idx = jax.block_until_ready(
        jnp.asarray(rng.integers(0, P, size=(Tn,)).astype(np.int32)))
    eye = jnp.eye(13, dtype=jnp.float32)

    def scatter_dot(eps):
        upd = jnp.dot(gvals13.T + eps, eye,
                      preferred_element_type=jnp.float32)
        z = jnp.zeros((P + 1, 13), jnp.float32)
        z = z.at[flat_idx].add(upd)
        return jnp.sum(z[0])

    def scatter_reshape(eps):
        u = (gvals13.T + eps).reshape(-1)
        u = jax.lax.optimization_barrier(u)
        z = jnp.zeros((P + 1, 13), jnp.float32)
        z = z.at[flat_idx].add(u.reshape(Tn, 13))
        return jnp.sum(z[0])

    timed("scatter w/ identity-dot updates", scatter_dot)
    timed("scatter w/ reshape-barrier updates", scatter_reshape)


# scatter_layout_fixes()  # 133, 136 - layout not the cause


def composed_noscatter():
    """Composed gather->composite f/b with the payload scatter REMOVED
    (custom_vjp returning zero payload grads): if this lands near
    composite-f/b + gather-fwd (~53 ms), the composed gap IS the scatter;
    if it stays ~170 ms, the gap is elsewhere."""
    rng = np.random.default_rng(0)
    pts = (rng.normal(size=(ALIVE, 3)) * [3.2, 2.4, 1.8] + [0, 0, 6.5]).astype(np.float32)
    cols = rng.uniform(size=(ALIVE, 3)).astype(np.float32)
    g = create_from_points(pts, cols, CAPACITY, init_scale=np.full(ALIVE, 1e-4))
    cam = Camera.create(R=np.eye(3), T=np.zeros(3), fovx=0.9, fovy=0.7,
                        width=WIDTH, height=HEIGHT)
    cfg = RasterizeConfig(chunk=64, max_per_tile=2048, rank_block_slots=512,
                          rank_block_gaussians=2048, tiles_per_kernel_step=4)
    P = CAPACITY

    prep = preprocess_fused(g.xyz, g.get_scaling(), g.get_rotation(), cam,
                            g.alive, near=cfg.near, low_pass=cfg.low_pass)
    bins = binning_lib.bin_gaussians(prep, WIDTH, HEIGHT, cfg)
    idx = jax.block_until_ready(bins.tile_index)
    counts = jax.block_until_ready(bins.tile_counts)
    T, K = idx.shape
    payload = jax.block_until_ready(
        jnp.asarray(rng.uniform(0.1, 0.9, size=(P, 13)).astype(np.float32)))
    tiles_x, tiles_y = binning_lib.tile_grid(WIDTH, HEIGHT, cfg.tile)
    px, py = composite_xla.tile_pixel_coords(tiles_x, tiles_y, cfg.tile)

    from sdpgs_tpu.ops.rasterize.composite_pallas import composite_tiles_pallas

    @jax.custom_vjp
    def gather_nograd(pl_):
        return _pad_row(pl_)[idx]

    def _f(pl_):
        return _pad_row(pl_)[idx], None

    def _b(res, ct):
        return (jnp.zeros((P, 13), jnp.float32),)

    gather_nograd.defvjp(_f, _b)

    def pair_noscatter(eps):
        def loss(pl_):
            gth = gather_nograd(pl_)
            out = composite_tiles_pallas(
                gth[..., 0:2], gth[..., 2:5], gth[..., 5], gth[..., 6:13],
                px, py, cfg, counts=counts)
            return jnp.sum(out.values) + jnp.sum(out.final_t)
        return jnp.sum(jax.grad(loss)(payload + eps))

    timed("composed f/b, scatter removed", pair_noscatter)

    # the real composed pair again for a same-session baseline
    def pair_composed(eps):
        def loss(pl_):
            gth = _pad_row(pl_)[idx]
            out = composite_tiles_pallas(
                gth[..., 0:2], gth[..., 2:5], gth[..., 5], gth[..., 6:13],
                px, py, cfg, counts=counts)
            return jnp.sum(out.values) + jnp.sum(out.final_t)
        return jnp.sum(jax.grad(loss)(payload + eps))

    timed("composed f/b, real scatter", pair_composed)


# composed_noscatter()  # measured: 6.8 ms no-scatter vs 175 ms real -> the
# composed backward gap IS the scatter (~120 ms at 1.57M rows)
