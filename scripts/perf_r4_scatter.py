"""R4: payload-grad scatter alternatives at the 1M-Gaussian wall, measured
IN-CONTEXT (real gather->composite->grad pair, real consumer) to dodge the
sum(scatter)=sum(updates) rewrite trap (docs/ROADMAP.md r3).

Variants (each as the custom_vjp backward of the payload gather):
  A. baseline: scatter-add all T*K rows             (~120 ms @1.57M, r3)
  B. bf16 updates + bf16 accumulator
  C. live-prefix compaction: the live entries are a per-tile prefix
     (ranks are contiguous 0..count-1), so a marker-cumsum map + coherent
     row-gather compacts [T*K] -> [Ecap] rows before one smaller scatter
  D. compaction + bf16
Isolated probes: scatter row-scaling at the 1M destination, permutation
scatter-set (the gather-path's unsort), int32 1-col permutation scatter
(inverse-order build), row-gather throughput.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_r4_scatter.py
"""

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


def timed(name, body, n=N):
    def loop(eps):
        def it(i, eps):
            return body(eps) * 0.0 + eps
        return jax.lax.fori_loop(0, n, it, eps)

    fn = jax.jit(loop)
    out = fn(jnp.float32(0.0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(out)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:52s} {dt*1000:8.2f} ms", flush=True)
    return dt


def build_compact_map(counts, Ecap, K):
    """Compact slot n -> dense source slot (t*K + k), for the live prefix
    rows of every tile. No searchsorted: tile id via marker scatter+cumsum."""
    counts = jnp.minimum(counts, K)
    offs = jnp.cumsum(counts) - counts                   # exclusive [T]
    total = jnp.sum(counts)
    ind = jnp.zeros((Ecap,), jnp.int32).at[offs].add(1, mode="drop")
    seg = jnp.cumsum(ind) - 1                            # [Ecap] tile id
    n = jnp.arange(Ecap, dtype=jnp.int32)
    k = n - offs[seg]
    valid = n < total
    src = jnp.where(valid, seg * K + k, 0)
    return src, valid, total


def main():
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
    counts = jax.block_until_ready(jnp.minimum(bins.tile_counts, cfg.max_per_tile))
    T, K = idx.shape
    live = int(jnp.sum(counts))
    print(f"T={T} K={K} rows={T*K} live={live} fill={live/(T*K):.3f} "
          f"max_count={int(jnp.max(counts))}", flush=True)
    idx_flat = jax.block_until_ready(idx.reshape(-1))
    payload = jax.block_until_ready(
        jnp.asarray(rng.uniform(0.1, 0.9, size=(P, 13)).astype(np.float32)))
    tiles_x, tiles_y = binning_lib.tile_grid(WIDTH, HEIGHT, cfg.tile)
    px, py = composite_xla.tile_pixel_coords(tiles_x, tiles_y, cfg.tile)

    from sdpgs_tpu.ops.rasterize.composite_pallas import composite_tiles_pallas

    Ecap = 1 << 20
    # the compact map is parameter-independent (pure binning geometry): in
    # the real integration it is built once alongside the table, so prebuild
    # it here and carry it as a constant closure (block_until_ready'd).
    src_c, valid_c, _ = build_compact_map(counts, Ecap, K)
    cidx_c = jnp.where(valid_c, idx_flat[src_c], P)
    src_c = jax.block_until_ready(src_c)
    valid_c = jax.block_until_ready(valid_c)
    cidx_c = jax.block_until_ready(cidx_c)

    def make_pair(bwd_impl):
        @jax.custom_vjp
        def gth_op(pl_):
            return _pad_row(pl_)[idx]

        def _f(pl_):
            return _pad_row(pl_)[idx], None

        def _b(res, ct):
            return (bwd_impl(ct),)

        gth_op.defvjp(_f, _b)

        def pair(eps):
            def loss(pl_):
                gth = gth_op(pl_)
                out = composite_tiles_pallas(
                    gth[..., 0:2], gth[..., 2:5], gth[..., 5], gth[..., 6:13],
                    px, py, cfg, counts=counts)
                return jnp.sum(out.values) + jnp.sum(out.final_t)
            d = jax.grad(loss)(payload + eps)
            return jnp.sum(d * d)   # nonlinear consumer: no scatter deletion
        return pair

    def bwd_scatter(ct):
        z = jnp.zeros((P + 1, 13), jnp.float32)
        z = z.at[idx_flat].add(ct.reshape(T * K, 13))
        return z[:P]

    def bwd_scatter_bf16(ct):
        z = jnp.zeros((P + 1, 13), jnp.bfloat16)
        z = z.at[idx_flat].add(ct.reshape(T * K, 13).astype(jnp.bfloat16))
        return z[:P].astype(jnp.float32)

    def bwd_compact(ct):
        rows = jnp.where(valid_c[:, None], ct.reshape(T * K, 13)[src_c], 0.0)
        z = jnp.zeros((P + 1, 13), jnp.float32)
        z = z.at[cidx_c].add(rows)
        return z[:P]

    def bwd_compact_bf16(ct):
        rows = jnp.where(valid_c[:, None],
                         ct.reshape(T * K, 13)[src_c].astype(jnp.bfloat16), 0)
        z = jnp.zeros((P + 1, 13), jnp.bfloat16)
        z = z.at[cidx_c].add(rows)
        return z[:P].astype(jnp.float32)

    # correctness of the compact backward vs baseline (once, small consumer)
    ct_probe = jnp.asarray(rng.uniform(size=(T, K, 13)).astype(np.float32))
    da = jax.jit(bwd_scatter)(ct_probe)
    db = jax.jit(bwd_compact)(ct_probe)
    err = float(jnp.max(jnp.abs(da - db)))
    print(f"compact-vs-baseline backward max err: {err:.2e}", flush=True)

    timed("pair A: scatter all rows (baseline)", make_pair(bwd_scatter))
    timed("pair B: scatter bf16", make_pair(bwd_scatter_bf16))
    timed("pair C: live-prefix compact scatter", make_pair(bwd_compact))
    timed("pair D: compact + bf16", make_pair(bwd_compact_bf16))

    # --- isolated probes --------------------------------------------------
    gvals = jax.block_until_ready(
        jnp.asarray(rng.uniform(size=(T * K, 13)).astype(np.float32)))

    def scatter_rows(nrows):
        ridx = jax.block_until_ready(
            jnp.asarray(rng.integers(0, P, size=(nrows,)).astype(np.int32)))
        gv = gvals[:nrows]

        def body(eps):
            z = jnp.zeros((P + 1, 13), jnp.float32)
            z = z.at[ridx].add(gv + eps)
            return jnp.sum(z * z)
        return body

    for nr in (T * K, T * K // 2, T * K // 4, T * K // 8):
        timed(f"raw scatter-add {nr} rows -> [1M,13]", scatter_rows(nr))

    order = jax.block_until_ready(
        jnp.asarray(rng.permutation(P).astype(np.int32)))

    def perm_set(eps):
        z = jnp.zeros((P, 13), jnp.float32).at[order].set(
            gvals[:P] + eps, unique_indices=True)
        return jnp.sum(z * z)

    def perm_set_i32(eps):
        z = jnp.zeros((P,), jnp.int32).at[order].set(
            jnp.arange(P, dtype=jnp.int32), unique_indices=True)
        return jnp.sum(z).astype(jnp.float32) + eps * 0.0

    def row_gather(eps):
        rows = (gvals + eps)[order % (T * K)]
        return jnp.sum(rows * rows)

    def coherent_gather(eps):
        rows = (gvals + eps)[src_c]
        return jnp.sum(rows * rows)

    def map_build(eps):
        src, valid, total = build_compact_map(
            counts + jnp.int32(eps * 0), Ecap, K)
        cidx = jnp.where(valid, idx_flat[src], P)
        return (jnp.sum(cidx) + jnp.sum(src)).astype(jnp.float32)

    timed("perm scatter-SET 1M rows [13] unique", perm_set)
    timed("perm scatter-SET 1M rows int32 1-col", perm_set_i32)
    timed("random row-gather 1M rows of [13]", row_gather)
    timed("coherent row-gather (compact src)", coherent_gather)
    timed("compact map build (cumsum+marker)", map_build)


if __name__ == "__main__":
    main()
