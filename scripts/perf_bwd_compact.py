"""Backward payload-grad scatter: baseline vs compacted-row variants.

The [T,K,13] per-entry gradients from the composite backward scatter-add
into [P+1,13] via the payload gather's autodiff transpose. Most K slots are
dead sentinels (live entries are a per-tile prefix of length tile_counts);
this lab measures whether compacting grads to a static S_cap of live rows
(gather) before a smaller scatter-add wins, plus the raw row-scaling of the
gather-transpose scatter and bf16 gather bandwidth.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_bwd_compact.py
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
from sdpgs_tpu.ops.rasterize.preprocess import preprocess_fused
from sdpgs_tpu.ops.rasterize.rasterizer import _pad_row

WIDTH, HEIGHT = 504, 378
CAPACITY = 1 << 17
ALIVE = 60_000
N = 20


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
    print(f"{name:46s} {dt*1000:7.2f} ms", flush=True)
    return dt


def build_compact_map(counts, S, K, T):
    """Map compact slot n -> (dense source slot, validity).

    Live entries per tile are the prefix [0:counts[t]); compact slot n owns
    the k-th live entry of tile seg(n) with seg via scatter+cumsum (no
    searchsorted: ~65ms per 400k queries on v5e)."""
    offs = jnp.cumsum(counts) - counts                       # exclusive [T]
    total = jnp.sum(counts)
    ind = jnp.zeros((S,), jnp.int32).at[offs].add(1, mode="drop")
    seg = jnp.cumsum(ind) - 1                                # [S] tile id
    n = jnp.arange(S, dtype=jnp.int32)
    k = n - offs[seg]
    valid = n < total
    src = jnp.where(valid, seg * K + k, 0)
    return src, valid, total


def main():
    rng = np.random.default_rng(0)
    pts = (rng.normal(size=(ALIVE, 3)) * [1.2, 0.9, 0.6] + [0, 0, 4.0]).astype(np.float32)
    cols = rng.uniform(size=(ALIVE, 3)).astype(np.float32)
    g = create_from_points(pts, cols, CAPACITY, init_scale=np.full(ALIVE, 1e-4))
    cam = Camera.create(R=np.eye(3), T=np.zeros(3), fovx=0.9, fovy=0.7,
                        width=WIDTH, height=HEIGHT)
    cfg = RasterizeConfig(chunk=64)
    P = CAPACITY

    scale = g.get_scaling()
    quat = g.get_rotation()
    opacity = g.get_opacity()[:, 0]

    prep = preprocess_fused(g.xyz, scale, quat, cam, g.alive,
                            near=cfg.near, low_pass=cfg.low_pass)
    bins = binning_lib.bin_gaussians(prep, WIDTH, HEIGHT, cfg)
    idx = jax.block_until_ready(bins.tile_index)             # [T, K]
    counts = jax.block_until_ready(bins.tile_counts)
    T, K = idx.shape
    total_live = int(jnp.sum(counts))
    print(f"T={T} K={K} T*K={T*K} live={total_live} "
          f"fill={total_live/(T*K):.3f} max_count={int(jnp.max(counts))}",
          flush=True)

    payload = jax.block_until_ready(
        jnp.asarray(rng.uniform(size=(P, 13)).astype(np.float32)))
    payload_bf16 = jax.block_until_ready(payload.astype(jnp.bfloat16))
    gvals = jax.block_until_ready(
        jnp.asarray(rng.uniform(size=(T * K, 13)).astype(np.float32)))
    idx_flat = jax.block_until_ready(idx.reshape(-1))

    # --- baseline: fwd gather + transpose scatter-add of all T*K rows -----
    def gather_pair(eps):
        def loss(pl_):
            gth = _pad_row(pl_)[idx]
            return jnp.sum(gth * gvals.reshape(T, K, 13))
        return jnp.sum(jax.grad(loss)(payload + eps))

    def gather_fwd_only(eps):
        return jnp.sum(_pad_row(payload + eps)[idx])

    def gather_fwd_bf16(eps):
        return jnp.sum(
            _pad_row(payload_bf16 + eps.astype(jnp.bfloat16))[idx]
            .astype(jnp.float32))

    # --- compacted: map + grad gather [S,13] + scatter-add [S,13] ---------
    def compact_variant(S):
        def body(eps):
            src, valid, _ = build_compact_map(counts, S, K, T)
            cidx = jnp.where(valid, idx_flat[src], P)
            g_c = jnp.where(valid[:, None], (gvals + eps)[src], 0.0)
            scat = jax.linear_transpose(
                lambda pp: pp[cidx], jnp.zeros((P + 1, 13), jnp.float32))
            d = scat(g_c)[0]
            # plus the forward gather (unchanged part of the pair)
            gth = _pad_row(payload)[idx] + eps
            return jnp.sum(d) + jnp.sum(gth) * 0.0
        return body

    # --- raw row scaling of the gather-transpose scatter ------------------
    def scatter_rows(nrows):
        ridx = jax.block_until_ready(
            jnp.asarray(rng.integers(0, P, size=(nrows,)).astype(np.int32)))
        gv = gvals[:nrows]
        def body(eps):
            scat = jax.linear_transpose(
                lambda pp: pp[ridx], jnp.zeros((P + 1, 13), jnp.float32))
            return jnp.sum(scat(gv + eps)[0])
        return body

    # --- map construction alone -------------------------------------------
    def map_only(eps):
        src, valid, total = build_compact_map(counts + eps.astype(jnp.int32) * 0,
                                              98304, K, T)
        cidx = jnp.where(valid, idx_flat[src], P)
        return (jnp.sum(cidx) + jnp.sum(src)).astype(jnp.float32)

    # --- binning sub-split -------------------------------------------------
    depth_key = jax.block_until_ready(jnp.where(prep.valid, prep.depth, jnp.inf))
    packed = jax.block_until_ready(jnp.arange(P, dtype=jnp.int32))

    def sort_only(eps):
        gids = jnp.arange(P, dtype=jnp.int32)
        k, p, o = jax.lax.sort((depth_key + eps, packed, gids), num_keys=1,
                               is_stable=True)
        return jnp.sum(k) + jnp.sum(o).astype(jnp.float32)

    def bin_full(eps):
        from sdpgs_tpu.ops.rasterize.preprocess import Preprocessed
        p2 = Preprocessed(valid=prep.valid, mean2d=prep.mean2d + eps,
                          depth=prep.depth, conic=prep.conic, radius=prep.radius)
        b = binning_lib.bin_gaussians(p2, WIDTH, HEIGHT, cfg)
        return jnp.sum(b.tile_index).astype(jnp.float32)

    timed("gather fwd only f32 [T*K,13]", gather_fwd_only)
    timed("gather fwd only bf16 [T*K,13]", gather_fwd_bf16)
    timed("gather fwd+bwd pair (baseline)", gather_pair)
    timed("compact map build alone (S=98304)", map_only)
    timed("compact bwd S=98304 (+fwd gather)", compact_variant(98304))
    timed("compact bwd S=65536 (+fwd gather)", compact_variant(65536))
    timed("compact bwd S=49152 (+fwd gather)", compact_variant(49152))
    timed("raw scatter 196608 rows", scatter_rows(196608))
    timed("raw scatter 98304 rows", scatter_rows(98304))
    timed("raw scatter 49152 rows", scatter_rows(49152))
    timed("depth sort alone [131k x3]", sort_only)
    timed("bin_gaussians full", bin_full)


if __name__ == "__main__":
    main()
