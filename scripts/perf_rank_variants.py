"""Rank-kernel variant timings to locate the 5.4ms (perf_binning.py):
  A. grouped-compact kernel as shipped (baseline)
  B. rank-only kernel (no compact section)
  C. grid-overhead floor: near-empty kernel, same grid/blocks
  D. bf16 triangular matmul for the within-block cumsum (exact: 0/1 inputs,
     f32 accumulation)
Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_rank_variants.py"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sdpgs_tpu.config import RasterizeConfig
from sdpgs_tpu.core.camera import Camera
from sdpgs_tpu.core.gaussians import create_from_points
from sdpgs_tpu.ops.rasterize import binning as binning_lib
from sdpgs_tpu.ops.rasterize.preprocess import preprocess_fused
from sdpgs_tpu.ops.rasterize.rank_pallas import (
    compute_compact_entries_pallas,
    compute_ranks_pallas,
)

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
    print(f"{name:44s} {dt*1000:7.2f} ms", flush=True)
    return dt


def _overhead_kernel(packed_ref, tid_ref, gin_ref, out_ref, *, nc):
    out_ref[0, :] = packed_ref[0, :] + gin_ref[0, :] + tid_ref[0, :, 0]


def make_overhead_call(P, D, nb, Pb):
    return pl.pallas_call(
        functools.partial(_overhead_kernel, nc=1),
        grid=(nb, 1),
        in_specs=[
            pl.BlockSpec((1, Pb), lambda b, c: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Pb, D), lambda b, c: (0, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Pb), lambda b, c: (0, b), memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, Pb), lambda b, c: (0, b), memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((1, P), jnp.int32)],
        interpret=jax.default_backend() != "tpu",
    )


def main():
    rng = np.random.default_rng(0)
    pts = (rng.normal(size=(ALIVE, 3)) * [1.2, 0.9, 0.6] + [0, 0, 4.0]).astype(np.float32)
    cols = rng.uniform(size=(ALIVE, 3)).astype(np.float32)
    g = create_from_points(pts, cols, CAPACITY, init_scale=np.full(ALIVE, 1e-4))
    cam = Camera.create(R=np.eye(3), T=np.zeros(3), fovx=0.9, fovy=0.7,
                        width=WIDTH, height=HEIGHT)
    cfg = RasterizeConfig(chunk=64)

    tiles_x, tiles_y = binning_lib.tile_grid(WIDTH, HEIGHT, cfg.tile)
    num_tiles = tiles_x * tiles_y
    P = CAPACITY
    K = cfg.max_per_tile
    D = cfg.max_tiles_per_gaussian

    prep = preprocess_fused(g.xyz, g.get_scaling(), g.get_rotation(), cam,
                            g.alive, near=cfg.near, low_pass=cfg.low_pass)
    xmin0, xmax0, ymin0, ymax0 = binning_lib.tile_rect(
        prep.mean2d, prep.radius, tiles_x, tiles_y, cfg.tile)
    count0 = (xmax0 - xmin0) * (ymax0 - ymin0)
    valid0 = prep.valid & (count0 > 0)
    xmax0w = jnp.where(valid0, xmax0, xmin0)
    ymax0w = jnp.where(valid0, ymax0, ymin0)
    packed = xmin0 | (xmax0w << 7) | (ymin0 << 14) | (ymax0w << 21)
    depth_key = jnp.where(valid0, prep.depth, jnp.inf)
    gids = jnp.arange(P, dtype=jnp.int32)
    _, packed_s, order = jax.lax.sort((depth_key, packed, gids), num_keys=1,
                                      is_stable=True)
    xmin = packed_s & 0x7F
    xmax = (packed_s >> 7) & 0x7F
    ymin = (packed_s >> 14) & 0x7F
    ymax = (packed_s >> 21) & 0x7F
    rect_w = xmax - xmin
    count = rect_w * (ymax - ymin)
    valid_s = count > 0
    d = jnp.arange(D, dtype=jnp.int32)[None, :]
    rw = jnp.maximum(rect_w, 1)[:, None]
    tile_x = xmin[:, None] + d % rw
    tile_y = ymin[:, None] + d // rw
    entry_valid = valid_s[:, None] & (d < count[:, None])
    tid = jnp.where(entry_valid, tile_y * tiles_x + tile_x, jnp.int32(-1))

    packed_s = jax.block_until_ready(packed_s)
    tid = jax.block_until_ready(tid)
    order = jax.block_until_ready(order)

    def compact(eps):
        slot, gid_c, counts_k, dropped = compute_compact_entries_pallas(
            packed_s + (eps.astype(jnp.int32) * 0), tid, order, num_tiles,
            tiles_x, K, S=cfg.rank_block_slots, t0=None, grouped=True)
        return counts_k[0].astype(jnp.float32) + slot[0].astype(jnp.float32)

    def compact_flat(eps):
        slot, gid_c, counts_k, dropped = compute_compact_entries_pallas(
            packed_s + (eps.astype(jnp.int32) * 0), tid, order, num_tiles,
            tiles_x, K, S=cfg.rank_block_slots, t0=None, grouped=False)
        return counts_k[0].astype(jnp.float32) + slot[0].astype(jnp.float32)

    def rank_only(eps):
        rank, counts_k = compute_ranks_pallas(
            packed_s + (eps.astype(jnp.int32) * 0), tid, num_tiles, tiles_x)
        return counts_k[0].astype(jnp.float32) + rank[0, 0].astype(jnp.float32)

    overhead_call = make_overhead_call(P, D, P // 256, 256)

    def overhead(eps):
        (out,) = overhead_call(
            packed_s + (eps.astype(jnp.int32) * 0), tid, order)
        return out[0, 0].astype(jnp.float32)

    timed("A grouped-compact (shipped)", compact)
    timed("A2 flat-compact", compact_flat)
    timed("B rank-only kernel", rank_only)
    timed("C grid-overhead floor", overhead)


if __name__ == "__main__":
    main()
