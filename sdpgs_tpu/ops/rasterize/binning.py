"""Tile binning: depth-major sort of (tile, Gaussian) entries into a dense
per-tile index table with static capacity.

Replaces the reference's dynamic-shape pipeline (rasterizer_impl.cu:198-336):
InclusiveSum of tiles_touched -> duplicateWithKeys (tileID||depth 64-bit
keys) -> cub radix sort -> identifyTileRanges. TPU-first redesign:

1. Gaussians are argsorted by view depth ONCE (cheap, [P]).
2. Each Gaussian statically duplicates into at most D tile slots covering its
   screen rect (the reference's dynamic tiles_touched becomes a capacity with
   overflow telemetry).
3. A single *stable* sort by tile id over the [P*D] entries preserves depth
   order within each tile — equivalent to the reference's 64-bit
   (tile||depth) radix sort but with a 32-bit key.
4. Ranks within each tile come from a searchsorted against the sorted keys;
   entries scatter into a dense [num_tiles, K] table (sentinel = capacity
   index P, which points at a dead padding Gaussian).

The resulting table is integer -> non-differentiable, exactly like the
reference's point list; gradients flow through the gathered payload instead
(XLA transposes the gather into a deterministic scatter-add, replacing the
CUDA backward's atomicAdd at backward.cu:523-554).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from sdpgs_tpu.config import RasterizeConfig
from sdpgs_tpu.ops.rasterize.preprocess import Preprocessed


class Binning(NamedTuple):
    tile_index: jnp.ndarray   # [num_tiles, K] int32 into [P+1]-padded payloads
    overflow: jnp.ndarray     # scalar int32: valid entries dropped by K cap
    clipped: jnp.ndarray      # scalar int32: tile slots dropped by D cap
    num_entries: jnp.ndarray  # scalar int32: total valid (tile, gaussian) pairs


def tile_grid(width: int, height: int, tile: int) -> tuple[int, int]:
    return -(-width // tile), -(-height // tile)


def tile_rect(
    mean2d: jnp.ndarray, radius: jnp.ndarray, tiles_x: int, tiles_y: int, tile: int
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-Gaussian tile-rect (min inclusive, max exclusive), the reference's
    ``getRect`` (auxiliary.h:46-58). Returns (xmin, xmax, ymin, ymax) int32."""
    t = float(tile)
    xmin = jnp.clip(jnp.floor((mean2d[:, 0] - radius) / t), 0, tiles_x).astype(jnp.int32)
    ymin = jnp.clip(jnp.floor((mean2d[:, 1] - radius) / t), 0, tiles_y).astype(jnp.int32)
    xmax = jnp.clip(jnp.floor((mean2d[:, 0] + radius + t - 1) / t), 0, tiles_x).astype(jnp.int32)
    ymax = jnp.clip(jnp.floor((mean2d[:, 1] + radius + t - 1) / t), 0, tiles_y).astype(jnp.int32)
    return xmin, xmax, ymin, ymax


def bin_gaussians(
    prep: Preprocessed, width: int, height: int, cfg: RasterizeConfig
) -> Binning:
    tiles_x, tiles_y = tile_grid(width, height, cfg.tile)
    num_tiles = tiles_x * tiles_y
    P = prep.depth.shape[0]
    D, K = cfg.max_tiles_per_gaussian, cfg.max_per_tile

    # --- 1. depth-major order over Gaussians -------------------------------
    depth_key = jnp.where(prep.valid, prep.depth, jnp.inf)
    order = jnp.argsort(depth_key)                       # [P] ascending depth
    valid_s = prep.valid[order]
    mean_s = prep.mean2d[order]
    rad_s = prep.radius[order]

    # --- 2. static duplication over the tile rect (auxiliary.h getRect) ----
    rect_min_x, rect_max_x, rect_min_y, rect_max_y = tile_rect(
        mean_s, rad_s, tiles_x, tiles_y, cfg.tile
    )
    rect_w = rect_max_x - rect_min_x
    rect_h = rect_max_y - rect_min_y
    count = rect_w * rect_h                              # [P]
    valid_s = valid_s & (count > 0)                      # forward.cu:236

    d = jnp.arange(D, dtype=jnp.int32)[None, :]          # [1, D]
    # Row-major local offset d -> (dy, dx) within the rect.
    rw = jnp.maximum(rect_w, 1)[:, None]
    tile_x = rect_min_x[:, None] + d % rw
    tile_y = rect_min_y[:, None] + d // rw
    entry_valid = valid_s[:, None] & (d < count[:, None])
    key = jnp.where(
        entry_valid, tile_y * tiles_x + tile_x, jnp.int32(num_tiles)
    )                                                    # [P, D]

    clipped = jnp.sum(
        jnp.where(valid_s, jnp.maximum(count - D, 0), 0)
    ).astype(jnp.int32)
    num_entries = jnp.sum(jnp.where(valid_s, jnp.minimum(count, D), 0)).astype(jnp.int32)

    # --- 3. stable sort by tile id (preserves depth order within tile) -----
    flat_key = key.reshape(-1)                           # [P*D]
    gid = jnp.broadcast_to(order[:, None].astype(jnp.int32), (P, D)).reshape(-1)
    perm = jnp.argsort(flat_key, stable=True)
    sorted_key = flat_key[perm]
    sorted_gid = gid[perm]

    # --- 4. rank within tile + dense scatter --------------------------------
    n = sorted_key.shape[0]
    first_occ = jnp.searchsorted(sorted_key, sorted_key, side="left")
    rank = jnp.arange(n, dtype=jnp.int32) - first_occ.astype(jnp.int32)
    keep = (sorted_key < num_tiles) & (rank < K)
    overflow = jnp.sum((sorted_key < num_tiles) & (rank >= K)).astype(jnp.int32)

    slot = jnp.where(keep, sorted_key * K + rank, num_tiles * K)  # OOB -> drop
    tile_index = jnp.full((num_tiles * K,), P, dtype=jnp.int32)
    tile_index = tile_index.at[slot].set(sorted_gid, mode="drop")
    return Binning(
        tile_index=tile_index.reshape(num_tiles, K),
        overflow=overflow,
        clipped=clipped,
        num_entries=num_entries,
    )
