"""Tile binning: build a dense per-tile, depth-ordered index table.

Replaces the reference's sort-centric pipeline (rasterizer_impl.cu:198-336:
tiles_touched prefix scan -> duplicateWithKeys -> 64-bit radix sort ->
identifyTileRanges) with a **sort-free, gather-free** TPU formulation.
Global sorts of duplicated entries and row-gathers are hostile to TPU
(measured on v5e: 4M-entry sort+searchsorted+scatter ~0.85s; 1M-element
take_along_axis ~17ms); every step here is elementwise / cumsum / one-hot
reduction / one bounded scatter:

1. Gaussians are argsorted by view depth ONCE ([P], the only sort).
2. Per chunk of tiles, membership ``mask[p, t]`` comes from 4 comparisons
   against the Gaussian's tile rect; an inclusive ``cumsum`` over the
   depth-sorted axis yields within-tile ranks.
3. Each Gaussian enumerates up to D tile entries from its rect
   (row-major, like duplicateWithKeys, auxiliary.h:46-58); the entry's rank
   is read out of the chunk cumsum with a one-hot *dot* over the chunk's
   tiles — a bandwidth-bound reduction instead of a gather.
4. One scatter writes every kept entry to slot ``tile*K + rank`` of the
   dense table ([num_tiles, K], sentinel = P -> dead padding row).

The table indexes the original Gaussian arrays and is integer ->
non-differentiable, exactly like the reference's point list; gradients flow
through the gathered payload (XLA transposes that gather into a
deterministic scatter-add, replacing the CUDA backward's atomicAdd,
backward.cu:523-554).

Capacity semantics: per-tile K overflow and per-Gaussian D clipping are
counted and reported, never silent.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from sdpgs_tpu.config import RasterizeConfig
from sdpgs_tpu.ops.rasterize.preprocess import Preprocessed


class Binning(NamedTuple):
    tile_index: jnp.ndarray   # [num_tiles, K] int32 into [P+1]-padded payloads
    tile_counts: jnp.ndarray  # [num_tiles] int32 live entries per tile (<= K)
    overflow: jnp.ndarray     # scalar int32: entries dropped by the K cap
    clipped: jnp.ndarray     # scalar int32: tile slots dropped by the D cap
    num_entries: jnp.ndarray  # scalar int32: total (tile, gaussian) pairs
    # Inverse entry map for the gather-based payload backward (built only
    # when n_local*K >= cfg.grad_gather_min_rows — see rasterizer.py):
    entry_slot: jnp.ndarray | None = None  # [D, P] int32 flat local*K+rank
                                           # per depth-SORTED Gaussian;
                                           # sentinel n_local*K = not in table
    order: jnp.ndarray | None = None       # [P] original id per sorted row


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


def pack_rect(xmin, xmax, ymin, ymax):
    """Pack a tile rect into one i32: 8 bits per coord (grids up to 255
    tiles per axis — 8160 px at tile=32). ymax occupies bits 24-31 so large
    grids wrap into the sign bit; that is fine because the packed word rides
    through ``lax.sort`` as a *value* operand and :func:`unpack_rect` masks
    after shifting (sign-safe)."""
    return xmin | (xmax << 8) | (ymin << 16) | (ymax << 24)


def unpack_rect(packed):
    """Inverse of :func:`pack_rect`. ``(p >> k) & 0xFF`` is correct even for
    negative packed words: arithmetic shift sign-fills only bits above the
    mask."""
    return (
        packed & 0xFF,
        (packed >> 8) & 0xFF,
        (packed >> 16) & 0xFF,
        (packed >> 24) & 0xFF,
    )


def _tile_chunk(num_tiles: int, P: int) -> int:
    """Tiles per chunk, sized so the [P, Tc] mask stays ~<=64MB."""
    tc = max(8, (1 << 24) // max(P, 1))
    return min(num_tiles, tc)


def bin_gaussians(
    prep: Preprocessed,
    width: int,
    height: int,
    cfg: RasterizeConfig,
    tile_range: tuple[jnp.ndarray, int] | None = None,
) -> Binning:
    """``tile_range=(t0, n_local)`` restricts the table to the ``n_local``
    tiles starting at flat tile id ``t0`` (static count, traced offset) — the
    building block for tile-partitioned multi-chip rasterization (SURVEY §2.3
    item 3): each shard bins only the tiles it owns. Ranks are exact because a
    Gaussian's within-tile rank depends only on earlier depth-sorted Gaussians
    covering *that* tile, never on other tiles."""
    tiles_x, tiles_y = tile_grid(width, height, cfg.tile)
    num_tiles = tiles_x * tiles_y
    P = prep.depth.shape[0]
    K = cfg.max_per_tile
    D = cfg.max_tiles_per_gaussian

    # --- 1. depth-major order over Gaussians -------------------------------
    # Pack each Gaussian's tile rect into one i32 and carry it through the
    # sort as a value operand: multi-operand lax.sort is ~10x cheaper than
    # argsort followed by random gathers on TPU.
    assert tiles_x < 256 and tiles_y < 256, (
        "rect packing uses 8-bit tile coords (8160 px at tile=32); raise "
        "cfg.tile for this image size"
    )
    xmin0, xmax0, ymin0, ymax0 = tile_rect(
        prep.mean2d, prep.radius, tiles_x, tiles_y, cfg.tile
    )
    count0 = (xmax0 - xmin0) * (ymax0 - ymin0)
    valid0 = prep.valid & (count0 > 0)                           # forward.cu:236
    xmax0 = jnp.where(valid0, xmax0, xmin0)
    ymax0 = jnp.where(valid0, ymax0, ymin0)
    packed = pack_rect(xmin0, xmax0, ymin0, ymax0)

    depth_key = jnp.where(valid0, prep.depth, jnp.inf)
    # valid entries sort to the front (inf keys last): the rank kernels skip
    # blocks past ceil(n_valid/256) entirely (dead-block skip, exact).
    n_valid = jnp.sum(valid0.astype(jnp.int32))
    gids = jnp.arange(P, dtype=jnp.int32)
    _, packed_s, order = jax.lax.sort(
        (depth_key, packed, gids), num_keys=1, is_stable=True
    )
    xmin, xmax, ymin, ymax = unpack_rect(packed_s)
    rect_w = xmax - xmin
    count = rect_w * (ymax - ymin)
    valid_s = count > 0

    # --- 2. per-Gaussian entry enumeration (row-major over the rect) -------
    d = jnp.arange(D, dtype=jnp.int32)[None, :]
    rw = jnp.maximum(rect_w, 1)[:, None]
    tile_x = xmin[:, None] + d % rw
    tile_y = ymin[:, None] + d // rw
    entry_valid = valid_s[:, None] & (d < count[:, None])
    tid = jnp.where(entry_valid, tile_y * tiles_x + tile_x, jnp.int32(-1))

    clipped = jnp.sum(jnp.where(valid_s, jnp.maximum(count - D, 0), 0)).astype(jnp.int32)
    num_entries = jnp.sum(jnp.where(valid_s, jnp.minimum(count, D), 0)).astype(jnp.int32)

    t0 = jnp.int32(0) if tile_range is None else tile_range[0]
    n_local = num_tiles if tile_range is None else tile_range[1]

    # --- 3. within-tile rank ------------------------------------------------
    # Grid block: clamp to the capacity; the kernels' sub-block granularity
    # is 256, so capacities that are not multiples of 256 fall back to the
    # scan path (use_kernel False) instead of tripping kernel asserts.
    Pb = max(256, min(cfg.rank_block_gaussians, P))
    use_kernel = (
        cfg.use_rank_kernel
        and (jax.default_backend() == "tpu" or cfg.interpret_kernels)
        and P % 256 == 0
        and P % Pb == 0
        and Pb % 256 == 0
    )
    # Block compaction needs slot ids (local*K + rank) exact in f32 -> gate
    # on n_local * K < 2^24. Per-sub-block S capacity must cover the entry
    # load (more tiles per splat at smaller cfg.tile -> larger S); drops are
    # counted in overflow telemetry and the Trainer's ladder escalates S
    # (and eventually to 0 = uncompacted P*D scatter) when they appear.
    # Inverse entry map for the gather-based payload backward: only built
    # when the table is big enough that the scatter-add transpose would be
    # the bottleneck (measured super-linear: ~120 ms at 1.57M rows).
    want_slot = n_local * K >= cfg.grad_gather_min_rows

    if use_kernel and cfg.rank_block_slots > 0 and n_local * K < (1 << 24):
        if cfg.rank_kernel_lanes:
            from sdpgs_tpu.ops.rasterize.rank_pallas import (
                compute_compact_entries_lanes_pallas,
            )

            res = compute_compact_entries_lanes_pallas(
                packed_s, order, n_local, tiles_x, K, D,
                S=cfg.rank_block_slots,
                t0=None if tile_range is None else t0,
                grouped=cfg.rank_block_grouped,
                tail=cfg.rank_block_tail,
                n_valid=n_valid,
                Pb=Pb,
                # the [D, P] ranks feed only the (default-off) gather-based
                # payload backward; emitting them unconditionally VMEM-OOMs
                # the Mosaic compile once the ladder escalates D/S
                return_rank=want_slot,
            )
            slot, gid_c, counts_k, dropped = res[:4]
            rank_pd = res[4].T if want_slot else None
        else:
            from sdpgs_tpu.ops.rasterize.rank_pallas import (
                compute_compact_entries_pallas,
            )

            res = compute_compact_entries_pallas(
                packed_s, tid, order, n_local, tiles_x, K,
                S=cfg.rank_block_slots,
                t0=None if tile_range is None else t0,
                grouped=cfg.rank_block_grouped,
                tail=cfg.rank_block_tail,
                n_valid=n_valid,
                Pb=Pb,
                return_rank=want_slot,
            )
            slot, gid_c, counts_k, dropped = res[:4]
            rank_pd = res[4] if want_slot else None
        # block-slot drops are capacity losses like tile-K overflow: fold in
        overflow = (
            jnp.sum(jnp.maximum(counts_k - K, 0)).astype(jnp.int32) + dropped
        )
        tile_counts = jnp.minimum(counts_k, K)
        slot = jnp.where(slot >= 0, slot, jnp.int32(n_local * K))  # -> drop
        table = jnp.full((n_local * K,), P, dtype=jnp.int32)
        table = table.at[slot].set(gid_c, mode="drop")
        entry_slot = (
            _entry_slot_map(tid, rank_pd, entry_valid, K, n_local, t0)
            if want_slot else None
        )
        return Binning(
            tile_index=table.reshape(n_local, K),
            tile_counts=tile_counts,
            overflow=overflow,
            clipped=clipped,
            num_entries=num_entries,
            entry_slot=entry_slot,
            order=order if want_slot else None,
        )
    if use_kernel:
        from sdpgs_tpu.ops.rasterize.rank_pallas import compute_ranks_pallas

        rank, counts_k = compute_ranks_pallas(
            packed_s, tid, n_local, tiles_x, n_valid=n_valid,
            t0=None if tile_range is None else t0, Pb=Pb,
        )
        overflow = jnp.sum(jnp.maximum(counts_k - K, 0)).astype(jnp.int32)
        tile_counts = jnp.minimum(counts_k, K)
        return _scatter_table(
            tid, rank, order, P, D, K, n_local, t0, entry_valid,
            tile_counts, overflow, clipped, num_entries, want_slot,
        )

    Tc = _tile_chunk(n_local, P)
    pad_tiles = (-n_local) % Tc
    tiles = t0 + jnp.arange(n_local + pad_tiles, dtype=jnp.int32)
    ctx = (tiles % tiles_x).reshape(-1, Tc)
    cty = (tiles // tiles_x).reshape(-1, Tc)
    tstart = tiles.reshape(-1, Tc)[:, 0]

    def chunk_rank(carry, chunk):
        rank, overflow_c = carry
        ctx_c, cty_c, t0 = chunk                                  # [Tc], [Tc], []
        mask = (
            (ctx_c[None, :] >= xmin[:, None])
            & (ctx_c[None, :] < xmax[:, None])
            & (cty_c[None, :] >= ymin[:, None])
            & (cty_c[None, :] < ymax[:, None])
        )                                                         # [P, Tc]
        mf = mask.astype(jnp.float32)
        excl = jnp.cumsum(mf, axis=0) - mf                        # exclusive
        # Rank readout without gathers: batched one-hot dot over the chunk's
        # tiles. The [P, D, Tc] one-hot is f32 so ranks (< 2^24) are exact;
        # the contraction runs as a batched matvec at memory bandwidth.
        onehot = (
            tid[:, :, None] == (t0 + jnp.arange(Tc, dtype=jnp.int32))[None, None, :]
        ).astype(jnp.float32)
        contrib = jax.lax.dot_general(
            onehot, excl,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                                         # [P, D]
        rank = rank + contrib.astype(jnp.int32)
        counts = jnp.sum(mf, axis=0).astype(jnp.int32)            # [Tc]
        overflow_c = overflow_c + jnp.sum(jnp.maximum(counts - K, 0))
        return (rank, overflow_c), counts

    # Seed the carry from t0 so that under shard_map (tile_range set) it is
    # typed as varying over the shard axis, matching the body's output.
    init = (jnp.zeros((P, D), jnp.int32) + 0 * t0, 0 * t0)
    (rank, overflow), counts = jax.lax.scan(
        chunk_rank, init, (ctx, cty, tstart)
    )
    tile_counts = jnp.minimum(counts.reshape(-1)[:n_local], K)
    return _scatter_table(
        tid, rank, order, P, D, K, n_local, t0, entry_valid,
        tile_counts, overflow.astype(jnp.int32), clipped, num_entries, want_slot,
    )


def _entry_slot_map(tid, rank, entry_valid, K, n_local, t0):
    """[P, D] entry arrays -> [D, P] flat table-slot map (sentinel =
    n_local*K for entries not in the table). Entries dropped by the K cap or
    block-slot capacity keep their unique (tile, rank) slot, whose table row
    holds the dead sentinel — the composite emits exactly-zero gradients
    there, so gathering it is exact (see Binning.entry_slot)."""
    local = tid - t0
    keep = entry_valid & (rank < K) & (local >= 0) & (local < n_local)
    return jnp.where(keep, local * K + rank, jnp.int32(n_local * K)).T


def _scatter_table(tid, rank, order, P, D, K, n_local, t0, entry_valid,
                   tile_counts, overflow, clipped, num_entries,
                   want_slot=False) -> Binning:
    # --- 4. dense table via one bounded scatter -----------------------------
    local = tid - t0
    keep = entry_valid & (rank < K) & (local >= 0) & (local < n_local)
    slot = jnp.where(keep, local * K + rank, jnp.int32(n_local * K))  # OOB -> drop
    gid = jnp.broadcast_to(order[:, None], (P, D))
    table = jnp.full((n_local * K,), P, dtype=jnp.int32)
    table = table.at[slot.reshape(-1)].set(gid.reshape(-1), mode="drop")

    if want_slot:
        return Binning(
            tile_index=table.reshape(n_local, K),
            tile_counts=tile_counts,
            overflow=overflow,
            clipped=clipped,
            num_entries=num_entries,
            entry_slot=slot.T,
            order=order,
        )
    return Binning(
        tile_index=table.reshape(n_local, K),
        tile_counts=tile_counts,
        overflow=overflow,
        clipped=clipped,
        num_entries=num_entries,
    )
