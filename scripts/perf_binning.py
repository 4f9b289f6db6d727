"""Binning-internals timing: sort / rank kernel / scatter split, plus the
payload gather and composite, each in ONE jit via chained fori_loop.
Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_binning.py"""

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
    print(f"{name:38s} {dt*1000:7.2f} ms", flush=True)
    return dt


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
    prep = jax.tree_util.tree_map(jax.block_until_ready, prep)

    xmin0, xmax0, ymin0, ymax0 = binning_lib.tile_rect(
        prep.mean2d, prep.radius, tiles_x, tiles_y, cfg.tile)
    count0 = (xmax0 - xmin0) * (ymax0 - ymin0)
    valid0 = prep.valid & (count0 > 0)
    xmax0w = jnp.where(valid0, xmax0, xmin0)
    ymax0w = jnp.where(valid0, ymax0, ymin0)
    packed = xmin0 | (xmax0w << 7) | (ymin0 << 14) | (ymax0w << 21)
    depth_key = jnp.where(valid0, prep.depth, jnp.inf)
    gids = jnp.arange(P, dtype=jnp.int32)

    def sort_only(eps):
        dk, pk, od = jax.lax.sort((depth_key + eps, packed, gids),
                                  num_keys=1, is_stable=True)
        return jnp.sum(pk).astype(jnp.float32) + dk[0]

    def sort2_only(eps):
        dk, pk = jax.lax.sort((depth_key + eps, packed), num_keys=1,
                              is_stable=True)
        return jnp.sum(pk).astype(jnp.float32) + dk[0]

    def argsort_only(eps):
        od = jnp.argsort(depth_key + eps)
        return jnp.sum(od).astype(jnp.float32)

    # rank kernel (grouped compaction) on pre-sorted data
    dk, packed_s, order = jax.lax.sort((depth_key, packed, gids), num_keys=1,
                                       is_stable=True)
    packed_s = jax.block_until_ready(packed_s)
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

    from sdpgs_tpu.ops.rasterize.rank_pallas import compute_compact_entries_pallas

    def rank_kernel_only(eps):
        slot, gid_c, counts_k, dropped = compute_compact_entries_pallas(
            packed_s + (eps.astype(jnp.int32) * 0), tid, order, num_tiles,
            tiles_x, K, S=cfg.rank_block_slots, t0=None,
            grouped=cfg.rank_block_grouped)
        return jnp.sum(counts_k).astype(jnp.float32) + slot[0].astype(jnp.float32)

    slot, gid_c, counts_k, dropped = compute_compact_entries_pallas(
        packed_s, tid, order, num_tiles, tiles_x, K,
        S=cfg.rank_block_slots, t0=None, grouped=cfg.rank_block_grouped)
    slot = jax.block_until_ready(jnp.where(slot >= 0, slot, jnp.int32(num_tiles * K)))
    gid_c = jax.block_until_ready(gid_c)

    def scatter_only(eps):
        table = jnp.full((num_tiles * K,), P, dtype=jnp.int32)
        table = table.at[slot + eps.astype(jnp.int32) * 0].set(gid_c, mode="drop")
        return jnp.sum(table[:8]).astype(jnp.float32)

    def full_binning(eps):
        p2 = preprocess_fused(g.xyz + eps, g.get_scaling(), g.get_rotation(),
                              cam, g.alive, near=cfg.near, low_pass=cfg.low_pass)
        b = binning_lib.bin_gaussians(p2, WIDTH, HEIGHT, cfg)
        return jnp.sum(b.tile_counts).astype(jnp.float32)

    # payload gather on a fixed table
    bins = binning_lib.bin_gaussians(prep, WIDTH, HEIGHT, cfg)
    idx = jax.block_until_ready(bins.tile_index)
    payload = jnp.concatenate(
        [prep.mean2d, prep.conic, (g.get_opacity()[:, 0] * prep.valid)[:, None],
         cols if False else jnp.zeros((P, 3)), prep.depth[:, None],
         jnp.zeros((P, 3))], axis=-1)
    payload = jax.block_until_ready(payload)

    def gather_only(eps):
        pad = jnp.pad(payload + eps, [(0, 1), (0, 0)])
        gth = pad[idx]
        return jnp.sum(gth[:, :, 0])

    timed("sort (3 operands)", sort_only)
    timed("sort (2 operands)", sort2_only)
    timed("argsort", argsort_only)
    timed("rank kernel (grouped compact)", rank_kernel_only)
    timed("table scatter", scatter_only)
    timed("payload gather [T,K,13]", gather_only)
    timed("preprocess+binning (ref)", full_binning)


if __name__ == "__main__":
    main()
