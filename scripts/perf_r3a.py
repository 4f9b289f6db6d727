"""Round-3 perf lab A: binning sub-split + phase-split DPT stem.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_r3a.py
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

WIDTH, HEIGHT = 504, 378
CAPACITY = 1 << 17
ALIVE = 60_000
N = 20


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
    print(f"{name:46s} {dt*1000:7.2f} ms", flush=True)
    return dt


def binning_split():
    rng = np.random.default_rng(0)
    pts = (rng.normal(size=(ALIVE, 3)) * [1.2, 0.9, 0.6] + [0, 0, 4.0]).astype(np.float32)
    cols = rng.uniform(size=(ALIVE, 3)).astype(np.float32)
    g = create_from_points(pts, cols, CAPACITY, init_scale=np.full(ALIVE, 1e-4))
    cam = Camera.create(R=np.eye(3), T=np.zeros(3), fovx=0.9, fovy=0.7,
                        width=WIDTH, height=HEIGHT)
    cfg = RasterizeConfig(chunk=64)
    P = CAPACITY
    K = cfg.max_per_tile
    tiles_x, tiles_y = binning_lib.tile_grid(WIDTH, HEIGHT, cfg.tile)
    num_tiles = tiles_x * tiles_y

    prep = preprocess_fused(g.xyz, g.get_scaling(), g.get_rotation(), cam,
                            g.alive, near=cfg.near, low_pass=cfg.low_pass)

    # reproduce bin_gaussians' pre-kernel stages once, on-device
    xmin0, xmax0, ymin0, ymax0 = binning_lib.tile_rect(
        prep.mean2d, prep.radius, tiles_x, tiles_y, cfg.tile)
    count0 = (xmax0 - xmin0) * (ymax0 - ymin0)
    valid0 = prep.valid & (count0 > 0)
    xmax0 = jnp.where(valid0, xmax0, xmin0)
    ymax0 = jnp.where(valid0, ymax0, ymin0)
    packed0 = binning_lib.pack_rect(xmin0, xmax0, ymin0, ymax0)
    depth_key = jnp.where(valid0, prep.depth, jnp.inf)
    n_valid = jnp.sum(valid0.astype(jnp.int32))
    gids = jnp.arange(P, dtype=jnp.int32)
    _, packed_s, order = jax.lax.sort((depth_key, packed0, gids), num_keys=1,
                                      is_stable=True)
    xmin, xmax, ymin, ymax = binning_lib.unpack_rect(packed_s)
    rect_w = xmax - xmin
    count = rect_w * (ymax - ymin)
    valid_s = count > 0
    d = jnp.arange(cfg.max_tiles_per_gaussian, dtype=jnp.int32)[None, :]
    rw = jnp.maximum(rect_w, 1)[:, None]
    tile_x = xmin[:, None] + d % rw
    tile_y = ymin[:, None] + d // rw
    entry_valid = valid_s[:, None] & (d < count[:, None])
    tid = jnp.where(entry_valid, tile_y * tiles_x + tile_x, jnp.int32(-1))

    packed_s, tid, order, n_valid = jax.block_until_ready(
        (packed_s, tid, order, n_valid))

    from sdpgs_tpu.ops.rasterize.rank_pallas import compute_compact_entries_pallas

    def rank_kernel_only(eps):
        slot, gid_c, counts_k, dropped = compute_compact_entries_pallas(
            packed_s, tid, order, num_tiles, tiles_x, K,
            S=cfg.rank_block_slots, t0=None, grouped=cfg.rank_block_grouped,
            n_valid=n_valid + eps.astype(jnp.int32) * 0)
        return (jnp.sum(slot) + jnp.sum(gid_c) + jnp.sum(counts_k)).astype(jnp.float32)

    slot, gid_c, counts_k, dropped = jax.block_until_ready(
        compute_compact_entries_pallas(
            packed_s, tid, order, num_tiles, tiles_x, K,
            S=cfg.rank_block_slots, t0=None, grouped=cfg.rank_block_grouped,
            n_valid=n_valid))
    print(f"compact rows={slot.shape} live_slots={int(jnp.sum(slot >= 0))} "
          f"dropped={int(dropped)}", flush=True)

    def table_scatter_only(eps):
        s = jnp.where(slot >= 0, slot, jnp.int32(num_tiles * K)) + eps.astype(jnp.int32) * 0
        table = jnp.full((num_tiles * K,), P, dtype=jnp.int32)
        table = table.at[s].set(gid_c, mode="drop")
        return jnp.sum(table).astype(jnp.float32)

    def rect_pack_sort_enum(eps):
        xmin0, xmax0, ymin0, ymax0 = binning_lib.tile_rect(
            prep.mean2d + eps, prep.radius, tiles_x, tiles_y, cfg.tile)
        count0 = (xmax0 - xmin0) * (ymax0 - ymin0)
        valid0 = prep.valid & (count0 > 0)
        packed0 = binning_lib.pack_rect(
            xmin0, jnp.where(valid0, xmax0, xmin0), ymin0,
            jnp.where(valid0, ymax0, ymin0))
        depth_key = jnp.where(valid0, prep.depth, jnp.inf)
        k, p2, o = jax.lax.sort((depth_key, packed0, gids), num_keys=1,
                                is_stable=True)
        xmin, xmax, ymin, ymax = binning_lib.unpack_rect(p2)
        rect_w = xmax - xmin
        count = rect_w * (ymax - ymin)
        dd = jnp.arange(cfg.max_tiles_per_gaussian, dtype=jnp.int32)[None, :]
        rw = jnp.maximum(rect_w, 1)[:, None]
        tid2 = jnp.where((count > 0)[:, None] & (dd < count[:, None]),
                         (ymin[:, None] + dd // rw) * tiles_x + xmin[:, None] + dd % rw,
                         jnp.int32(-1))
        return (jnp.sum(tid2) + jnp.sum(o)).astype(jnp.float32)

    timed("rect+pack+sort+enum (pre-kernel)", rect_pack_sort_enum)
    timed("rank kernel only (grouped S=512)", rank_kernel_only)
    timed("table scatter only (262k rows)", table_scatter_only)


def stem_compare():
    import functools

    from sdpgs_tpu.models.bit import _gn, _maxpool_same, _ws_conv, stem_phase_conv
    from sdpgs_tpu.models.dpt import DPTArch, random_params
    from sdpgs_tpu.models.depth_estimator import mono_depth_from_params
    from sdpgs_tpu.ops.resize import resize2d, resize2d_stem_phases

    rng = np.random.default_rng(0)
    arch = DPTArch.hybrid()
    raw = random_params(arch, seed=0)
    img = jnp.asarray(rng.uniform(size=(3, HEIGHT, WIDTH)).astype(np.float32))
    img = jax.block_until_ready(img)

    w = jnp.asarray(raw["dpt.embeddings.backbone.bit.embedder.convolution.weight"])
    p = {"bit.embedder.convolution.weight": w.astype(jnp.bfloat16)}

    def old_stem(eps):
        x = (resize2d(img[None] + eps, 384, 512, "bicubic", False) - 0.5) / 0.5
        x = x.astype(jnp.bfloat16)
        with jax.default_matmul_precision("default"):
            y = _ws_conv(p, "bit.embedder.convolution", x, 7, 2)
        return jnp.sum(y).astype(jnp.float32)

    def old_stem_fg(eps):
        def old_stem_body(im):
            x = (resize2d(im[None], 384, 512, "bicubic", False) - 0.5) / 0.5
            x = x.astype(jnp.bfloat16)
            with jax.default_matmul_precision("default"):
                y = _ws_conv(p, "bit.embedder.convolution", x, 7, 2)
            return jnp.sum(y).astype(jnp.float32)
        return jnp.sum(jax.grad(old_stem_body)(img + eps))

    def new_stem(eps):
        norm = (img[None] + eps - 0.5) / 0.5
        ph = resize2d_stem_phases(norm, 384, 512, "bicubic", False)
        ph = ph.astype(jnp.bfloat16)
        with jax.default_matmul_precision("default"):
            y = stem_phase_conv(p, ph, prefix="bit")
        return jnp.sum(y).astype(jnp.float32)

    def new_stem_fg(eps):
        def body(im):
            norm = (im[None] - 0.5) / 0.5
            ph = resize2d_stem_phases(norm, 384, 512, "bicubic", False)
            ph = ph.astype(jnp.bfloat16)
            with jax.default_matmul_precision("default"):
                y = stem_phase_conv(p, ph, prefix="bit")
            return jnp.sum(y).astype(jnp.float32)
        return jnp.sum(jax.grad(body)(img + eps))

    def maxpool_fg(eps):
        x0 = jnp.asarray(np.random.default_rng(1).normal(
            size=(1, 64, 192, 256)).astype(np.float32))
        def body(x):
            return jnp.sum(_maxpool_same(x))
        return jnp.sum(jax.grad(body)(x0 + eps))

    timed("OLD stem conv fwd (resize+7x7/2)", old_stem)
    timed("NEW stem conv fwd (phase-split)", new_stem)
    timed("OLD stem conv f/g", old_stem_fg)
    timed("NEW stem conv f/g", new_stem_fg)
    timed("maxpool 3x3/2 f/g @192x256x64", maxpool_fg)

    # full depth-net fwd + input-grad, old vs new path (bf16 params)
    mono_bilin = mono_depth_from_params(raw, arch=arch, dtype=jnp.bfloat16,
                                        resize_method="bilinear")
    mono_old = mono_depth_from_params(raw, arch=arch, dtype=jnp.bfloat16,
                                      phase_stem=False)
    mono_new = mono_depth_from_params(raw, arch=arch, dtype=jnp.bfloat16,
                                      phase_stem=True)
    jax.block_until_ready(mono_old.params)

    def dpt_fg(mono):
        def body(eps):
            def f(im):
                return jnp.sum(mono.apply(mono.params, im) ** 2) * 1e-6
            return jnp.sum(jax.grad(f)(img + eps))
        return body

    timed("DPT-Hybrid f/g r2 (bilinear resize)", dpt_fg(mono_bilin), n=10)
    timed("DPT-Hybrid f/g bicubic, no phase", dpt_fg(mono_old), n=10)
    timed("DPT-Hybrid f/g bicubic + phase stem", dpt_fg(mono_new), n=10)


if __name__ == "__main__":
    import sys

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "binning"):
        binning_split()
    if which in ("all", "stem"):
        stem_compare()
