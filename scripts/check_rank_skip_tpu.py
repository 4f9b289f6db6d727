"""On-chip validation of the dead-block-skip + bf16 rank kernel: the kernel
binning table must be bit-identical to the lax.scan golden path at bench
load, and the rank-kernel time should drop vs the 5.4ms baseline.
Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/check_rank_skip_tpu.py"""

from __future__ import annotations

import dataclasses
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


def main():
    rng = np.random.default_rng(0)
    pts = (rng.normal(size=(ALIVE, 3)) * [1.2, 0.9, 0.6] + [0, 0, 4.0]).astype(np.float32)
    cols = rng.uniform(size=(ALIVE, 3)).astype(np.float32)
    g = create_from_points(pts, cols, CAPACITY, init_scale=np.full(ALIVE, 1e-4))
    cam = Camera.create(R=np.eye(3), T=np.zeros(3), fovx=0.9, fovy=0.7,
                        width=WIDTH, height=HEIGHT)
    cfg = RasterizeConfig(chunk=64)
    cfg_scan = dataclasses.replace(cfg, use_rank_kernel=False)
    cfg_rank = dataclasses.replace(cfg, rank_block_slots=0)  # non-compact kernel

    prep = preprocess_fused(g.xyz, g.get_scaling(), g.get_rotation(), cam,
                            g.alive, near=cfg.near, low_pass=cfg.low_pass)

    b_kernel = jax.jit(lambda p: binning_lib.bin_gaussians(p, WIDTH, HEIGHT, cfg))(prep)
    b_rank = jax.jit(lambda p: binning_lib.bin_gaussians(p, WIDTH, HEIGHT, cfg_rank))(prep)
    b_scan = jax.jit(lambda p: binning_lib.bin_gaussians(p, WIDTH, HEIGHT, cfg_scan))(prep)

    for name, b in (("compact-kernel", b_kernel), ("rank-kernel", b_rank)):
        t_ok = np.array_equal(np.asarray(b.tile_index), np.asarray(b_scan.tile_index))
        c_ok = np.array_equal(np.asarray(b.tile_counts), np.asarray(b_scan.tile_counts))
        o_ok = int(b.overflow) == int(b_scan.overflow)
        print(f"{name}: table={t_ok} counts={c_ok} overflow={o_ok} "
              f"(ovf={int(b.overflow)} clip={int(b.clipped)} "
              f"entries={int(b.num_entries)})", flush=True)
        assert t_ok and c_ok and o_ok, name

    # timing
    def timed(name, cfgx):
        def body(eps):
            p2 = preprocess_fused(g.xyz + eps, g.get_scaling(), g.get_rotation(),
                                  cam, g.alive, near=cfg.near, low_pass=cfg.low_pass)
            b = binning_lib.bin_gaussians(p2, WIDTH, HEIGHT, cfgx)
            return jnp.sum(b.tile_counts).astype(jnp.float32)

        def loop(eps):
            return jax.lax.fori_loop(0, N, lambda i, e: body(e) * 0.0 + e, eps)

        fn = jax.jit(loop)
        out = fn(jnp.float32(0.0))
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = fn(out)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / N
        print(f"{name:38s} {dt*1000:7.2f} ms", flush=True)

    timed("preprocess+binning compact (new)", cfg)
    timed("preprocess+binning rank-only (new)", cfg_rank)


if __name__ == "__main__":
    main()
