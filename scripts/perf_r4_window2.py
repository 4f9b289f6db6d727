"""R4: production windowed two-phase backward (ops/rasterize/grad_window.py)
measured at the 1M wall — map build in [T, nw, K] layout + single-column
inversion + fused gid gather + interleaved windows. Companion to
perf_r4_window.py (the exploration lab; its [T, K, nw] map build measured
67.8 ms from lane-padding — nw on the minor dim).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_r4_window2.py
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
from sdpgs_tpu.ops.rasterize import grad_window
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
    print(f"{name:56s} {dt*1000:8.2f} ms", flush=True)
    return dt


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
    print(f"T={T} K={K} rows={T*K} live={live} fill={live/(T*K):.3f}",
          flush=True)
    idx_flat = jax.block_until_ready(idx.reshape(-1))
    payload = jax.block_until_ready(
        jnp.asarray(rng.uniform(0.1, 0.9, size=(P, 13)).astype(np.float32)))
    tiles_x, tiles_y = binning_lib.tile_grid(WIDTH, HEIGHT, cfg.tile)
    px, py = composite_xla.tile_pixel_coords(tiles_x, tiles_y, cfg.tile)

    from sdpgs_tpu.ops.rasterize.composite_pallas import composite_tiles_pallas

    geo = grad_window.window_geometry(P, T * K, cfg)
    print(f"gate geometry: {geo}", flush=True)
    nw, Ec = geo
    m = jax.jit(grad_window.build_window_map, static_argnums=(1, 2, 3))(
        idx, P, nw, Ec)
    m = jax.tree_util.tree_map(jax.block_until_ready, m)
    print(f"nw={nw} Ec={Ec} slab_rows={nw*Ec} overflow={int(m.overflow)}",
          flush=True)

    # correctness vs plain scatter
    ct_probe = jnp.asarray(rng.uniform(size=(T, K, 13)).astype(np.float32))

    def bwd_scatter(ct):
        z = jnp.zeros((P + 1, 13), jnp.float32)
        z = z.at[idx_flat].add(ct.reshape(T * K, 13))
        return z[:P]

    da = jax.jit(bwd_scatter)(ct_probe)
    db = jax.grad(
        lambda p: jnp.sum(
            grad_window.gather_payload_windowed(p, idx, m.src, m.gid_f,
                                                nw, Ec) * ct_probe)
    )(payload)
    err = float(jnp.max(jnp.abs(da - db)))
    print(f"windowed-vs-baseline backward max err: {err:.2e}", flush=True)

    def make_pair(use_window):
        def pair(eps):
            def loss(pl_):
                if use_window:
                    gth = grad_window.gather_payload_windowed(
                        pl_, idx, m.src, m.gid_f, nw, Ec)
                else:
                    gth = _pad_row(pl_)[idx]
                out = composite_tiles_pallas(
                    gth[..., 0:2], gth[..., 2:5], gth[..., 5], gth[..., 6:13],
                    px, py, cfg, counts=counts)
                return jnp.sum(out.values) + jnp.sum(out.final_t)
            d = jax.grad(loss)(payload + eps)
            return jnp.sum(d * d)
        return pair

    def probe_map(eps):
        mm = grad_window.build_window_map(
            idx + jnp.int32(eps * 0).reshape(()), P, nw, Ec)
        return (jnp.sum(mm.src) + mm.overflow).astype(jnp.float32)

    timed("pair A: autodiff scatter (baseline)", make_pair(False))
    timed("pair W: production windowed (incl. prebuilt map)", make_pair(True))
    timed("probe: production map build", probe_map)

    # full pair including the map build in-graph (what the real step pays)
    def pair_full(eps):
        mm = grad_window.build_window_map(
            idx + jnp.int32(eps * 0).reshape(()), P, nw, Ec)

        def loss(pl_):
            gth = grad_window.gather_payload_windowed(
                pl_, idx, mm.src, mm.gid_f, nw, Ec)
            out = composite_tiles_pallas(
                gth[..., 0:2], gth[..., 2:5], gth[..., 5], gth[..., 6:13],
                px, py, cfg, counts=counts)
            return jnp.sum(out.values) + jnp.sum(out.final_t)

        d = jax.grad(loss)(payload + eps)
        return jnp.sum(d * d) + jnp.sum(mm.src)

    timed("pair WF: windowed incl. in-graph map build", pair_full)


if __name__ == "__main__":
    main()
