"""R4: windowed two-phase payload-grad reduction at the 1M-Gaussian wall.

perf_r4_scatter.py established:
  - scatter-add is LINEAR in rows at ~84 ms/M with a [1M,13] destination,
    but ~7-17 ms/M with a [131k,13] destination -> destination locality is
    a ~10x lever;
  - gathers run ~11.3 ms/M rows (5-8x cheaper than scatters);
  - a permutation scatter-SET of 1M wide rows costs 87 ms (per-byte bound
    ~0.6 GB/s): ANY full-width random write at 1M destinations is the wall.

Scheme measured here (exact, f32, no sorted-space detour):
  phase 0 (parameter-independent, once per step alongside binning):
    - window of each table row: w = gid // Pw  (sentinel -> drop)
    - per (tile, window) counts + within-group ranks via one-hot cumsum
      along K (all VPU elementwise; NO gathers)
    - global per-window offsets (tiny [T, nw] cumsums)
    - dst[t*K+k] = w*Ec + off[t,w] + rank_within  (static per-window slab
      capacity Ec, overflow counted)
    - one int32 scatter-SET inverts dst -> src row map + local dest index
  phase 1 (the actual backward, parameter-dependent):
    - rows = ct_flat[src]                 (one live-sized gather)
    - per window: zeros[Pw+1,13].at[lidx].add(rows_slab)  (small dest!)
    - concat windows -> [P,13] in ORIGINAL order (windows partition gids)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_r4_window.py
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


def build_window_map(idx_flat, P, nw, Ec, T, K):
    """Parameter-independent map: src row per compact slot + local dest.

    All [T,K]-shaped elementwise / cumsum work plus ONE int32 scatter-set;
    no large gathers. Returns (src [nw*Ec] int32 into [T*K+1] padded rows,
    lidx [nw*Ec] int32 into [Pw+1] with Pw-sentinel, overflow count)."""
    Pw = P // nw
    idx2 = idx_flat.reshape(T, K)
    live = idx2 < P
    w_rk = jnp.where(live, idx2 // Pw, nw)                   # [T, K]
    # one-hot over windows; cumsum along K gives within-(tile,window) rank
    oh = (w_rk[:, :, None] == jnp.arange(nw, dtype=jnp.int32)[None, None, :])
    ohf = oh.astype(jnp.float32)                             # [T, K, nw]
    incl = jnp.cumsum(ohf, axis=1)                           # inclusive
    rank_in_tile = jnp.sum((incl - ohf) * ohf, axis=2)       # [T, K] f32 excl
    cnt_tw = incl[:, -1, :]                                  # [T, nw] f32
    # exclusive cumsum over tiles per window -> slab offset of tile t
    off_tw = jnp.cumsum(cnt_tw, axis=0) - cnt_tw             # [T, nw]
    off_rk = jnp.sum(off_tw[:, None, :] * ohf, axis=2)       # [T, K]
    pos = (off_rk + rank_in_tile).astype(jnp.int32)          # slab-local
    overflow = jnp.sum(jnp.where(live, (pos >= Ec).astype(jnp.int32), 0))
    dst = jnp.where(live & (pos < Ec), w_rk * Ec + pos, nw * Ec)
    lidx_val = jnp.where(live, idx2 - w_rk * Pw, Pw).astype(jnp.int32)
    rowid = jnp.arange(T * K, dtype=jnp.int32).reshape(T, K)
    # invert: compact slot -> source row (+ its local dest index)
    packed = jnp.stack([rowid, lidx_val], axis=-1).reshape(T * K, 2)
    inv = jnp.full((nw * Ec + 1, 2), jnp.int32(-1))
    inv = inv.at[dst.reshape(-1)].set(packed, mode="drop")
    src = jnp.where(inv[: nw * Ec, 0] >= 0, inv[: nw * Ec, 0], T * K)
    lidx = jnp.where(inv[: nw * Ec, 1] >= 0, inv[: nw * Ec, 1],
                     jnp.int32(Pw))
    return src, lidx, overflow


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

    # ---- map variants -----------------------------------------------------
    configs = [(8, 1 << 17), (16, 1 << 16), (4, 1 << 18)]
    maps = {}
    for nw, Ec in configs:
        src, lidx, ovf = jax.jit(
            build_window_map, static_argnums=(1, 2, 3, 4, 5)
        )(idx_flat, P, nw, Ec, T, K)
        src = jax.block_until_ready(src)
        lidx = jax.block_until_ready(lidx)
        print(f"nw={nw} Ec={Ec}: slab rows={nw*Ec} overflow={int(ovf)}",
              flush=True)
        maps[(nw, Ec)] = (src, lidx)

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
            return jnp.sum(d * d)
        return pair

    def bwd_scatter(ct):
        z = jnp.zeros((P + 1, 13), jnp.float32)
        z = z.at[idx_flat].add(ct.reshape(T * K, 13))
        return z[:P]

    def make_bwd_windowed(nw, Ec, dtype=jnp.float32, mode="loop"):
        src, lidx = maps[(nw, Ec)]
        Pw = P // nw

        def bwd(ct):
            rows = jnp.pad(
                ct.reshape(T * K, 13).astype(dtype), ((0, 1), (0, 0))
            )[src]                                        # [nw*Ec, 13]
            rows = rows.reshape(nw, Ec, 13)
            li = lidx.reshape(nw, Ec)

            def one(w_rows, w_li):
                z = jnp.zeros((Pw + 1, 13), dtype)
                return z.at[w_li].add(w_rows)[:Pw]

            if mode == "vmap":
                parts = jax.vmap(one)(rows, li)           # [nw, Pw, 13]
            else:
                parts = jnp.stack([one(rows[w], li[w]) for w in range(nw)])
            return parts.reshape(P, 13).astype(jnp.float32)
        return bwd

    # correctness vs baseline
    ct_probe = jnp.asarray(rng.uniform(size=(T, K, 13)).astype(np.float32))
    da = jax.jit(bwd_scatter)(ct_probe)
    for nw, Ec in configs:
        db = jax.jit(make_bwd_windowed(nw, Ec))(ct_probe)
        err = float(jnp.max(jnp.abs(da - db)))
        print(f"windowed nw={nw} vs baseline max err: {err:.2e}", flush=True)

    timed("pair A: scatter all rows (baseline)", make_pair(bwd_scatter))
    for nw, Ec in configs:
        timed(f"pair W: windowed loop nw={nw} Ec={Ec}",
              make_pair(make_bwd_windowed(nw, Ec)))
    timed("pair Wv: windowed vmap nw=8",
          make_pair(make_bwd_windowed(8, 1 << 17, mode="vmap")))
    timed("pair Wb: windowed loop nw=8 bf16",
          make_pair(make_bwd_windowed(8, 1 << 17, jnp.bfloat16)))

    # ---- isolated probes --------------------------------------------------
    src8, lidx8 = maps[(8, 1 << 17)]
    gvals = jax.block_until_ready(
        jnp.asarray(rng.uniform(size=(T * K + 1, 13)).astype(np.float32)))

    def probe_gather(eps):
        rows = (gvals + eps)[src8]
        return jnp.sum(rows * rows)

    def probe_scatters(eps):
        rows = (gvals[: (8 * (1 << 17))] + eps).reshape(8, 1 << 17, 13)
        li = lidx8.reshape(8, 1 << 17)

        def one(w_rows, w_li):
            z = jnp.zeros(((P // 8) + 1, 13), jnp.float32)
            return z.at[w_li].add(w_rows)[: P // 8]

        return jnp.sum(jax.vmap(one)(rows, li) ** 2)

    def probe_map(eps):
        src, lidx, ovf = build_window_map(
            idx_flat + jnp.int32(eps * 0), P, 8, 1 << 17, T, K)
        return (jnp.sum(src) + jnp.sum(lidx) + ovf).astype(jnp.float32)

    timed("probe: slab gather 1.05M rows", probe_gather)
    timed("probe: 8 window scatters (vmapped)", probe_scatters)
    timed("probe: window map build", probe_map)


if __name__ == "__main__":
    main()
