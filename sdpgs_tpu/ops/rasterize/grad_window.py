"""Windowed two-phase payload-gradient reduction for large scenes.

The backward of the table gather ``_pad_row(payload)[idx]`` is a scatter-add
of all ``T*K`` cotangent rows into ``[P, 13]`` — the CUDA reference does this
with bandwidth-rate atomicAdd (diff-gaussian-rasterization/cuda_rasterizer/
backward.cu:523-554). XLA's TPU scatter is LINEAR in rows but its per-row
cost depends sharply on the destination size (measured on v5e,
scripts/perf_r4_scatter.py): ~84 ms per 1M rows into a [1M, 13] table vs
~7-17 ms per 1M rows into a [131k, 13] table — random wide-row writes over a
52 MB destination run at ~0.6 GB/s. At the 1M-Gaussian scene this made the
payload-grad scatter a ~120-130 ms wall (the one place the r3 TPU
formulation lost structurally to CUDA).

This module restores destination locality without giving it back in gathers
(scripts/perf_r4_window.py: gather+composite+grad pair 172 -> 81.5 ms,
max |err| 4.8e-7 = f32 reassociation):

phase 0 — parameter-independent map, built once per step beside binning:
  * window of each table row: ``w = gid % nw`` — INTERLEAVED over original
    ids. Gaussian populations are prefix-dense (slot reuse in
    opt/densify.py), so contiguous ``gid // Pw`` windows would pile every
    row into the low windows of a part-full capacity and drop gradients at
    the slab cap; the modulo partition load-balances any clustered
    population, and the scatter destinations are the small per-window
    buffers either way. Reassembly is a [nw, Pw, C] -> [Pw, nw, C]
    transpose + reshape (pure bandwidth) instead of a concat — still no
    unsort;
  * within-(tile, window) ranks and per-(tile, window) counts via a one-hot
    cumsum along K in ``[T, nw, K]`` layout (K on lanes; the [T, K, nw]
    orientation puts nw=8 on the 128-lane minor dim and measured 16x
    slower);
  * tiny [T, nw] cumsums give each row a unique compact slot
    ``dst = w*Ec + off[t, w] + rank`` in a window-major slab layout
    (static per-window capacity ``Ec``, overflow counted — the standard
    capacity-telemetry contract of this package);
  * ONE single-column int32 scatter-set inverts the map (compact slot ->
    source row). The window-local destination index is NOT scattered: the
    backward recovers it from the gathered gid column (narrow scatters are
    per-row bound, so a second column would double the map cost).

phase 1 — the actual backward (parameter-dependent):
  * one live-sized row gather puts the cotangents in window-major order,
    with the table's gid as a fused extra f32 column (exact below 2^24;
    gathers measured 5-8x cheaper per row than scatters);
  * one scatter-add per window into a small ``[Pw+1, 13]`` destination — a
    static Python loop: the vmapped form lowers as one batched scatter and
    loses the locality win (145.5 vs 81.5 ms measured);
  * concatenating the windows IS the gradient in original order.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class WindowMap(NamedTuple):
    src: jnp.ndarray       # [nw*Ec] int32 source row into [T*K]-flat ct
                           # (sentinel T*K -> padded zero row)
    gid_f: jnp.ndarray     # [T*K] f32 copy of the flat gid table (sentinel
                           # P): fused into the backward's row gather to
                           # recover window-local destinations
    overflow: jnp.ndarray  # scalar int32 rows dropped by the Ec slab cap


def build_window_map(idx: jnp.ndarray, P: int, nw: int, Ec: int) -> WindowMap:
    """Invert the binning table into a window-major compact row layout.

    ``idx``: [T, K] int32 table of original Gaussian ids (sentinel P).
    All work is [T, nw, K]-shaped elementwise / cumsum plus one int32
    scatter-set; no large gathers (take_along_axis measured ~17 ms per 1M
    elements on v5e — the one-hot dot form is ~100x cheaper here)."""
    T, K = idx.shape
    live = idx < P
    w_rk = jnp.where(live, idx % nw, nw)                     # [T, K]
    # [T, nw, K]: K stays on lanes; ranks/counts ride in f32 (exact < 2^24)
    oh = w_rk[:, None, :] == jnp.arange(nw, dtype=jnp.int32)[None, :, None]
    ohf = oh.astype(jnp.float32)                             # [T, nw, K]
    incl = jnp.cumsum(ohf, axis=2)
    rank_in_tile = jnp.sum((incl - ohf) * ohf, axis=1)       # [T, K] exclusive
    cnt_tw = incl[:, :, -1]                                  # [T, nw]
    off_tw = jnp.cumsum(cnt_tw, axis=0) - cnt_tw             # excl over tiles
    off_rk = jnp.sum(off_tw[:, :, None] * ohf, axis=1)       # [T, K]
    pos = (off_rk + rank_in_tile).astype(jnp.int32)
    overflow = jnp.sum(
        jnp.where(live & (pos >= Ec), jnp.int32(1), jnp.int32(0))
    )
    dst = jnp.where(live & (pos < Ec), w_rk * Ec + pos, nw * Ec)
    rowid = jnp.arange(T * K, dtype=jnp.int32).reshape(T, K)
    inv = jnp.full((nw * Ec + 1,), jnp.int32(-1))
    inv = inv.at[dst.reshape(-1)].set(rowid.reshape(-1))     # last row = junk
    src = jnp.where(inv[: nw * Ec] >= 0, inv[: nw * Ec], jnp.int32(T * K))
    return WindowMap(
        src=src, gid_f=idx.reshape(-1).astype(jnp.float32), overflow=overflow
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def gather_payload_windowed(payload, idx, src, gid_f, nw, Ec):
    """``_pad_row(payload)[idx]`` with the windowed two-phase backward."""
    pad = jnp.pad(payload, ((0, 1), (0, 0)))
    return pad[idx]


def _window_fwd(payload, idx, src, gid_f, nw, Ec):
    pad = jnp.pad(payload, ((0, 1), (0, 0)))
    return pad[idx], (idx.shape, payload.shape, src, gid_f)


def _window_bwd(nw, Ec, res, ct):
    (T, K), (P, C), src, gid_f = res
    Pw = P // nw
    # fuse the gid column into the row gather: one [T*K+1, C+1] source, one
    # per-row gather; the sentinel pad row carries gid P -> window mismatch
    # below maps it to the dropped [Pw] slot of whatever window reads it.
    ext = jnp.concatenate(
        [
            jnp.pad(ct.reshape(T * K, C), ((0, 1), (0, 0))),
            jnp.pad(gid_f, (0, 1), constant_values=float(P))[:, None],
        ],
        axis=1,
    )
    rows = ext[src]                                          # [nw*Ec, C+1]
    gid = rows[:, C].astype(jnp.int32).reshape(nw, Ec)       # exact < 2^24
    vals = rows[:, :C].reshape(nw, Ec, C)
    # interleaved windows: gid = lidx * nw + w
    lidx = gid // nw
    lidx = jnp.where(gid % nw == jnp.arange(nw, dtype=jnp.int32)[:, None],
                     lidx, Pw)                               # sentinel -> drop
    # static loop: separate small-destination scatters (vmap batches them
    # into one large-destination scatter and loses the locality win)
    parts = [
        jnp.zeros((Pw + 1, C), ct.dtype).at[lidx[w]].add(vals[w])[:Pw]
        for w in range(nw)
    ]
    d_payload = jnp.stack(parts, axis=1).reshape(P, C)       # original order
    return d_payload, None, None, None


gather_payload_windowed.defvjp(_window_fwd, _window_bwd)


def window_geometry(P: int, n_rows: int, cfg) -> tuple[int, int] | None:
    """(nw, Ec) when the windowed backward applies, else None.

    Gated on table size (the plain scatter transpose is faster below ~1M
    rows) and on the capacity being window-divisible. gid values must stay
    f32-exact for the fused gather column: P < 2^24."""
    Pw = 1 << cfg.grad_window_bits
    if (
        n_rows < cfg.grad_window_min_rows
        or P % Pw
        or P // Pw < 2
        or P >= 1 << 24
    ):
        return None
    nw = P // Pw
    # slab capacity: slack * mean rows/window, 128-aligned, <= all rows
    Ec = int(cfg.grad_window_slack * n_rows / nw)
    Ec = min(n_rows, -(-Ec // 128) * 128)
    return nw, Ec
