"""Pallas TPU kernels for per-tile front-to-back compositing.

Replaces the CUDA render kernels (reference forward.cu:261-374,
backward.cu:399-557) with a TPU-native formulation:

- one grid step per tile; the tile's K-entry payload streams through VMEM;
- a chunk of G Gaussians x npix pixels computes its alpha matrix on the VPU,
  recovers per-entry incoming transmittance with a *triangular matmul in log
  space* (cumprod -> MXU), and accumulates all output channels with a
  [C, G] x [G, npix] matmul — the MXU does the compositing accumulation that
  CUDA performs with per-thread scalar adds;
- per-pixel early termination (T < 1e-4) becomes a per-tile chunk-granular
  ``lax.while_loop`` exit once every pixel is done — preserving the exact
  CUDA contributor set via a carried ``done`` flag;
- the backward pass is an analytic reverse sweep (back-to-front over chunks,
  like backward.cu) that recomputes alphas from residuals (transmittance +
  done flag at each chunk start) and emits *per-entry* gradients; the outer
  gather's autodiff transpose then scatter-adds them per Gaussian —
  deterministic segment-sum instead of CUDA's atomicAdd.

Gradient math: with w_i = alpha_i * T_i (T_i = incoming transmittance),
out = sum_i w_i v_i and T_fin = T_0 * prod(1 - alpha_i):

  dL/dv_i     = w_i * g
  dL/dalpha_i = T_i (v_i . g) - S_i / (1 - alpha_i),
  S_i = sum_{j>i} w_j (v_j . g) + T_fin * gT

which matches the CUDA accumulation (backward.cu:446-523) rearranged into
suffix form so it vectorizes as one strict-upper-triangular matmul per chunk
plus a carried scalar row.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sdpgs_tpu.config import RasterizeConfig
from sdpgs_tpu.ops.rasterize.composite_xla import TileOutputs


def _alpha_and_masks(geoT, px, py, cfg: RasterizeConfig):
    """[G, 6] packed geometry columns (xs, ys, ca, cb, cc, op) vs [npix]
    pixel rows -> alpha [G, npix] + not_clamped mask + the column views.

    The chunk's six per-entry scalars arrive as ONE transposed [G, 6] block
    (a single sublane<->lane relayout) instead of six lane-vector slices
    each broadcast with ``[:, None]`` — those implicit per-vector relayouts
    were the dominant cost of the rank kernel (r3) and recur here at ~6-13
    per chunk-visit.

    Mirrors forward.cu:330-351: power > 0 skip, alpha = min(0.99, op*exp),
    alpha < 1/255 skip."""
    xs, ys = geoT[:, 0:1], geoT[:, 1:2]                      # [G, 1]
    ca, cb, cc = geoT[:, 2:3], geoT[:, 3:4], geoT[:, 4:5]
    op = geoT[:, 5:6]
    dx = xs - px[None, :]
    dy = ys - py[None, :]
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    alpha_raw = op * jnp.exp(power)
    alpha = jnp.minimum(cfg.alpha_max, alpha_raw)
    live = (power <= 0.0) & (alpha_raw >= cfg.alpha_min)
    alpha = jnp.where(live, alpha, 0.0)
    not_clamped = live & (alpha_raw < cfg.alpha_max)
    return alpha, not_clamped, dx, dy, alpha_raw


def _tri(G: int, strict: bool, dtype=jnp.float32) -> jnp.ndarray:
    row = jax.lax.broadcasted_iota(jnp.int32, (G, G), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (G, G), 1)
    return ((row > col) if strict else (row >= col)).astype(dtype)


def _tri_dot(L, X, bf16: bool):
    """[G, G] triangular x [G, npix], f32 accumulate; optionally bf16 operands
    (2x+ MXU rate, ~2^-9 relative operand error). Explicit DEFAULT precision:
    Mosaic rejects the package-wide "highest" default on bf16 operands."""
    if bf16:
        return jnp.dot(
            L, X.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
    return jnp.dot(L, X, preferred_element_type=jnp.float32)


def _fwd_kernel(counts_ref, geo_ref, val_ref, px_ref, py_ref,
                out_ref, tfin_ref, tres_ref, dres_ref, nproc_ref,
                *, cfg: RasterizeConfig, nchunk: int, G: int, npix: int, C: int,
                tps: int):
    # ``tps`` tiles per grid step: the per-tile work is tiny relative to the
    # fixed grid-step cost (DMA setup + dispatch), so batching tiles into one
    # step amortizes it; each tile keeps its own early-exit while_loop.
    out_ref[...] = jnp.zeros_like(out_ref)
    tres_ref[...] = jnp.ones_like(tres_ref)
    dres_ref[...] = jnp.zeros_like(dres_ref)
    # Strict-lower-triangular ones: *exclusive* cumprod via matmul in log
    # space — the exclusive form gives t_excl directly (no [G, npix]
    # division) and the inclusive value back as one multiply.
    Ls = _tri(G, strict=True)

    for ti in range(tps):
        tile = pl.program_id(0) * tps + ti
        px = px_ref[ti, 0, :]
        py = py_ref[ti, 0, :]
        # Only the chunks that actually hold entries for this tile are
        # visited (binning reports per-tile live counts; sentinel slots past
        # the count are all-dead and would be pure waste).
        nch = jnp.minimum(pl.cdiv(counts_ref[0, tile], G), nchunk)

        def cond(carry):
            c, t, done = carry
            return (c < nch) & jnp.logical_not(jnp.all(done > 0.5))

        def body(carry):
            c, t, done = carry
            g0 = pl.multiple_of(c * G, 128)
            tres_ref[ti, c, :] = t
            dres_ref[ti, c, :] = done
            geoT = geo_ref[ti, :, pl.ds(g0, G)].T               # [G, 6]
            alpha, _, _, _, _ = _alpha_and_masks(geoT, px, py, cfg)

            logs = jnp.log1p(-alpha)                               # [G, npix]
            t_excl = t[None, :] * jnp.exp(
                jnp.dot(Ls, logs, preferred_element_type=jnp.float32)
            )
            cum = t_excl * (1.0 - alpha)
            active = (cum >= cfg.transmittance_min) & (done[None, :] < 0.5)
            alpha_eff = jnp.where(active, alpha, 0.0)
            w = alpha_eff * t_excl                                 # [G, npix]

            vals = val_ref[ti, :, pl.ds(g0, G)]                    # [C, G]
            out_ref[ti, :, :] += jnp.dot(vals, w, preferred_element_type=jnp.float32)

            # log1p(-alpha_eff) == where(active, logs, 0): reuse logs
            # instead of a second [G, npix] log1p pass (bit-identical).
            t_new = t * jnp.exp(jnp.sum(jnp.where(active, logs, 0.0), axis=0))
            done_new = jnp.maximum(
                done,
                jnp.any(cum < cfg.transmittance_min, axis=0).astype(jnp.float32),
            )
            return c + 1, t_new, done_new

        c_fin, t_fin, _ = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), jnp.ones((npix,), jnp.float32),
             jnp.zeros((npix,), jnp.float32)),
        )
        tfin_ref[ti, 0, :] = t_fin
        nproc_ref[0, tile] = c_fin


def _bwd_kernel(geo_ref, val_ref, px_ref, py_ref,
                tres_ref, dres_ref, nproc_ref, tfin_ref, gval_ref, gtfin_ref,
                dgeo_ref, dval_ref,
                *, cfg: RasterizeConfig, nchunk: int, G: int, npix: int, C: int,
                bwd_bf16: bool, tps: int):
    dgeo_ref[...] = jnp.zeros_like(dgeo_ref)
    dval_ref[...] = jnp.zeros_like(dval_ref)

    tri_dtype = jnp.bfloat16 if bwd_bf16 else jnp.float32
    Ls = _tri(G, strict=True, dtype=tri_dtype)
    Ut = Ls.T  # strict upper

    for ti in range(tps):
        tile = pl.program_id(0) * tps + ti
        px = px_ref[ti, 0, :]
        py = py_ref[ti, 0, :]
        g = gval_ref[ti, :, :]                                     # [C, npix]
        s0 = tfin_ref[ti, 0, :] * gtfin_ref[ti, 0, :]              # [npix]
        nproc = nproc_ref[0, tile]

        def body(k, s_carry):
            c = nproc - 1 - k
            g0 = pl.multiple_of(c * G, 128)
            t = tres_ref[ti, c, :]
            done = dres_ref[ti, c, :]
            geoT = geo_ref[ti, :, pl.ds(g0, G)].T               # [G, 6]
            ca, cb, cc = geoT[:, 2:3], geoT[:, 3:4], geoT[:, 4:5]
            op = geoT[:, 5:6]
            alpha, not_clamped, dx, dy, alpha_raw = _alpha_and_masks(
                geoT, px, py, cfg
            )

            logs = jnp.log1p(-alpha)
            t_excl = t[None, :] * jnp.exp(_tri_dot(Ls, logs, bwd_bf16))
            cum = t_excl * (1.0 - alpha)
            active = (cum >= cfg.transmittance_min) & (done[None, :] < 0.5)
            alpha_eff = jnp.where(active, alpha, 0.0)
            w = alpha_eff * t_excl

            vals = val_ref[ti, :, pl.ds(g0, G)]                    # [C, G]
            vg = jnp.dot(vals.T, g, preferred_element_type=jnp.float32)  # [G, npix]
            wvg = w * vg
            suffix = _tri_dot(Ut, wvg, bwd_bf16)
            S = suffix + s_carry[None, :]
            d_alpha = jnp.where(active, t_excl * vg - S / (1.0 - alpha), 0.0)

            # d vals: [C, G] = g @ w^T
            dval_ref[ti, :, pl.ds(g0, G)] = jnp.dot(
                g, w.T, preferred_element_type=jnp.float32
            )

            # alpha = min(0.99, op * exp(power)), masked.
            # exp(power) is not recomputed: exp(power) = alpha_raw / op, and
            # with the division hoisted out of the sum the [G, npix]
            # transcendental becomes one [G] reciprocal. alpha_raw can
            # overflow to inf on dead sentinel entries (power >> 0), so the
            # product is masked *inside* the where — d_eff * inf would be
            # 0 * inf = NaN otherwise.
            d_eff = jnp.where(not_clamped, d_alpha, 0.0)
            d_op = jnp.sum(jnp.where(not_clamped, d_alpha * alpha_raw, 0.0),
                           axis=1, keepdims=True)              # [G, 1]
            d_opa = jnp.where(op > 0.0, d_op / jnp.maximum(op, 1e-30), 0.0)
            # Six reductions share the dx*d_pow / dy*d_pow products; constant
            # scales are applied after the [G, npix] -> [G, 1] sums. The six
            # gradient columns pack into one [G, 6] block and store through
            # a single transpose (mirror of the packed-geometry load).
            d_pow = d_eff * alpha                                  # [G, npix]
            dxp = dx * d_pow
            dyp = dy * d_pow
            sxp = jnp.sum(dxp, axis=1, keepdims=True)              # [G, 1]
            syp = jnp.sum(dyp, axis=1, keepdims=True)
            dgeo_cols = jnp.concatenate(
                [
                    -(ca * sxp + cb * syp),                        # d xy0
                    -(cc * syp + cb * sxp),                        # d xy1
                    -0.5 * jnp.sum(dx * dxp, axis=1, keepdims=True),  # d con0
                    -jnp.sum(dy * dxp, axis=1, keepdims=True),     # d con1
                    -0.5 * jnp.sum(dy * dyp, axis=1, keepdims=True),  # d con2
                    d_opa,                                         # d opacity
                ],
                axis=1,
            )                                                      # [G, 6]
            dgeo_ref[ti, :, pl.ds(g0, G)] = dgeo_cols.T

            return s_carry + jnp.sum(wvg, axis=0)

        jax.lax.fori_loop(0, nproc, body, s0)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.lru_cache(maxsize=None)
def _make_composite(cfg: RasterizeConfig, T: int, K: int, C: int, npix: int):
    # Lane-dim dynamic slices must be provably 128-aligned on TPU, and a
    # 128-wide chunk makes the triangular cumprod matmul a native MXU tile.
    G = cfg.chunk_pallas
    assert G % 128 == 0 or _interpret(), (G, "pallas chunk must be 128-aligned")
    assert K % G == 0, (K, G)
    nchunk = K // G

    # Tiles per grid step: per-step overhead (DMA setup + dispatch) is a
    # large fraction of the per-tile cost at bench shapes, so batch tiles
    # into each step. Largest configured tps that divides the grid AND
    # keeps the backward kernel's per-step blocks within a conservative
    # VMEM budget (the ladder can escalate K toward 8192: without the cap,
    # a recompile at large K would die in Mosaic instead of running at a
    # smaller tps).
    def _tps_bytes(t):
        # Backward-kernel blocks (the larger of the two passes): inputs
        # geo 6K + val CK + px/py/tres/dres/tfin/gval/gtfin
        # (2*nchunk + 4 + C)*npix, outputs dgeo 6K + dval CK.
        per_tile = (12 + 2 * C) * K + (2 * nchunk + 4 + C) * npix
        return t * per_tile * 4 * 2          # f32, double-buffered pipeline

    tps = 1
    for cand in range(min(cfg.tiles_per_kernel_step, T), 0, -1):
        if T % cand == 0 and _tps_bytes(cand) <= 8 * 1024 * 1024:
            tps = cand
            break

    tile_block = lambda *s: pl.BlockSpec(
        (tps,) + s, lambda i: (i,) + (0,) * len(s), memory_space=pltpu.VMEM
    )

    fwd_call = pl.pallas_call(
        functools.partial(_fwd_kernel, cfg=cfg, nchunk=nchunk, G=G, npix=npix,
                          C=C, tps=tps),
        grid=(T // tps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # per-tile counts
            tile_block(6, K),      # packed geometry (xy, conic, opacity)
            tile_block(C, K),      # values
            tile_block(1, npix),   # px
            tile_block(1, npix),   # py
        ],
        out_specs=[
            tile_block(C, npix),   # out values
            tile_block(1, npix),   # final T
            tile_block(nchunk, npix),  # T residual at chunk starts
            tile_block(nchunk, npix),  # done residual
            pl.BlockSpec(memory_space=pltpu.SMEM),  # nproc: full array, indexed by program_id
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, C, npix), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, npix), jnp.float32),
            jax.ShapeDtypeStruct((T, nchunk, npix), jnp.float32),
            jax.ShapeDtypeStruct((T, nchunk, npix), jnp.float32),
            # (1, T): the lane dim must be the long one or SMEM windows pad
            # each scalar to 128 lanes (blows the 1MB SMEM budget under vmap)
            jax.ShapeDtypeStruct((1, T), jnp.int32),
        ],
        interpret=_interpret(),
    )

    # bf16 triangular matmuls are a TPU-only optimization: the CPU/interpret
    # backend cannot execute batched bf16 dots ("Unsupported element type for
    # DotThunk"), and the CUDA kernel contract being matched is fp32 anyway
    # (backward.cu:399-557) — off-TPU the flag is a no-op and grads are exact.
    bwd_bf16 = cfg.bwd_bf16 and not _interpret()
    bwd_call = pl.pallas_call(
        functools.partial(_bwd_kernel, cfg=cfg, nchunk=nchunk, G=G, npix=npix, C=C,
                          bwd_bf16=bwd_bf16, tps=tps),
        grid=(T // tps,),
        in_specs=[
            tile_block(6, K),      # packed geometry
            tile_block(C, K),
            tile_block(1, npix),
            tile_block(1, npix),
            tile_block(nchunk, npix),
            tile_block(nchunk, npix),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # nproc
            tile_block(1, npix),   # tfin
            tile_block(C, npix),   # g values
            tile_block(1, npix),   # g tfin
        ],
        out_specs=[
            tile_block(6, K),
            tile_block(C, K),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, 6, K), jnp.float32),
            jax.ShapeDtypeStruct((T, C, K), jnp.float32),
        ],
        interpret=_interpret(),
    )

    @jax.custom_vjp
    def composite(counts, geo, val_t, px, py):
        out, tfin, _, _, _ = fwd_call(counts, geo, val_t, px, py)
        return out, tfin

    def composite_fwd(counts, geo, val_t, px, py):
        out, tfin, tres, dres, nproc = fwd_call(counts, geo, val_t, px, py)
        return (out, tfin), (geo, val_t, px, py, tres, dres, nproc, tfin)

    def composite_bwd(res, cts):
        geo, val_t, px, py, tres, dres, nproc, tfin = res
        g_out, g_tfin = cts
        dgeo, dval = bwd_call(
            geo, val_t, px, py, tres, dres, nproc, tfin, g_out, g_tfin
        )
        return None, dgeo, dval, None, None

    composite.defvjp(composite_fwd, composite_bwd)
    return composite


def composite_tiles_pallas(
    xy: jnp.ndarray,        # [T, K, 2]
    conic: jnp.ndarray,     # [T, K, 3]
    opacity: jnp.ndarray,   # [T, K]
    values: jnp.ndarray,    # [T, K, C]
    px: jnp.ndarray,        # [T, npix]
    py: jnp.ndarray,        # [T, npix]
    cfg: RasterizeConfig,
    counts: jnp.ndarray | None = None,  # [T] live entries per tile
) -> TileOutputs:
    T, K = opacity.shape
    C = values.shape[-1]
    npix = px.shape[-1]
    composite = _make_composite(cfg, T, K, C, npix)
    if counts is None:
        counts = jnp.full((T,), K, jnp.int32)
    # One packed [T, 6, K] geometry operand: the kernels load each chunk's
    # six per-entry scalars with a single [6, G] -> [G, 6] transpose instead
    # of six lane-vector column broadcasts (relayouts).
    geo = jnp.concatenate(
        [xy, conic, opacity[..., None]], axis=-1
    ).transpose(0, 2, 1)
    out, tfin = composite(
        counts.astype(jnp.int32).reshape(1, T),
        geo,
        values.transpose(0, 2, 1),
        px[:, None, :],
        py[:, None, :],
    )
    return TileOutputs(values=out.transpose(0, 2, 1), final_t=tfin[:, 0, :])
