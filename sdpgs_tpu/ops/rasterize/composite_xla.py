"""Per-tile front-to-back alpha compositing, pure-XLA path.

Semantics parity with reference forward.cu:261-374 (``renderCUDA``): per
pixel, Gaussians composite front to back with

  alpha = min(0.99, opacity * exp(power)),  power = -0.5 (a dx^2 + c dy^2) - b dx dy

skipping alpha < 1/255 or power > 0, halting when transmittance would drop
below 1e-4. The CUDA per-pixel sequential loop becomes a *chunked
transmittance-scan*: for a chunk of G Gaussians x N pixels we compute the
alpha matrix, take a cumulative product of (1 - alpha) along the Gaussian
axis to recover each entry's incoming transmittance, and accumulate all
output channels with one [N, G] x [G, C] matmul per tile -> the MXU does the
accumulation instead of scalar adds. The early-stop "done" flag is carried
across chunks, preserving the exact CUDA contributor set.

The backward pass is JAX autodiff through the scan with rematerialization
(``jax.checkpoint``), replacing the hand-written back-to-front CUDA kernel
(backward.cu:399-557). This module is the golden model; the Pallas kernel in
``composite_pallas.py`` must match it bit-for-bit-ish (fp32 tolerance).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from sdpgs_tpu.config import RasterizeConfig


class TileOutputs(NamedTuple):
    values: jnp.ndarray   # [T, npix, C] composited channels (premultiplied)
    final_t: jnp.ndarray  # [T, npix] final transmittance


def tile_pixel_coords(
    num_tiles_x: int, num_tiles_y: int, tile: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pixel-center coordinates for every tile: ([T, npix] x, [T, npix] y)."""
    ty, tx = jnp.meshgrid(
        jnp.arange(num_tiles_y, dtype=jnp.float32),
        jnp.arange(num_tiles_x, dtype=jnp.float32),
        indexing="ij",
    )
    origin_x = (tx * tile).reshape(-1, 1)                 # [T, 1]
    origin_y = (ty * tile).reshape(-1, 1)
    ly, lx = jnp.meshgrid(
        jnp.arange(tile, dtype=jnp.float32),
        jnp.arange(tile, dtype=jnp.float32),
        indexing="ij",
    )
    px = origin_x + lx.reshape(1, -1)                      # [T, npix]
    py = origin_y + ly.reshape(1, -1)
    return px, py


def tile_pixel_coords_range(
    t0: jnp.ndarray, n_local: int, num_tiles_x: int, tile: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pixel-center coordinates for ``n_local`` tiles starting at flat tile id
    ``t0`` (traced offset, static count) — the tile-sharded variant of
    ``tile_pixel_coords``."""
    tiles = t0 + jnp.arange(n_local, dtype=jnp.int32)
    origin_x = (tiles % num_tiles_x).astype(jnp.float32)[:, None] * tile
    origin_y = (tiles // num_tiles_x).astype(jnp.float32)[:, None] * tile
    ly, lx = jnp.meshgrid(
        jnp.arange(tile, dtype=jnp.float32),
        jnp.arange(tile, dtype=jnp.float32),
        indexing="ij",
    )
    px = origin_x + lx.reshape(1, -1)                      # [n_local, npix]
    py = origin_y + ly.reshape(1, -1)
    return px, py


def composite_tiles_xla(
    xy: jnp.ndarray,        # [T, K, 2] gathered Gaussian centers (pixels)
    conic: jnp.ndarray,     # [T, K, 3]
    opacity: jnp.ndarray,   # [T, K]
    values: jnp.ndarray,    # [T, K, C] channels to composite (rgb/depth/feat)
    px: jnp.ndarray,        # [T, npix]
    py: jnp.ndarray,        # [T, npix]
    cfg: RasterizeConfig,
    rect: jnp.ndarray | None = None,  # [T, K, 4] tile-granular rect
) -> TileOutputs:
    """``rect`` (xmin, xmax, ymin, ymax in tile units, exclusive max) lets the
    untiled golden renderer apply the same tile-rect cutoff as the binned
    path (CUDA composites a Gaussian for every pixel of a tile in its rect
    and for none outside, forward.cu:234-237)."""
    T_tiles, K = opacity.shape
    C = values.shape[-1]
    npix = px.shape[-1]
    chunk = cfg.chunk
    assert K % chunk == 0, f"K={K} must be a multiple of chunk={chunk}"
    if rect is not None:
        tile_x = jnp.floor(px / cfg.tile)                 # [T, npix]
        tile_y = jnp.floor(py / cfg.tile)

    def step(carry, inputs):
        t_in, done = carry                                # [T, npix], [T, npix] bool
        if rect is None:
            cxy, ccon, copa, cval = inputs                # [T, G, ...]
        else:
            cxy, ccon, copa, cval, crect = inputs
        dx = cxy[:, :, 0][:, :, None] - px[:, None, :]    # [T, G, npix]
        dy = cxy[:, :, 1][:, :, None] - py[:, None, :]
        a = ccon[:, :, 0][:, :, None]
        b = ccon[:, :, 1][:, :, None]
        c = ccon[:, :, 2][:, :, None]
        power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
        alpha = jnp.minimum(cfg.alpha_max, copa[:, :, None] * jnp.exp(power))
        alpha = jnp.where((power > 0.0) | (alpha < cfg.alpha_min), 0.0, alpha)
        if rect is not None:
            inside = (
                (tile_x[:, None, :] >= crect[:, :, 0][:, :, None])
                & (tile_x[:, None, :] < crect[:, :, 1][:, :, None])
                & (tile_y[:, None, :] >= crect[:, :, 2][:, :, None])
                & (tile_y[:, None, :] < crect[:, :, 3][:, :, None])
            )
            alpha = jnp.where(inside, alpha, 0.0)

        one_m = 1.0 - alpha
        cum = t_in[:, None, :] * jnp.cumprod(one_m, axis=1)   # incl. transmittance
        active = (cum >= cfg.transmittance_min) & (~done[:, None, :])
        alpha_eff = alpha * active
        # Exclusive incoming transmittance; exact while `active` is a prefix.
        t_excl = jnp.concatenate([t_in[:, None, :], cum[:, :-1, :]], axis=1)
        w = alpha_eff * t_excl                            # [T, G, npix]
        contrib = jnp.einsum(
            "tgp,tgc->tpc", w, cval,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        t_out = t_in * jnp.prod(1.0 - alpha_eff, axis=1)
        done_out = done | jnp.any(cum < cfg.transmittance_min, axis=1)
        return (t_out, done_out), contrib

    xs = (
        xy.reshape(T_tiles, K // chunk, chunk, 2).swapaxes(0, 1),
        conic.reshape(T_tiles, K // chunk, chunk, 3).swapaxes(0, 1),
        opacity.reshape(T_tiles, K // chunk, chunk).swapaxes(0, 1),
        values.reshape(T_tiles, K // chunk, chunk, C).swapaxes(0, 1),
    )
    if rect is not None:
        xs = xs + (rect.reshape(T_tiles, K // chunk, chunk, 4).swapaxes(0, 1),)
    # Data-depend the carry init on px so that under shard_map (tile-sharded
    # rasterization) it is typed as varying over the shard axis like the
    # body's outputs.
    init = (
        jnp.ones((T_tiles, npix), jnp.float32) + 0.0 * px,
        (0.0 * px) > 0.0,
    )
    (t_final, _), contribs = jax.lax.scan(jax.checkpoint(step), init, xs)
    return TileOutputs(values=jnp.sum(contribs, axis=0), final_t=t_final)


def assemble_image(
    tiles: jnp.ndarray, tiles_x: int, tiles_y: int, tile: int, height: int, width: int
) -> jnp.ndarray:
    """[T, npix, C] tile buffers -> [H, W, C] image (crop edge padding)."""
    C = tiles.shape[-1]
    img = tiles.reshape(tiles_y, tiles_x, tile, tile, C)
    img = img.transpose(0, 2, 1, 3, 4).reshape(tiles_y * tile, tiles_x * tile, C)
    return img[:height, :width]
