"""Public rasterizer API: preprocess -> bin -> gather -> composite -> image.

Replaces the reference's ``GaussianRasterizer`` binding
(diff_gaussian_rasterization/__init__.py:171-220) with the *extended*
5-output semantics actually consumed by the framework
(reference/gaussian_renderer/__init__.py:315-326): color, expected depth,
alpha, 3-channel feature image, radii.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from sdpgs_tpu.config import RasterizeConfig
from sdpgs_tpu.core.camera import Camera
from sdpgs_tpu.ops.rasterize import binning as binning_lib
from sdpgs_tpu.ops.rasterize import composite_xla
from sdpgs_tpu.ops.rasterize import grad_window
from sdpgs_tpu.ops.rasterize.preprocess import Preprocessed, preprocess, preprocess_fused


class RenderOutput(NamedTuple):
    color: jnp.ndarray      # [H, W, 3]
    depth: jnp.ndarray      # [H, W] expected depth (sum w_i * z_i)
    alpha: jnp.ndarray      # [H, W] 1 - final transmittance
    feature: jnp.ndarray    # [H, W, 3] composited language feature
    radii: jnp.ndarray      # [P] screen radii (0 for invisible)
    visibility: jnp.ndarray  # [P] bool, radii > 0
    overflow: jnp.ndarray   # telemetry: entries dropped by per-tile cap K
    clipped: jnp.ndarray    # telemetry: tile slots dropped by per-Gaussian cap D
    slab: jnp.ndarray       # telemetry: payload-grad rows dropped by the
                            # windowed backward's per-window slab cap Ec —
                            # a GRADIENT-only loss (the forward render keeps
                            # those rows), tracked separately so the capacity
                            # ladder can grow grad_window_slack alone instead
                            # of ratcheting S/K (ADVICE r4)


def _pad_row(a: jnp.ndarray) -> jnp.ndarray:
    """Append one zero 'dead' row: binning sentinel index P points here."""
    pad = [(0, 1)] + [(0, 0)] * (a.ndim - 1)
    return jnp.pad(a, pad)


@jax.custom_vjp
def _gather_payload_gatherbwd(payload, idx, entry_slot, order):
    """``_pad_row(payload)[idx]`` with a GATHER-based backward.

    The default autodiff transpose is a scatter-add of all T*K cotangent
    rows into [P+1, C]; XLA's scatter scales super-linearly (measured
    ~120 ms at 1.57M rows / 1M-row destination vs ~2 ms at bench shapes).
    Each (Gaussian, rect-slot d) entry owns a UNIQUE table slot
    (tile*K + rank), so the per-Gaussian gradient is the exact sum of D
    gathered cotangent rows — entries not in the table (K-cap or block-slot
    drops, dead slots) point at the sentinel slot, and the composite emits
    exactly-zero gradients at unwritten slots, so the sum needs no masking.
    Gathers run ~20x faster per row than the scatter at this scale (r3,
    scripts/perf_bwd_large.py)."""
    return _pad_row(payload)[idx]


def _gather_payload_gatherbwd_fwd(payload, idx, entry_slot, order):
    return _pad_row(payload)[idx], (idx.shape, payload.shape, entry_slot, order)


def _gather_payload_gatherbwd_bwd(res, ct):
    (T, K), (P, C), entry_slot, order = res
    ct_pad = jnp.pad(ct.reshape(T * K, C), ((0, 1), (0, 0)))  # sentinel row 0
    acc = ct_pad[entry_slot[0]]
    for d in range(1, entry_slot.shape[0]):
        acc = acc + ct_pad[entry_slot[d]]                     # [P, C] sorted
    # unsort: sorted row p holds the gradient of Gaussian order[p]
    d_payload = jnp.zeros((P, C), ct.dtype).at[order].set(
        acc, unique_indices=True
    )
    return d_payload, None, None, None


_gather_payload_gatherbwd.defvjp(
    _gather_payload_gatherbwd_fwd, _gather_payload_gatherbwd_bwd
)


def rasterize_tiles(
    xyz: jnp.ndarray,
    cov3d: Optional[jnp.ndarray],
    opacity: jnp.ndarray,
    color: jnp.ndarray,
    feature: jnp.ndarray,
    alive: jnp.ndarray,
    cam: Camera,
    cfg: RasterizeConfig,
    means2d_offset: Optional[jnp.ndarray] = None,
    feature_weight: Optional[jnp.ndarray] = None,
    scale: Optional[jnp.ndarray] = None,
    quat: Optional[jnp.ndarray] = None,
    tile_range: Optional[tuple[jnp.ndarray, int]] = None,
    prep: Optional[Preprocessed] = None,
) -> tuple[composite_xla.TileOutputs, binning_lib.Binning, Preprocessed]:
    """Preprocess -> bin -> gather -> composite for a (sub)range of tiles.

    ``tile_range=(t0, n_local)`` composites only the ``n_local`` tiles
    starting at flat tile id ``t0`` — the per-shard body for
    tile-partitioned multi-chip rasterization (SURVEY §2.3 item 3).

    ``prep``: precomputed screen-space quantities (the fused Pallas
    preprocess+SH kernel, preprocess_pallas.py) — skips the XLA preprocess
    here."""
    if prep is not None:
        pass
    elif scale is not None:
        prep = preprocess_fused(
            xyz, scale, quat, cam, alive, near=cfg.near, low_pass=cfg.low_pass
        )
    else:
        prep = preprocess(xyz, cov3d, cam, alive, near=cfg.near, low_pass=cfg.low_pass)
    mean2d = prep.mean2d
    if means2d_offset is not None:
        mean2d = mean2d + means2d_offset

    # Binning consumes geometry only; gradients flow through the payload.
    bins = binning_lib.bin_gaussians(
        Preprocessed(
            valid=jax.lax.stop_gradient(prep.valid),
            mean2d=jax.lax.stop_gradient(mean2d),
            depth=jax.lax.stop_gradient(prep.depth),
            conic=jax.lax.stop_gradient(prep.conic),
            radius=jax.lax.stop_gradient(prep.radius),
        ),
        cam.width,
        cam.height,
        cfg,
        tile_range=tile_range,
    )

    if feature_weight is not None:
        feature = feature * feature_weight[:, None]

    # One packed payload -> a single gather (and a single scatter-add in the
    # backward) instead of four: TPU gathers are per-row, so batching the
    # columns halves the cost.
    payload = jnp.concatenate(
        [
            mean2d,                                   # 0:2
            prep.conic,                               # 2:5
            (opacity * prep.valid)[:, None],          # 5
            color,                                    # 6:9
            prep.depth[:, None],                      # 9
            feature,                                  # 10:13
        ],
        axis=-1,
    )
    idx = bins.tile_index                     # [T, K]
    P = payload.shape[0]
    slab = jnp.int32(0)
    wgeo = grad_window.window_geometry(P, idx.shape[0] * idx.shape[1], cfg)
    if wgeo is not None:
        # Windowed two-phase backward: restores destination locality for
        # the payload-grad scatter at large scenes (~10x per-row; see
        # ops/rasterize/grad_window.py). Map build is parameter-independent
        # (depends only on the integer table); its slab-capacity drops are
        # gradient-only (the render keeps the rows) and ride a SEPARATE
        # telemetry channel so the ladder can react proportionately.
        nw, Ec = wgeo
        wmap = grad_window.build_window_map(idx, P, nw, Ec)
        slab = wmap.overflow
        gathered = grad_window.gather_payload_windowed(
            payload, idx, wmap.src, wmap.gid_f, nw, Ec
        )                                     # [T, K, 13], windowed bwd
    elif bins.entry_slot is not None:
        gathered = _gather_payload_gatherbwd(
            payload, idx, bins.entry_slot, bins.order
        )                                     # [T, K, 13], gather-based bwd
    else:
        gathered = _pad_row(payload)[idx]     # [T, K, 13]
    xy_g = gathered[..., 0:2]
    con_g = gathered[..., 2:5]
    opa_g = gathered[..., 5]
    val_g = gathered[..., 6:13]

    tiles_x, tiles_y = binning_lib.tile_grid(cam.width, cam.height, cfg.tile)
    if tile_range is None:
        px, py = composite_xla.tile_pixel_coords(tiles_x, tiles_y, cfg.tile)
    else:
        px, py = composite_xla.tile_pixel_coords_range(
            tile_range[0], tile_range[1], tiles_x, cfg.tile
        )

    if cfg.use_pallas and (
        jax.default_backend() == "tpu" or cfg.interpret_kernels
    ):
        from sdpgs_tpu.ops.rasterize.composite_pallas import composite_tiles_pallas

        out = composite_tiles_pallas(
            xy_g, con_g, opa_g, val_g, px, py, cfg, counts=bins.tile_counts
        )
    else:
        out = composite_xla.composite_tiles_xla(xy_g, con_g, opa_g, val_g, px, py, cfg)
    return out, bins, prep, slab


def rasterize(
    xyz: jnp.ndarray,          # [P, 3]
    cov3d: jnp.ndarray,        # [P, 3, 3] world covariance
    opacity: jnp.ndarray,      # [P] activated opacity (dead slots zero)
    color: jnp.ndarray,        # [P, 3] per-Gaussian RGB
    feature: jnp.ndarray,      # [P, 3] per-Gaussian language feature
    alive: jnp.ndarray,        # [P] float mask
    cam: Camera,
    bg: jnp.ndarray,           # [3]
    cfg: RasterizeConfig,
    means2d_offset: Optional[jnp.ndarray] = None,
    feature_weight: Optional[jnp.ndarray] = None,
    scale: Optional[jnp.ndarray] = None,
    quat: Optional[jnp.ndarray] = None,
    prep: Optional[Preprocessed] = None,
) -> RenderOutput:
    """Differentiable render of one view.

    When ``scale``/``quat`` (activated scale + normalized quaternion) are
    given, the fused scalar-expanded preprocess is used and ``cov3d`` is
    ignored — batched tiny-matrix einsums lower poorly on TPU.

    ``means2d_offset`` is an all-zeros [P, 2] array added to the projected
    screen centers; taking ``jax.grad`` w.r.t. it yields the per-Gaussian
    screen-space gradients used for densification stats — the JAX analogue of
    the reference's ``screenspace_points`` retain_grad trick
    (gaussian_renderer/__init__.py:217-221).

    ``feature_weight`` optionally scales the feature channels per Gaussian
    (the reference's per-Gaussian ``confidence``,
    gaussian_renderer/__init__.py:227-241).
    """
    out, bins, prep, slab = rasterize_tiles(
        xyz, cov3d, opacity, color, feature, alive, cam, cfg,
        means2d_offset=means2d_offset, feature_weight=feature_weight,
        scale=scale, quat=quat, prep=prep,
    )
    tiles_x, tiles_y = binning_lib.tile_grid(cam.width, cam.height, cfg.tile)
    H, W = cam.height, cam.width
    vals = composite_xla.assemble_image(out.values, tiles_x, tiles_y, cfg.tile, H, W)
    final_t = composite_xla.assemble_image(
        out.final_t[..., None], tiles_x, tiles_y, cfg.tile, H, W
    )[..., 0]

    color_img = vals[..., :3] + final_t[..., None] * bg[None, None, :]
    return RenderOutput(
        color=color_img,
        depth=vals[..., 3],
        alpha=1.0 - final_t,
        feature=vals[..., 4:7],
        radii=jax.lax.stop_gradient(prep.radius),
        visibility=jax.lax.stop_gradient(prep.radius > 0.0),
        overflow=bins.overflow,
        clipped=bins.clipped,
        slab=slab,
    )


def rasterize_naive(
    xyz: jnp.ndarray,
    cov3d: jnp.ndarray,
    opacity: jnp.ndarray,
    color: jnp.ndarray,
    feature: jnp.ndarray,
    alive: jnp.ndarray,
    cam: Camera,
    bg: jnp.ndarray,
    cfg: RasterizeConfig,
) -> RenderOutput:
    """Slow-but-obviously-correct golden renderer: every Gaussian against
    every pixel, no tiling, no per-tile capacity (SURVEY.md stage 2). Used in
    tests to validate the tiled/Pallas paths."""
    P = xyz.shape[0]
    prep = preprocess(xyz, cov3d, cam, alive, near=cfg.near, low_pass=cfg.low_pass)

    order = jnp.argsort(jnp.where(prep.valid, prep.depth, jnp.inf))
    values = jnp.concatenate([color, prep.depth[:, None], feature], axis=-1)

    # Same tile-granular rect cutoff as the binned path (CUDA composites a
    # Gaussian for every pixel of every tile its rect covers, and nowhere
    # else) so golden and tiled agree exactly.
    tiles_x, tiles_y = binning_lib.tile_grid(cam.width, cam.height, cfg.tile)
    xmin, xmax, ymin, ymax = binning_lib.tile_rect(
        prep.mean2d, prep.radius, tiles_x, tiles_y, cfg.tile
    )
    rect = jnp.stack([xmin, xmax, ymin, ymax], axis=-1).astype(jnp.float32)

    chunk = cfg.chunk
    pad = (-P) % chunk
    idx = jnp.pad(order, (0, pad), constant_values=P)[None, :]  # [1, K]
    xy_g = _pad_row(prep.mean2d)[idx]
    con_g = _pad_row(prep.conic)[idx]
    opa_g = _pad_row(opacity * prep.valid)[idx]
    val_g = _pad_row(values)[idx]
    rect_g = _pad_row(rect)[idx]

    H, W = cam.height, cam.width
    ys, xs = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32), indexing="ij"
    )
    px = xs.reshape(1, -1)
    py = ys.reshape(1, -1)

    out = composite_xla.composite_tiles_xla(
        xy_g, con_g, opa_g, val_g, px, py, cfg, rect=rect_g
    )
    vals = out.values.reshape(H, W, -1)
    final_t = out.final_t.reshape(H, W)
    return RenderOutput(
        color=vals[..., :3] + final_t[..., None] * bg[None, None, :],
        depth=vals[..., 3],
        alpha=1.0 - final_t,
        feature=vals[..., 4:7],
        radii=prep.radius,
        visibility=prep.radius > 0.0,
        overflow=jnp.int32(0),
        clipped=jnp.int32(0),
        slab=jnp.int32(0),
    )
