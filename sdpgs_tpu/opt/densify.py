"""Adaptive density control on static-capacity masked arrays.

Replaces the reference's shape-changing tensor surgery
(reference/scene/gaussian_model.py:400-612) with mask flips and slot reuse:
spawned Gaussians are written into dead slots (allocated by a stable argsort
of the alive mask), so array shapes — and therefore the compiled train step —
never change. Runs as its own jitted "slow path" every
``densification_interval`` steps.

Semantics parity (gaussian_model.py):
- clone: grad-norm >= tau and max scale <= percent_dense * extent (:566-589)
- split: grad-norm >= tau and max scale >  percent_dense * extent; N=2
  children sampled from N(0, diag(S)) rotated into world, child scale =
  S / (0.8 N); the source is pruned (:535-564)
- proximity bridging (iteration < 2000): sources with mean-sq-3NN-dist >
  5*extent and max scale > extent spawn 3 midpoints toward their neighbors,
  inheriting the *neighbor's* scale/opacity/feature, identity rotation,
  zero SH (:513-532, :598-599)
- prune: activated opacity < min_opacity (:591-606; size pruning only when a
  max_screen_size is given — the trainer passes None, train.py:224)
- densification stats: mean over observations of ||d(mean2d NDC)||
  (:610-612); stats fully reset after each densify (:508-510)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from sdpgs_tpu.core.gaussians import Gaussians
from sdpgs_tpu.core.transforms import quat_to_rotmat, normalize_quat
from sdpgs_tpu.opt.adam import GaussianAdamState, zero_state_rows


@struct.dataclass
class DensifyStats:
    xyz_gradient_accum: jnp.ndarray  # [P]
    denom: jnp.ndarray               # [P]
    max_radii2d: jnp.ndarray         # [P]


def init_stats(capacity: int) -> DensifyStats:
    # distinct buffers: donated jits reject aliased arguments
    return DensifyStats(
        xyz_gradient_accum=jnp.zeros((capacity,), jnp.float32),
        denom=jnp.zeros((capacity,), jnp.float32),
        max_radii2d=jnp.zeros((capacity,), jnp.float32),
    )


def add_densification_stats(
    stats: DensifyStats,
    viewspace_grad: jnp.ndarray,  # [P, 2] pixel-space d(mean2d) grads
    visibility: jnp.ndarray,      # [P] bool
    radii: jnp.ndarray,           # [P]
    width: int,
    height: int,
) -> DensifyStats:
    """The reference accumulates NDC-scaled screen grads
    (backward.cu:460-461 scales by W/2, H/2; train.py:220-221). Our
    rasterizer produces pixel-space grads, so rescale to match the
    calibration of densify_grad_threshold."""
    g = jnp.stack(
        [viewspace_grad[:, 0] * (0.5 * width), viewspace_grad[:, 1] * (0.5 * height)],
        axis=-1,
    )
    norm = jnp.linalg.norm(g, axis=-1)
    vis = visibility.astype(jnp.float32)
    return DensifyStats(
        xyz_gradient_accum=stats.xyz_gradient_accum + norm * vis,
        denom=stats.denom + vis,
        max_radii2d=jnp.maximum(stats.max_radii2d, radii * vis),
    )


def add_densification_stats_batched(
    stats: DensifyStats,
    viewspace_grads: jnp.ndarray,  # [V, P, 2] pixel-space d(mean2d) grads
    visibility: jnp.ndarray,       # [V, P] bool
    radii: jnp.ndarray,            # [V, P]
    width: int,
    height: int,
) -> DensifyStats:
    """Whole view batch in one pass (one [V, P] reduction instead of V
    sequential [P] updates — the loop costs ~1.3 ms per view at 131k
    capacity). Same accumulation semantics as V calls of
    :func:`add_densification_stats`."""
    gx = viewspace_grads[..., 0] * (0.5 * width)
    gy = viewspace_grads[..., 1] * (0.5 * height)
    norm = jnp.sqrt(gx * gx + gy * gy)                             # [V, P]
    vis = visibility.astype(jnp.float32)
    return DensifyStats(
        xyz_gradient_accum=stats.xyz_gradient_accum + jnp.sum(norm * vis, axis=0),
        denom=stats.denom + jnp.sum(vis, axis=0),
        max_radii2d=jnp.maximum(stats.max_radii2d, jnp.max(radii * vis, axis=0)),
    )


class DensifyInfo(NamedTuple):
    spawned: jnp.ndarray   # int32 children actually written
    dropped: jnp.ndarray   # int32 children lost to capacity
    pruned: jnp.ndarray    # int32 Gaussians killed this round
    num_alive: jnp.ndarray


def densify_and_prune(
    g: Gaussians,
    opt_state: GaussianAdamState,
    stats: DensifyStats,
    key: jax.Array,
    *,
    grad_threshold: float,
    min_opacity: float,
    extent: float,
    percent_dense: float,
    run_proximity: bool,
    knn_dist: jnp.ndarray | None = None,   # [P] mean sq dist to 3-NN
    knn_idx: jnp.ndarray | None = None,    # [P, 3]
    max_screen_size: float | None = None,
) -> tuple[Gaussians, GaussianAdamState, DensifyStats, DensifyInfo]:
    P = g.capacity
    alive = g.alive > 0.0
    grads = jnp.where(stats.denom > 0, stats.xyz_gradient_accum / stats.denom, 0.0)
    grads = jnp.nan_to_num(grads)

    scale = jnp.exp(g.scaling)
    max_scale = jnp.max(scale, axis=-1)

    hit = alive & (grads >= grad_threshold)
    clone_m = hit & (max_scale <= percent_dense * extent)
    split_m = hit & (max_scale > percent_dense * extent)
    if run_proximity and knn_dist is not None:
        prox_m = alive & (knn_dist > 5.0 * extent) & (max_scale > extent)
    else:
        prox_m = jnp.zeros_like(alive)
        knn_idx = jnp.zeros((P, 3), jnp.int32)

    c = clone_m.astype(jnp.int32)
    s = split_m.astype(jnp.int32)
    p = prox_m.astype(jnp.int32)
    counts = c + 2 * s + 3 * p
    cum = jnp.cumsum(counts)
    starts = cum - counts
    total_new = cum[-1]

    # Free-slot ranks: stable sort puts dead slots (alive=0) first.
    order = jnp.argsort(alive.astype(jnp.int32), stable=True)      # [P]
    num_free = P - jnp.sum(alive.astype(jnp.int32))
    spawned = jnp.minimum(total_new, num_free)
    dropped = total_new - spawned

    r = jnp.arange(P, dtype=jnp.int32)
    active = r < spawned
    src = jnp.searchsorted(cum, r, side="right").astype(jnp.int32)
    src = jnp.clip(src, 0, P - 1)
    off = r - starts[src]

    c_src = c[src]
    s_src = s[src]
    is_clone = active & (off < c_src)
    split_off = off - c_src
    is_split = active & (split_off >= 0) & (split_off < 2 * s_src)
    prox_off = off - c_src - 2 * s_src
    is_prox = active & (prox_off >= 0)
    nk = jnp.clip(prox_off, 0, 2)
    neighbor = knn_idx[src, nk]

    # --- child parameters (vectorized over slot rank r) ---------------------
    noise = jax.random.normal(key, (P, 3)) * jnp.exp(g.scaling[src])
    R = quat_to_rotmat(normalize_quat(g.rotation[src]))            # [P, 3, 3]
    split_xyz = g.xyz[src] + jnp.einsum("pij,pj->pi", R, noise)
    split_scaling = g.scaling[src] - jnp.log(0.8 * 2.0)

    prox_xyz = (g.xyz[src] + g.xyz[neighbor]) * 0.5
    identity_quat = jnp.zeros((P, 4)).at[:, 0].set(1.0)

    w_prox = is_prox[:, None].astype(jnp.float32)
    w_split = is_split[:, None].astype(jnp.float32)

    child = {
        "xyz": jnp.where(is_prox[:, None], prox_xyz,
                         jnp.where(is_split[:, None], split_xyz, g.xyz[src])),
        "features_dc": jnp.where(is_prox[:, None, None], 0.0, g.features_dc[src]),
        "features_rest": jnp.where(is_prox[:, None, None], 0.0, g.features_rest[src]),
        "scaling": jnp.where(is_prox[:, None], g.scaling[neighbor],
                             jnp.where(is_split[:, None], split_scaling, g.scaling[src])),
        "rotation": jnp.where(is_prox[:, None], identity_quat, g.rotation[src]),
        "opacity": jnp.where(is_prox[:, None], g.opacity[neighbor], g.opacity[src]),
        "language_feature": jnp.where(
            is_prox[:, None], g.language_feature[neighbor], g.language_feature[src]
        ),
        "confidence": jnp.ones((P, 1), jnp.float32),
    }

    # --- scatter children into free slots ----------------------------------
    slots = order  # slot for rank r
    new_fields = {}
    for name, child_val in child.items():
        cur = getattr(g, name)
        at_slot = cur[slots]
        mask = active.reshape((-1,) + (1,) * (cur.ndim - 1))
        new_fields[name] = cur.at[slots].set(jnp.where(mask, child_val, at_slot))

    spawn_row = jnp.zeros((P,), jnp.bool_).at[slots].set(active)
    alive_new = alive | spawn_row
    # split sources die (gaussian_model.py:563-564)
    alive_new = alive_new & ~split_m

    # --- opacity prune on the post-spawn population -------------------------
    opacity_act = jax.nn.sigmoid(new_fields["opacity"][:, 0])
    prune = alive_new & (opacity_act < min_opacity)
    if max_screen_size is not None:
        big_vs = stats.max_radii2d > max_screen_size
        big_ws = max_scale > 0.1 * extent
        prune = prune | (alive_new & (big_vs | big_ws))
    alive_final = alive_new & ~prune

    g_new = g.replace(alive=alive_final.astype(jnp.float32), **new_fields)

    # New/dead slots get zeroed Adam moments (reference cat_tensors zero-pads).
    opt_state = zero_state_rows(opt_state, spawn_row | ~alive_final)
    stats_new = init_stats(P)

    info = DensifyInfo(
        spawned=spawned,
        dropped=dropped,
        pruned=jnp.sum((alive_new & prune).astype(jnp.int32)) + jnp.sum(split_m.astype(jnp.int32)),
        num_alive=jnp.sum(alive_final.astype(jnp.int32)),
    )
    return g_new, opt_state, stats_new, info


def reset_opacity(
    g: Gaussians, opt_state: GaussianAdamState, ceiling: float = 0.01
) -> tuple[Gaussians, GaussianAdamState]:
    """Clamp activated opacity to <= ceiling and zero the opacity moments
    (reference gaussian_model.py:351-355 + replace_tensor_to_optimizer)."""
    act = jax.nn.sigmoid(g.opacity)
    new_act = jnp.minimum(act, ceiling)
    new_raw = jnp.log(new_act / (1.0 - new_act))
    opt_state = zero_state_rows(
        opt_state, jnp.ones((g.capacity,), jnp.float32), keys=("opacity",)
    )
    return g.replace(opacity=new_raw), opt_state
