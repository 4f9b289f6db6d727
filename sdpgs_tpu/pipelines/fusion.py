"""Multi-view geometric-consistency depth fusion -> initialization point
cloud (reference depthfusion.py:155-409, MVSNet-style).

Pipeline per reference view:
1. scale-and-shift the mono depth to the view's sparse depth,
2. reproject into every source view and back (``reproject_with_depth``),
3. geometric consistency: reprojection error < 5 px AND relative depth
   error < 0.2 (depthfusion.py:186-211; thresholds plumbed through
   ``check_geometric_consistency``),
4. mask = photometric (none here) & >= ``min_consistent`` consistent views;
   fused depth = mean over consistent views,
5. back-project to world points, concatenate over views, uniform-downsample.

All reprojection math is batched jax.numpy (the reference loops in numpy);
the open3d uniform downsample becomes an every-Nth-point subsample, and a
voxel downsample is provided as well.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sdpgs_tpu.pipelines.depth_align import compute_scale_and_shift


def reproject_with_depth(
    depth_ref: jnp.ndarray,   # [H, W]
    K_ref: jnp.ndarray, R_ref: jnp.ndarray, t_ref: jnp.ndarray,   # w2c
    depth_src: jnp.ndarray,
    K_src: jnp.ndarray, R_src: jnp.ndarray, t_src: jnp.ndarray,
):
    """Project ref pixels into src, sample src depth (nearest), project back
    (reference depthfusion.py:155-185). Returns (reprojected depth in ref,
    x2d_reprojected, y2d_reprojected, x2d_src, y2d_src)."""
    H, W = depth_ref.shape
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    uv1 = jnp.stack([xs.reshape(-1), ys.reshape(-1), jnp.ones(H * W)], 0)

    # ref pixel -> world
    cam_pts = jnp.linalg.inv(K_ref) @ uv1 * depth_ref.reshape(1, -1)
    world = R_ref.T @ (cam_pts - t_ref[:, None])
    # world -> src
    src_cam = R_src @ world + t_src[:, None]
    src_uv = K_src @ src_cam
    x_src = src_uv[0] / src_uv[2]
    y_src = src_uv[1] / src_uv[2]

    xi = jnp.clip(jnp.round(x_src).astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(jnp.round(y_src).astype(jnp.int32), 0, H - 1)
    sampled = depth_src[yi, xi]

    # src pixel (at sampled depth) -> world -> ref
    src_pts = jnp.linalg.inv(K_src) @ jnp.stack(
        [x_src, y_src, jnp.ones_like(x_src)], 0
    ) * sampled[None, :]
    world2 = R_src.T @ (src_pts - t_src[:, None])
    ref_cam = R_ref @ world2 + t_ref[:, None]
    depth_reproj = ref_cam[2].reshape(H, W)
    ref_uv = K_ref @ ref_cam
    x_reproj = (ref_uv[0] / ref_uv[2]).reshape(H, W)
    y_reproj = (ref_uv[1] / ref_uv[2]).reshape(H, W)
    return depth_reproj, x_reproj, y_reproj, x_src.reshape(H, W), y_src.reshape(H, W)


def check_geometric_consistency(
    depth_ref, K_ref, R_ref, t_ref, depth_src, K_src, R_src, t_src,
    pix_thresh: float = 5.0, rel_depth_thresh: float = 0.2,
):
    """reference depthfusion.py:186-211. Returns (mask, reprojected depth)."""
    H, W = depth_ref.shape
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    depth_reproj, x_r, y_r, _, _ = reproject_with_depth(
        depth_ref, K_ref, R_ref, t_ref, depth_src, K_src, R_src, t_src
    )
    dist = jnp.sqrt((x_r - xs) ** 2 + (y_r - ys) ** 2)
    depth_diff = jnp.abs(depth_reproj - depth_ref)
    rel = depth_diff / jnp.maximum(depth_ref, 1e-8)
    mask = (dist < pix_thresh) & (rel < rel_depth_thresh) & (depth_ref > 0)
    return mask, jnp.where(mask, depth_reproj, 0.0)


def fuse_depths(
    mono_depths: Sequence[np.ndarray],     # per-view mono depth [H, W]
    sparse_depths: Sequence[np.ndarray],   # per-view sparse depth (0 holes)
    Ks: Sequence[np.ndarray],
    Rs: Sequence[np.ndarray],              # w2c rotations
    ts: Sequence[np.ndarray],
    colors: Sequence[np.ndarray] | None = None,   # [H, W, 3] per view
    min_consistent: int = 1,
    downsample_to: int | None = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """-> (points [N, 3], colors [N, 3]); reference filter_depth
    (depthfusion.py:234-409)."""
    V = len(mono_depths)
    aligned = []
    for v in range(V):
        valid = sparse_depths[v] > 0
        if valid.sum() >= 2:
            a, b = compute_scale_and_shift(mono_depths[v][valid], sparse_depths[v][valid])
        else:
            a, b = 1.0, 0.0
        aligned.append(jnp.asarray(a * mono_depths[v] + b, jnp.float32))

    check = jax.jit(check_geometric_consistency)
    all_pts, all_cols = [], []
    for ref in range(V):
        H, W = aligned[ref].shape
        geo_count = jnp.zeros((H, W))
        depth_sum = jnp.asarray(aligned[ref])
        for src in range(V):
            if src == ref:
                continue
            mask, d = check(
                aligned[ref], jnp.asarray(Ks[ref]), jnp.asarray(Rs[ref]), jnp.asarray(ts[ref]),
                aligned[src], jnp.asarray(Ks[src]), jnp.asarray(Rs[src]), jnp.asarray(ts[src]),
            )
            geo_count = geo_count + mask
            depth_sum = depth_sum + d
        fused = depth_sum / (geo_count + 1.0)
        keep = np.asarray(geo_count >= min_consistent) & (np.asarray(fused) > 0)

        ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        uv1 = np.stack([xs[keep], ys[keep], np.ones(keep.sum())], 0)
        cam = np.linalg.inv(Ks[ref]) @ uv1 * np.asarray(fused)[keep][None]
        world = Rs[ref].T @ (cam - ts[ref][:, None])
        all_pts.append(world.T)
        if colors is not None:
            all_cols.append(colors[ref][keep])
        else:
            all_cols.append(np.full((int(keep.sum()), 3), 0.5))

    pts = np.concatenate(all_pts, 0).astype(np.float32)
    cols = np.concatenate(all_cols, 0).astype(np.float32)
    if downsample_to is not None and len(pts) > downsample_to:
        step = len(pts) // downsample_to
        pts, cols = pts[::step], cols[::step]
    return pts, cols


def voxel_downsample(points: np.ndarray, colors: np.ndarray, voxel: float):
    """Average points/colors per voxel (open3d replacement); exact cell
    identity via unique rows (hashes would merge distinct cells)."""
    q = np.floor(points / voxel).astype(np.int64)
    _, inv, counts = np.unique(q, axis=0, return_inverse=True, return_counts=True)
    m = counts.shape[0]
    out_p = np.zeros((m, 3), np.float64)
    out_c = np.zeros((m, 3), np.float64)
    np.add.at(out_p, inv, points)
    np.add.at(out_c, inv, colors)
    return (out_p / counts[:, None]).astype(np.float32), (
        out_c / counts[:, None]
    ).astype(np.float32)
