"""Segment-wise alignment of monocular depth to sparse stereo depth — the
"SDP" core (reference conclude.py:57-411).

Per train view:
1. For each segment with >= 20 valid sparse-depth pixels: robust linear fit
   stereo ~ a * mono + b via RANSAC (min_samples=70%, 500 trials, inlier
   threshold = MAD of the targets — sklearn RANSACRegressor defaults used
   by the reference, conclude.py:91).
2. Segments with too few points inherit (a, b) from boundary-adjacent
   segments (largest first), falling back to the global closed-form
   scale-and-shift; then the line with minimum mean residual
   |stereo - a*mono - b| / sqrt(a^2+1) among all known lines wins
   (conclude.py:111-161).
3. The adjusted map is a_seg * mono + b_seg per pixel.
4. No sparse depth at all -> inverted mono (max - mono), conclude.py:67-71.

The RANSAC trials are fully vectorized ([trials, n] matrix ops) instead of
the reference's sklearn loop.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np


def compute_scale_and_shift(x: np.ndarray, y: np.ndarray) -> Tuple[float, float]:
    """Closed-form least squares y ~ a*x + b (reference's missing
    ``compare_llff.compute_scale_and_shift``, re-derived)."""
    x = x.reshape(-1).astype(np.float64)
    y = y.reshape(-1).astype(np.float64)
    n = len(x)
    if n == 0:
        return 1.0, 0.0
    sx, sy = x.sum(), y.sum()
    sxx, sxy = (x * x).sum(), (x * y).sum()
    det = n * sxx - sx * sx
    if abs(det) < 1e-12:
        return 1.0, float(y.mean() - x.mean())
    a = (n * sxy - sx * sy) / det
    b = (sy * sxx - sx * sxy) / det
    return float(a), float(b)


def ransac_line(
    x: np.ndarray,
    y: np.ndarray,
    min_samples_frac: float = 0.7,
    trials: int = 500,
    seed: int = 10,
) -> Tuple[float, float]:
    """Vectorized RANSAC linear regression (reference conclude.py:91:
    RANSACRegressor(min_samples=0.7, max_trials=500, random_state=10))."""
    x = x.reshape(-1).astype(np.float64)
    y = y.reshape(-1).astype(np.float64)
    n = len(x)
    if n < 2:
        return 1.0, 0.0
    m = max(2, int(np.ceil(min_samples_frac * n)))
    rng = np.random.default_rng(seed)
    # [trials, m] random subsets
    idx = np.argsort(rng.random((trials, n)), axis=1)[:, :m]
    xs, ys = x[idx], y[idx]
    sx = xs.sum(1)
    sy = ys.sum(1)
    sxx = (xs * xs).sum(1)
    sxy = (xs * ys).sum(1)
    det = m * sxx - sx * sx
    det = np.where(np.abs(det) < 1e-12, 1e-12, det)
    a = (m * sxy - sx * sy) / det
    b = (sy * sxx - sx * sxy) / det
    # inliers: residual < MAD(y) (sklearn's default residual threshold)
    thresh = np.median(np.abs(y - np.median(y))) + 1e-12
    resid = np.abs(y[None, :] - a[:, None] * x[None, :] - b[:, None])
    inliers = resid < thresh
    best = int(np.argmax(inliers.sum(1)))
    mask = inliers[best]
    if mask.sum() >= 2:
        return compute_scale_and_shift(x[mask], y[mask])
    return float(a[best]), float(b[best])


def _boundary_neighbor_ids(seg: np.ndarray, region: np.ndarray) -> list:
    """Segment ids adjacent to ``region`` (reference get_boundary_pixels,
    conclude.py:18-54 — Sobel + 4-neighborhood, re-derived with shifts)."""
    out = []
    for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        shifted = np.roll(region, (dy, dx), axis=(0, 1))
        # pixels outside the region adjacent to region pixels
        edge = shifted & ~region
        for sid in np.unique(seg[edge]):
            if sid not in out:
                out.append(int(sid))
    return out


def _connected_components(mask: np.ndarray) -> Tuple[np.ndarray, int]:
    """4-connected labeling (cv2.connectedComponents replacement)."""
    labels = np.zeros(mask.shape, np.int32)
    cur = 0
    stack = []
    H, W = mask.shape
    for sy in range(H):
        for sx in range(W):
            if mask[sy, sx] and labels[sy, sx] == 0:
                cur += 1
                stack.append((sy, sx))
                labels[sy, sx] = cur
                while stack:
                    y, x = stack.pop()
                    for ny, nx in ((y - 1, x), (y + 1, x), (y, x - 1), (y, x + 1)):
                        if 0 <= ny < H and 0 <= nx < W and mask[ny, nx] and labels[ny, nx] == 0:
                            labels[ny, nx] = cur
                            stack.append((ny, nx))
    return labels, cur


def align_depth_segments(
    depth_mono: np.ndarray,    # [H, W] monocular depth (already inverted if needed)
    depth_stereo: np.ndarray,  # [H, W] sparse stereo depth, 0 = hole
    seg: np.ndarray,           # [H, W] int segment ids
    robust_num: int = 20,
    min_component_px: int = 1000,
) -> Tuple[np.ndarray, Dict[int, Tuple[float, float]]]:
    """-> (aligned depth map, per-segment (a, b))."""
    valid = depth_stereo > 0
    if valid.sum() == 0:
        adjusted = depth_mono.max() - depth_mono
        return adjusted, {}

    seg_ids = [int(s) for s in np.unique(seg)]
    lines: Dict[int, Tuple[float, float]] = {}

    for sid in seg_ids:
        m = valid & (seg == sid)
        if m.sum() >= robust_num:
            lines[sid] = ransac_line(depth_mono[m], depth_stereo[m])

    total_a, total_b = compute_scale_and_shift(depth_mono[valid], depth_stereo[valid])
    if not lines:
        lines[seg_ids[0] if seg_ids else 0] = (1.0, 0.0)

    for sid in seg_ids:
        if sid in lines:
            continue
        seg_mask = seg == sid
        # neighbor inheritance over large connected components
        from sdpgs_tpu import native

        labels, n_comp = native.connected_components(seg_mask)
        neighbors: list = []
        for lab in range(1, n_comp + 1):
            region = labels == lab
            if region.sum() < min_component_px:
                continue
            neighbors.extend(
                i for i in _boundary_neighbor_ids(seg, region) if i not in neighbors
            )
        neighbors.sort(key=lambda i: (seg == i).sum(), reverse=True)
        for nid in neighbors:
            if nid in lines:
                lines[sid] = lines[nid]
                break
        if sid not in lines:
            lines[sid] = (total_a, total_b)

        m = valid & seg_mask
        if m.sum() > 0:
            # pick the known line with minimal mean residual (conclude.py:150-161)
            dm = depth_mono[m]
            ds = depth_stereo[m]
            best, best_r = lines[sid], np.inf
            for a, b in set(lines.values()):
                r = np.abs(ds - a * dm - b) / np.sqrt(a * a + 1.0)
                if r.mean() < best_r:
                    best_r = r.mean()
                    best = (a, b)
            lines[sid] = best

    adjusted = np.empty_like(depth_mono, dtype=np.float32)
    for sid in seg_ids:
        a, b = lines[sid]
        mask = seg == sid
        adjusted[mask] = a * depth_mono[mask] + b
    return adjusted, lines


def conclude_depth_for_scene(
    scene_path,
    mono_depth_dir: str = "depth_maps_anything",
    seg_dir: Optional[str] = None,
    out_dir: str = "depth_adjust_maps_stereo_anything",
    invert_mono: bool = True,
) -> None:
    """Batch driver over a scene's train views (reference conclude.py:331-411):
    reads per-view mono PFM + sparse stereo depth + seg maps, writes
    ``depth_<name>.npy``."""
    from pathlib import Path

    from sdpgs_tpu.data.readers import read_pfm

    scene_path = Path(scene_path)
    outp = scene_path / out_dir
    outp.mkdir(parents=True, exist_ok=True)
    for pfm in sorted((scene_path / mono_depth_dir).glob("depth_*.pfm")):
        name = pfm.stem.replace("depth_", "")
        mono = read_pfm(pfm).astype(np.float32)
        if invert_mono:
            mono = mono.max() - mono                # conclude.py:350-351
        stereo_path = scene_path / "stereo_depth" / f"depth_{name}.npy"
        stereo = (
            np.load(stereo_path)
            if stereo_path.exists()
            else np.zeros_like(mono)
        )
        if seg_dir is not None:
            seg = np.load(scene_path / seg_dir / f"{name}_s.npy")
            if seg.ndim == 3:
                seg = seg[0]
        else:
            seg = np.zeros_like(mono, dtype=np.int32)
        adjusted, _ = align_depth_segments(mono, stereo, seg.astype(np.int32))
        np.save(outp / f"depth_{name}.npy", adjusted)
