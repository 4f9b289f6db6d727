"""Offline depth-prior pipeline: segment alignment, fusion, metrics harness."""

import json

import numpy as np
import jax.numpy as jnp
import pytest

from sdpgs_tpu.pipelines.depth_align import (
    align_depth_segments,
    compute_scale_and_shift,
    ransac_line,
)
from sdpgs_tpu.pipelines.fusion import (
    check_geometric_consistency,
    fuse_depths,
    reproject_with_depth,
)


def test_scale_and_shift_exact():
    x = np.linspace(1, 10, 50)
    y = 2.5 * x - 1.25
    a, b = compute_scale_and_shift(x, y)
    assert a == pytest.approx(2.5, abs=1e-9)
    assert b == pytest.approx(-1.25, abs=1e-9)


def test_ransac_rejects_outliers(rng):
    x = rng.uniform(1, 10, 300)
    y = 3.0 * x + 2.0
    y[:60] += rng.uniform(20, 50, 60)  # 20% gross outliers
    a, b = ransac_line(x, y)
    assert a == pytest.approx(3.0, rel=0.05)
    assert b == pytest.approx(2.0, abs=0.5)


def test_align_depth_segments(rng):
    H, W = 60, 80
    seg = np.zeros((H, W), np.int32)
    seg[:, 40:] = 1
    mono = rng.uniform(1, 5, (H, W)).astype(np.float32)
    # two segments with different true affine maps
    true = np.where(seg == 0, 2.0 * mono + 1.0, 0.5 * mono + 3.0)
    sparse = np.zeros((H, W), np.float32)
    pick = rng.random((H, W)) < 0.2
    sparse[pick] = true[pick]
    adjusted, lines = align_depth_segments(mono, sparse, seg)
    assert lines[0][0] == pytest.approx(2.0, rel=0.05)
    assert lines[1][0] == pytest.approx(0.5, rel=0.05)
    np.testing.assert_allclose(adjusted, true, rtol=0.05, atol=0.1)


def test_align_no_sparse_falls_back():
    mono = np.linspace(0, 1, 12).reshape(3, 4).astype(np.float32)
    adjusted, lines = align_depth_segments(mono, np.zeros((3, 4), np.float32),
                                           np.zeros((3, 4), np.int32))
    np.testing.assert_allclose(adjusted, mono.max() - mono)


def _lookat_pair():
    K = np.array([[50.0, 0, 32], [0, 50.0, 24], [0, 0, 1]])
    R0, t0 = np.eye(3), np.zeros(3)
    R1, t1 = np.eye(3), np.array([0.2, 0.0, 0.0])
    return K, (R0, t0), (R1, t1)


def test_reprojection_consistency_flat_plane():
    K, (R0, t0), (R1, t1) = _lookat_pair()
    H, W = 48, 64
    d0 = np.full((H, W), 3.0, np.float32)
    d1 = np.full((H, W), 3.0, np.float32)
    mask, dep = check_geometric_consistency(
        jnp.asarray(d0), jnp.asarray(K), jnp.asarray(R0), jnp.asarray(t0),
        jnp.asarray(d1), jnp.asarray(K), jnp.asarray(R1), jnp.asarray(t1),
    )
    # a consistent fronto-parallel plane passes everywhere it projects in-bounds
    assert float(jnp.mean(mask.astype(jnp.float32))) > 0.8
    np.testing.assert_allclose(np.asarray(dep)[np.asarray(mask)], 3.0, atol=1e-3)


def test_fuse_depths_produces_points(rng):
    K, (R0, t0), (R1, t1) = _lookat_pair()
    H, W = 48, 64
    mono = [np.full((H, W), 3.0, np.float32), np.full((H, W), 3.0, np.float32)]
    sparse = [m * (rng.random((H, W)) < 0.3) for m in mono]
    pts, cols = fuse_depths(mono, sparse, [K, K], [R0, R1], [t0, t1])
    assert len(pts) > 1000
    # back-projected plane sits at z=3 in front of view 0
    assert np.abs(pts[:, 2].mean() - 3.0) < 0.2


def test_metrics_dirs(tmp_path, rng):
    from PIL import Image

    from sdpgs_tpu.eval.metrics import evaluate_dirs

    rdir = tmp_path / "renders"
    gdir = tmp_path / "gt"
    rdir.mkdir(), gdir.mkdir()
    for i in range(3):
        img = (rng.uniform(size=(32, 32, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(rdir / f"{i:05d}.png")
        Image.fromarray(img).save(gdir / f"{i:05d}.png")
    res = evaluate_dirs(rdir, gdir)
    assert res["summary"]["PSNR"] > 45  # identical images
    assert res["summary"]["SSIM"] > 0.99
    assert len(res["per_view"]["PSNR"]) == 3


def test_fit_diagnostics_artifacts(tmp_path, rng):
    """conclude.py's fit-diagnostics surface (conclude.py:225-320): per-line
    stats/scatter npz + ransac grid + grayscale previews land on disk."""
    from sdpgs_tpu.pipelines.depth_align import (
        fit_diagnostics,
        save_fit_diagnostics,
    )

    H, W = 60, 80
    seg = np.zeros((H, W), np.int32)
    seg[:, 40:] = 1
    mono = rng.uniform(1, 5, (H, W)).astype(np.float32)
    true = np.where(seg == 0, 2.0 * mono + 1.0, 0.5 * mono + 3.0)
    sparse = np.zeros((H, W), np.float32)
    pick = rng.random((H, W)) < 0.2
    sparse[pick] = true[pick]
    adjusted, lines = align_depth_segments(mono, sparse, seg)

    diag = fit_diagnostics(mono, sparse, seg, lines)
    assert len(diag["lines"]) == 2
    for ln in diag["lines"]:
        assert ln["n_valid"] > 0
        assert ln["mean_residual"] < 0.2
        assert ln["scatter_mono"].shape == ln["scatter_stereo"].shape

    save_fit_diagnostics(diag, mono, sparse, adjusted, seg,
                         tmp_path / "depth_view0")
    loaded = np.load(tmp_path / "depth_view0_diag.npz")
    assert int(loaded["n_lines"]) == 2
    assert loaded["line0_scatter"].shape[0] == 2
    for tag in ("ransac", "stereo", "adjust", "mono"):
        assert (tmp_path / f"depth_view0_{tag}.jpg").exists(), tag
