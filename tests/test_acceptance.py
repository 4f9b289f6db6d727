"""Full-pipeline synthetic acceptance rig (VERDICT r1 missing #1).

Stands in for the reference's real-data protocol
(run_llff_mvs.sh:1-40 -> train.py -> render.py -> metrics.py) until
datasets exist: builds a complete miniature LLFF-style scene ON DISK whose
images are consistent renders of a ground-truth splat cloud (COLMAP
binaries, poses_bounds.npy, PNG images, *_s.npy/*_fdim3.npy language
features, PFM mono depth, sparse stereo depth), then drives the REAL CLIs
through every phase:

  1. conclude (SDP depth alignment: PFM mono + sparse stereo -> adjusted
     per-view depth + fit diagnostics)
  2. train.py CLI: densification window + the pseudo window with a
     random-weight DPT (architecture-faithful tiny-hybrid) in the loss +
     eval reports + checkpoint + PLY save
  3. render.py CLI: train/test renders + depth/feature dumps
  4. metrics.py CLI: per-method results.json

asserting PSNR improves while fitting and that every artifact lands.
"""

import json
import struct

import numpy as np
import jax.numpy as jnp
import pytest

from sdpgs_tpu.config import RasterizeConfig
from sdpgs_tpu.core.camera import Camera
from sdpgs_tpu.core.gaussians import create_from_points
from sdpgs_tpu.render import render


W, H = 64, 48
FOCAL = 60.0
N_VIEWS = 9


def _gt_cloud(rng, n=96):
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 0.5 + np.array(
        [0, 0, 3.0], np.float32
    )
    cols = rng.uniform(0.1, 0.9, size=(n, 3)).astype(np.float32)
    return pts, cols, create_from_points(
        pts, cols, n, init_scale=np.full(n, 0.02), initial_opacity=0.9
    )


def make_full_scene(root, rng):
    """Miniature LLFF scene whose images ARE renders of a GT cloud, with
    every auxiliary input the reference pipeline consumes."""
    from PIL import Image

    from sdpgs_tpu.data.readers import write_pfm

    fovx = 2 * np.arctan(W / (2 * FOCAL))
    fovy = 2 * np.arctan(H / (2 * FOCAL))
    pts, cols, gt = _gt_cloud(rng)
    cfg = RasterizeConfig(tile=16, max_per_tile=128, max_tiles_per_gaussian=8,
                          chunk=32, use_pallas=False)

    sparse = root / "sparse" / "0"
    sparse.mkdir(parents=True)
    for d in ("images", "features_dim3", "depth_maps_anything", "stereo_depth"):
        (root / d).mkdir()

    with open(sparse / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, W, H))
        f.write(struct.pack("<dddd", FOCAL, FOCAL, W / 2, H / 2))

    with open(sparse / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", N_VIEWS))
        for i in range(N_VIEWS):
            f.write(struct.pack("<i", i + 1))
            f.write(struct.pack("<dddd", 1.0, 0.0, 0.0, 0.0))  # identity quat
            f.write(struct.pack("<ddd", 0.08 * i - 0.32, 0.0, 0.0))
            f.write(struct.pack("<i", 1))
            f.write(f"image{i:03d}.png".encode() + b"\x00")
            f.write(struct.pack("<Q", 0))

    with open(sparse / "points3D.bin", "wb") as f:
        f.write(struct.pack("<Q", len(pts)))
        for pid, (p, c) in enumerate(zip(pts, cols)):
            f.write(struct.pack("<Q", pid))
            f.write(struct.pack("<ddd", *p.astype(np.float64)))
            f.write(struct.pack("<BBB", *(c * 255).astype(np.uint8)))
            f.write(struct.pack("<d", 0.3))
            f.write(struct.pack("<Q", 0))

    bounds = np.zeros((N_VIEWS, 17))
    bounds[:, -2] = 1.0
    bounds[:, -1] = 10.0
    np.save(root / "poses_bounds.npy", bounds)

    for i in range(N_VIEWS):
        T = np.array([0.08 * i - 0.32, 0.0, 0.0])
        cam = Camera.create(R=np.eye(3), T=T, fovx=fovx, fovy=fovy,
                            width=W, height=H)
        out = render(cam, gt, cfg, jnp.zeros(3), 0)
        img = np.clip(np.asarray(out.color), 0, 1)
        Image.fromarray((img * 255).astype(np.uint8)).save(
            root / "images" / f"image{i:03d}.png"
        )
        depth = np.asarray(out.depth)
        # mono depth: inverted (disparity-like), as a DPT would produce —
        # conclude re-inverts and RANSAC-aligns it to the sparse stereo
        write_pfm(root / "depth_maps_anything" / f"depth_image{i:03d}.pfm",
                  depth.max() + 0.5 - depth)
        stereo = np.where(rng.random(depth.shape) < 0.3, depth, 0.0)
        np.save(root / "stereo_depth" / f"depth_image{i:03d}.npy",
                stereo.astype(np.float32))
        # 2-segment map (left/right) + per-segment feature dictionary
        seg = np.zeros((H, W), np.int64)
        seg[:, W // 2:] = 1
        np.save(root / "features_dim3" / f"image{i:03d}_s.npy", seg)
        np.save(root / "features_dim3" / f"image{i:03d}_fdim3.npy",
                np.asarray([[0.8, 0.1, 0.1], [0.1, 0.1, 0.8]], np.float32))
    return root


@pytest.mark.slow
def test_full_pipeline_acceptance(tmp_path):
    rng = np.random.default_rng(7)
    root = tmp_path / "scene"
    root.mkdir()
    make_full_scene(root, rng)
    out = tmp_path / "out"

    # --- 1. SDP depth alignment (conclude.py role) -----------------------
    from sdpgs_tpu.pipelines.depth_align import conclude_depth_for_scene

    conclude_depth_for_scene(
        root, mono_depth_dir="depth_maps_anything", seg_dir="features_dim3",
        out_dir="depth_adjust_maps_stereo", diagnostics=True,
    )
    adj = np.load(root / "depth_adjust_maps_stereo" / "depth_image001.npy")
    assert adj.shape == (H, W) and np.all(np.isfinite(adj))
    assert (root / "depth_adjust_maps_stereo" / "depth_image001_diag.npz").exists()
    # alignment recovered metric depth from the inverted mono map
    stereo = np.load(root / "stereo_depth" / "depth_image001.npy")
    m = stereo > 0
    assert np.abs(adj[m] - stereo[m]).mean() < 0.15

    # --- 2. random-weight DPT (architecture-faithful) --------------------
    from sdpgs_tpu.models.dpt import DPTArch, random_params, save_params

    dpt_path = tmp_path / "dpt_tiny_hybrid.npz"
    save_params(dpt_path, random_params(DPTArch.tiny_hybrid(), seed=3),
                DPTArch.tiny_hybrid())

    # --- 3. the real train.py CLI through ALL phases ---------------------
    from sdpgs_tpu.cli.train_cli import main as train_main

    train_main([
        "-s", str(root), "-m", str(out), "-r", "2", "-l", "features_dim3",
        "--capacity", "512", "--iterations", "60", "--seed", "0",
        "--test_iterations", "5", "30", "60",
        "--save_iterations", "60", "--checkpoint_iterations", "60",
        "--dpt_weights", str(dpt_path),
        "--densify_from_iter", "10", "--densification_interval", "20",
        "--densify_until_iter", "50", "--proximity_until_iter", "25",
        "--prune_from_iter", "10",
        "--start_sample_pseudo", "30", "--end_sample_pseudo", "56",
        "--sample_pseudo_interval", "1", "--opacity_reset_interval", "3000",
    ])

    assert (out / "cfg.json").exists()
    assert (out / "point_cloud" / "iteration_60" / "point_cloud.ply").exists()
    assert (out / "checkpoints" / "ckpt_60").exists()

    hist = json.loads((out / "training_history.json").read_text())
    assert hist[-1]["iter"] == 60
    assert all(np.isfinite(h["loss"]) for h in hist)

    evals = json.loads((out / "eval_results.json").read_text())
    assert [e["iteration"] for e in evals] == [5, 30, 60]
    for e in evals:
        for split in ("test", "train"):
            assert np.isfinite(e[split]["psnr"]) and e[split]["ssim"] <= 1.0
    # PSNR improves while fitting (pre-opacity-reset window: the scheduled
    # reset at start_sample_pseudo+1 clamps all opacities by design,
    # reference train.py:234-236, so 60 can sit below 30)
    assert evals[1]["train"]["psnr"] > evals[0]["train"]["psnr"] + 1.0, evals

    # --- 4. render CLI ---------------------------------------------------
    from sdpgs_tpu.cli.render_cli import main as render_main

    render_main(["-m", str(out), "--iteration", "60"])
    for split in ("train", "test"):
        base = out / split / "ours_60"
        assert (base / "renders" / "00000.png").exists(), split
        assert (base / "gt" / "00000.png").exists(), split
        assert (base / "depth" / "depth_00000.npy").exists(), split

    # --- 5. metrics CLI --------------------------------------------------
    from sdpgs_tpu.cli.metrics_cli import main as metrics_main

    metrics_main(["-m", str(out)])
    results = json.loads((out / "results.json").read_text())
    method = results["ours_60"]
    assert np.isfinite(method["PSNR"]) and 0.0 <= method["SSIM"] <= 1.0
