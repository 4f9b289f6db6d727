"""Render CLI internals on a synthetic in-memory scene (CPU/XLA path)."""

import numpy as np
import jax.numpy as jnp

from sdpgs_tpu.cli.render_cli import render_set, turbo_depth
from sdpgs_tpu.config import RasterizeConfig
from sdpgs_tpu.core.camera import Camera
from sdpgs_tpu.core.gaussians import create_from_points
from sdpgs_tpu.data.camera_utils import LoadedCamera


def test_render_set_outputs(tmp_path, rng):
    n = 32
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 0.3 + np.array([0, 0, 3.0])
    g = create_from_points(pts.astype(np.float32),
                           rng.uniform(size=(n, 3)).astype(np.float32), 64,
                           init_scale=np.full(n, 0.01))
    cfg = RasterizeConfig(tile=16, max_per_tile=64, max_tiles_per_gaussian=8,
                          chunk=32, use_pallas=False)
    cams = []
    for i in range(2):
        cam = Camera.create(R=np.eye(3), T=np.array([0.1 * i, 0, 0]),
                            fovx=0.9, fovy=0.7, width=48, height=32)
        cams.append(LoadedCamera(
            camera=cam, R=np.eye(3), T=np.array([0.1 * i, 0, 0]),
            fovx=0.9, fovy=0.7,
            image=rng.uniform(size=(3, 32, 48)).astype(np.float32),
            image_name=f"v{i}",
        ))
    render_set(tmp_path, "test", 7, cams, g, cfg, jnp.zeros(3), 0)

    base = tmp_path / "test" / "ours_7"
    assert (base / "renders" / "00000.png").exists()
    assert (base / "gt" / "00001.png").exists()
    assert (base / "depth" / "depth_00000.npy").exists()
    assert (base / "depth" / "00000.png").exists()
    assert (base / "feature" / "00000.png").exists()
    d = np.load(base / "depth" / "depth_00000.npy")
    assert d.shape == (32, 48)


def test_turbo_depth_range(rng):
    d = rng.uniform(0, 10, (16, 16))
    img = turbo_depth(d)
    assert img.shape == (16, 16, 3)
    assert img.min() >= 0 and img.max() <= 1


def test_train_cli_argv_smoke(tmp_path):
    """The real ``python train.py`` argv surface (a parser bug once broke
    every CLI invocation while Trainer-level tests stayed green)."""
    from test_scene import make_colmap_scene

    from sdpgs_tpu.cli.train_cli import build_parser, main as train_main

    build_parser()  # argparse conflicts raise here

    root = tmp_path / "scene"
    root.mkdir()
    make_colmap_scene(root)
    train_main([
        "-s", str(root), "-m", str(tmp_path / "out"), "-r", "2",
        "-l", "features_dim3", "--capacity", "256", "--iterations", "2",
        "--test_iterations", "-1", "--save_iterations", "2",
        "--checkpoint_iterations", "-1", "--quiet",
        "--densify_grad_threshold", "0.002", "--depth_weight", "0.05",
    ])
    assert (tmp_path / "out" / "point_cloud" / "iteration_2").exists()
