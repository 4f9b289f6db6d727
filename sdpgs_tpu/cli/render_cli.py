"""Render CLI: render train/test sets (+ optional spiral video frames) to
PNG with depth/alpha/feature dumps — reference render.py:27-118."""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def save_png(path, arr):
    from PIL import Image

    Image.fromarray((np.clip(arr, 0, 1) * 255).astype(np.uint8)).save(path)


def turbo_depth(depth: np.ndarray) -> np.ndarray:
    """Simple normalized colormap for depth dumps (reference vis_depth,
    utils/general_utils.py:145-173 uses the turbo map; a perceptually-close
    viridis-style ramp keeps us dependency-free)."""
    d = depth.astype(np.float64)
    lo, hi = np.percentile(d[d > 0], 1) if (d > 0).any() else 0, d.max() or 1
    t = np.clip((d - lo) / max(hi - lo, 1e-9), 0, 1)
    r = np.clip(1.5 - np.abs(2.0 * t - 1.5), 0, 1)
    g = np.clip(1.5 - np.abs(2.0 * t - 1.0), 0, 1)
    b = np.clip(1.5 - np.abs(2.0 * t - 0.5), 0, 1)
    return np.stack([r, g, b], axis=-1)


def render_set(out_root: Path, name: str, iteration: int, cameras, gaussians,
               raster_cfg, bg, sh_degree, save_depth=True, save_feature=True):
    """reference render.py:27-80 output layout."""
    import jax.numpy as jnp

    from sdpgs_tpu.render import render

    base = out_root / name / f"ours_{iteration}"
    rdir = base / "renders"
    gdir = base / "gt"
    ddir = base / "depth"
    fdir = base / "feature"
    for d in (rdir, gdir, ddir, fdir):
        d.mkdir(parents=True, exist_ok=True)

    for idx, cam in enumerate(cameras):
        out = render(cam.camera, gaussians, raster_cfg, bg, sh_degree)
        img = np.asarray(out.color)
        fname = f"{idx:05d}.png"
        save_png(rdir / fname, img)
        if cam.image is not None:
            save_png(gdir / fname, cam.image.transpose(1, 2, 0))
        if save_depth:
            depth = np.asarray(out.depth)
            np.save(ddir / f"depth_{idx:05d}.npy", depth)
            save_png(ddir / fname, turbo_depth(depth))
        if save_feature:
            feat = np.asarray(out.feature)
            save_png(fdir / fname, (feat + 1.0) / 2.0)


def main(argv=None):
    p = argparse.ArgumentParser(description="SDP-GS-TPU rendering")
    p.add_argument("--model_path", "-m", required=True)
    p.add_argument("--iteration", type=int, default=-1)
    p.add_argument("--skip_train", action="store_true")
    p.add_argument("--skip_test", action="store_true")
    p.add_argument("--video", action="store_true", help="spiral path frames")
    p.add_argument(
        "--spiral", action="store_true",
        help="render the RenderScene spiral path built from poses_bounds.npy "
             "of all source views (reference RenderScene/CreateLLFFSpiral)",
    )
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from sdpgs_tpu.config import load_config
    from sdpgs_tpu.data.scene import Scene

    cfg = load_config(Path(args.model_path) / "cfg.json")
    iteration = args.iteration
    if iteration < 0:
        pc = Path(args.model_path) / "point_cloud"
        iters = sorted(int(p.name.split("_")[1]) for p in pc.iterdir())
        iteration = iters[-1]
    scene = Scene(cfg, load_iteration=iteration)
    bg = jnp.ones(3) if cfg.model.white_background else jnp.zeros(3)
    out_root = Path(args.model_path)

    if not args.skip_train:
        render_set(out_root, "train", iteration, scene.train_cameras,
                   scene.gaussians, cfg.raster, bg, cfg.model.sh_degree)
    if not args.skip_test:
        render_set(out_root, "test", iteration, scene.test_cameras,
                   scene.gaussians, cfg.raster, bg, cfg.model.sh_degree)
    if args.video:
        from sdpgs_tpu.core.camera import Camera
        from sdpgs_tpu.data import pose_sampling
        from sdpgs_tpu.render import render as render_fn

        Rs = [c.R for c in scene.train_cameras]
        Ts = [c.T for c in scene.train_cameras]
        bounds = np.stack([c.bounds for c in scene.train_cameras])
        poses = pose_sampling.generate_spiral_path(Rs, Ts, bounds, n_frames=180)
        vdir = out_root / "video" / f"ours_{iteration}"
        vdir.mkdir(parents=True, exist_ok=True)
        ref = scene.train_cameras[0]
        for i, pose in enumerate(poses):
            cam = Camera.create(
                R=pose[:3, :3].T, T=pose[:3, 3], fovx=ref.fovx, fovy=ref.fovy,
                width=ref.width, height=ref.height,
            )
            out = render_fn(cam, scene.gaussians, cfg.raster, bg, cfg.model.sh_degree)
            save_png(vdir / f"{i:05d}.png", np.asarray(out.color))
    if args.spiral:
        from sdpgs_tpu.data.scene import RenderScene
        from sdpgs_tpu.render import render as render_fn

        rscene = RenderScene(cfg, load_iteration=iteration)
        vdir = out_root / "video_spiral" / f"ours_{iteration}"
        vdir.mkdir(parents=True, exist_ok=True)
        brightness = 0.0
        for i, cam in enumerate(rscene.render_cameras):
            out = render_fn(cam.camera, rscene.gaussians, cfg.raster, bg,
                            cfg.model.sh_degree)
            img = np.asarray(out.color)
            brightness = max(brightness, float(img.mean()))
            save_png(vdir / f"{i:05d}.png", img)
        if brightness < 1e-3:
            print(
                "WARNING: every spiral frame is black — poses_bounds.npy is "
                "likely in the wrong convention (LLFF stores c2w columns as "
                "[down, right, back])."
            )
    print("rendering done")


if __name__ == "__main__":
    main()
