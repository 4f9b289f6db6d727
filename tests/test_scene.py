"""End-to-end Scene construction from a synthetic on-disk COLMAP dataset:
binary model, images, poses_bounds, language features, aligned depth."""

import struct

import numpy as np
import pytest

from sdpgs_tpu.config import TrainConfig
from sdpgs_tpu.data.scene import Scene, detect_scene_type


def make_colmap_scene(root, n_views=9, W=64, H=48):
    from PIL import Image

    rng = np.random.default_rng(0)
    sparse = root / "sparse" / "0"
    sparse.mkdir(parents=True)
    imgdir = root / "images"
    imgdir.mkdir()
    featdir = root / "features_dim3"
    featdir.mkdir()
    depthdir = root / "depth_adjust_maps_stereo"
    depthdir.mkdir()

    # cameras.bin: one shared PINHOLE camera
    with open(sparse / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, W, H))
        f.write(struct.pack("<dddd", 60.0, 60.0, W / 2, H / 2))

    # images.bin: n_views cameras in a row, named image000..image008
    with open(sparse / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", n_views))
        for i in range(n_views):
            f.write(struct.pack("<i", i + 1))
            f.write(struct.pack("<dddd", 1.0, 0.0, 0.0, 0.0))
            f.write(struct.pack("<ddd", 0.1 * i, 0.0, 0.0))
            f.write(struct.pack("<i", 1))
            f.write(f"image{i:03d}.png".encode() + b"\x00")
            f.write(struct.pack("<Q", 0))

    # points3D.bin: small random cloud
    n_pts = 200
    with open(sparse / "points3D.bin", "wb") as f:
        f.write(struct.pack("<Q", n_pts))
        for pid in range(n_pts):
            f.write(struct.pack("<Q", pid))
            f.write(struct.pack("<ddd", *(rng.normal(size=3) + [0, 0, 3])))
            f.write(struct.pack("<BBB", 100, 120, 140))
            f.write(struct.pack("<d", 0.3))
            f.write(struct.pack("<Q", 0))

    bounds = np.zeros((n_views, 17))
    bounds[:, -2] = 1.0
    bounds[:, -1] = 10.0
    np.save(root / "poses_bounds.npy", bounds)

    for i in range(n_views):
        img = (rng.uniform(size=(H, W, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(imgdir / f"image{i:03d}.png")
        # features for every view (only train views will load them)
        seg = rng.integers(0, 3, (H, W)).astype(np.int64)
        np.save(featdir / f"image{i:03d}_s.npy", seg)
        np.save(featdir / f"image{i:03d}_fdim3.npy",
                rng.normal(size=(3, 3)).astype(np.float32))
        np.save(depthdir / f"depth_image{i:03d}.npy",
                rng.uniform(1, 5, (H, W)).astype(np.float32))
    return root


def test_scene_from_colmap(tmp_path):
    root = tmp_path / "llff_scene"
    root.mkdir()
    make_colmap_scene(root)
    assert detect_scene_type(root) == "colmap"

    cfg = TrainConfig()
    cfg.model.source_path = str(root)
    cfg.model.model_path = str(tmp_path / "out")
    cfg.model.resolution = 2
    cfg.model.language_features_name = "features_dim3"
    cfg.model.nviews = 3
    cfg.model.capacity = 512
    scene = Scene(cfg)

    assert len(scene.train_cameras) == 3
    # llffhold=8: views 0 and 8 are test
    assert len(scene.test_cameras) == 2
    c = scene.train_cameras[0]
    assert c.width == 32 and c.height == 24
    assert c.image.shape == (3, 24, 32)
    assert c.depth_mono.shape == (24, 32)
    assert c.seg_map is not None and c.point_feature is not None
    assert scene.prototypes.shape[1] == 3
    assert scene.pseudo_poses.shape[1:] == (4, 4)
    # no fused.ply -> random-cloud fallback sized from the sparse bbox
    n_alive = int(scene.gaussians.num_alive())
    assert 0 < n_alive <= 512
    assert scene.cameras_extent > 0

    # provenance written
    assert (tmp_path / "out" / "cameras.json").exists()

    # pseudo camera builds
    cam, R, T = scene.pseudo_camera(0)
    assert cam.width == 32

    # save/load PLY round trip through Scene
    scene.save(10, scene.gaussians)
    scene2 = Scene(cfg, load_iteration=10)
    assert int(scene2.gaussians.num_alive()) == n_alive
