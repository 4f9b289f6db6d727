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


def _write_png(path, H, W, rng, alpha=False):
    from PIL import Image

    c = 4 if alpha else 3
    img = (rng.uniform(size=(H, W, c)) * 255).astype(np.uint8)
    Image.fromarray(img, "RGBA" if alpha else "RGB").save(path)


def make_blender_scene(root, n_train=20, n_test=16, W=32, H=24):
    import json

    rng = np.random.default_rng(1)
    (root / "train").mkdir(parents=True)
    (root / "test").mkdir()

    def frames(split, n):
        out = []
        for i in range(n):
            name = f"r_{i}"
            c2w = np.eye(4)
            c2w[:3, 3] = rng.normal(size=3)
            out.append({"file_path": f"./{split}/{name}",
                        "transform_matrix": c2w.tolist()})
            _write_png(root / split / f"{name}.png", H, W, rng, alpha=True)
        return out

    for split, n in (("train", n_train), ("test", n_test)):
        meta = {"camera_angle_x": 0.7, "frames": frames(split, n)}
        (root / f"transforms_{split}.json").write_text(json.dumps(meta))
    return root


def test_blender_scene_reference_split(tmp_path):
    """Train split = reference's hardcoded indices (dataset_readers.py:835),
    test = every 8th of transforms_test (:854)."""
    from sdpgs_tpu.data.readers import BLENDER_TRAIN_IDX, read_blender_scene

    root = tmp_path / "nerf_synthetic"
    root.mkdir()
    make_blender_scene(root)
    info = read_blender_scene(root, white_background=True, eval=True, n_views=8)

    expect = [f"r_{i}" for i in BLENDER_TRAIN_IDX if i < 20]
    assert [c.image_name for c in info.train_cameras] == expect
    assert [c.image_name for c in info.test_cameras] == ["r_0", "r_8"]
    assert info.train_cameras[0].image.shape == (24, 32, 3)
    assert detect_scene_type(root) == "blender"


def test_mipnerf360_scene(tmp_path):
    """reference readmipnerf360Info (dataset_readers.py:904-963)."""
    import json

    from sdpgs_tpu.data.readers import read_mipnerf360_scene

    root = tmp_path / "m360"
    (root / "images").mkdir(parents=True)
    rng = np.random.default_rng(2)
    W, H = 32, 24
    frames = []
    for i in range(10):
        c2w = np.eye(4)
        c2w[:3, 3] = rng.normal(size=3)
        frames.append({"file_path": f"images/frame_{i:03d}.png",
                       "transform_matrix": c2w.tolist()})
        _write_png(root / "images" / f"frame_{i:03d}.png", H, W, rng, alpha=True)
    (root / "transforms.json").write_text(json.dumps(
        {"fl_x": 30.0, "fl_y": 30.0, "w": W, "h": H, "cx": W / 2, "cy": H / 2,
         "frames": frames}
    ))
    (root / "train_test_split_3.json").write_text(json.dumps(
        {"train_ids": [1, 4, 7], "test_ids": [0, 5]}
    ))

    info = read_mipnerf360_scene(root, eval=True, n_views=3)
    assert [c.image_name for c in info.train_cameras] == [
        "frame_001", "frame_004", "frame_007"]
    assert [c.image_name for c in info.test_cameras] == ["frame_000", "frame_005"]
    assert len(info.points) > 0
    assert detect_scene_type(root) == "mipnerf360"


def test_spiral_render_scene(tmp_path):
    """reference CreateLLFFSpiral (dataset_readers.py:995-1038) +
    RenderScene (scene/__init__.py:212-255)."""
    from sdpgs_tpu.data.readers import read_spiral_scene
    from sdpgs_tpu.data.scene import RenderScene

    root = tmp_path / "llff_scene"
    root.mkdir()
    make_colmap_scene(root)
    # LLFF poses_bounds with plausible c2w poses + (H, W, f) column
    rng = np.random.default_rng(3)
    n = 9
    pb = np.zeros((n, 17))
    for i in range(n):
        c2w = np.eye(4)[:3]
        c2w[:, 3] = [0.2 * i - 1.0, 0.1 * rng.normal(), 0.05 * rng.normal()]
        m = np.concatenate([c2w, np.array([[48.0], [64.0], [60.0]])], axis=1)
        pb[i, :15] = m.reshape(-1)
    pb[:, 15] = 1.0
    pb[:, 16] = 10.0
    np.save(root / "poses_bounds.npy", pb)

    info = read_spiral_scene(root, n_frames=12)
    assert len(info.test_cameras) == 12
    assert info.test_cameras[0].width == 64 and info.test_cameras[0].height == 48
    # valid rotations
    R = info.test_cameras[0].R
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)

    # train briefly to produce a PLY, then RenderScene loads and renders
    cfg = TrainConfig()
    cfg.model.source_path = str(root)
    cfg.model.model_path = str(tmp_path / "out")
    cfg.model.resolution = 2
    cfg.model.language_features_name = "features_dim3"
    cfg.model.nviews = 3
    cfg.model.capacity = 512
    scene = Scene(cfg)
    scene.save(10, scene.gaussians)

    rscene = RenderScene(cfg, load_iteration=10, n_frames=6)
    assert len(rscene.render_cameras) == 6
    assert int(rscene.gaussians.num_alive()) == int(scene.gaussians.num_alive())
    assert rscene.render_cameras[0].width == 32  # /2 resolution divider
