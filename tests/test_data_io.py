"""Data-layer I/O: PLY round trips, COLMAP binary parsing on synthesized
files, pose generators' shape/validity."""

import struct

import numpy as np
import jax.numpy as jnp

from sdpgs_tpu.core.gaussians import create_from_points
from sdpgs_tpu.data import colmap
from sdpgs_tpu.data.ply import (
    load_gaussians_ply,
    read_pointcloud_ply,
    save_gaussians_ply,
    write_pointcloud_ply,
)
from sdpgs_tpu.data import pose_sampling


def test_pointcloud_ply_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    cols = rng.uniform(size=(50, 3)).astype(np.float32)
    path = tmp_path / "pc.ply"
    write_pointcloud_ply(path, pts, cols)
    pts2, cols2, normals = read_pointcloud_ply(path)
    np.testing.assert_allclose(pts2, pts, atol=1e-6)
    np.testing.assert_allclose(cols2, cols, atol=1 / 255.0)


def test_gaussians_ply_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(20, 3)).astype(np.float32)
    cols = rng.uniform(size=(20, 3)).astype(np.float32)
    g = create_from_points(pts, cols, 32, init_scale=np.full(20, 0.01))
    g = g.replace(language_feature=jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32)))
    path = tmp_path / "gauss.ply"
    save_gaussians_ply(path, g)
    g2 = load_gaussians_ply(path, capacity=64)
    alive = np.asarray(g2.alive) > 0
    assert alive.sum() == 20
    np.testing.assert_allclose(np.asarray(g2.xyz)[:20], pts, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g2.scaling)[:20], np.asarray(g.scaling)[:20],
                               atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g2.language_feature)[:20],
        np.asarray(g.language_feature)[:20], atol=1e-5,
    )


def _write_colmap_binary(tmp_path, n_cams=2, n_pts=5):
    # cameras.bin
    with open(tmp_path / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", n_cams))
        for cid in range(1, n_cams + 1):
            f.write(struct.pack("<iiQQ", cid, 1, 640, 480))  # PINHOLE
            f.write(struct.pack("<dddd", 500.0, 500.0, 320.0, 240.0))
    # images.bin
    with open(tmp_path / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", n_cams))
        for iid in range(1, n_cams + 1):
            f.write(struct.pack("<i", iid))
            f.write(struct.pack("<dddd", 1.0, 0.0, 0.0, 0.0))
            f.write(struct.pack("<ddd", 0.0, 0.0, float(iid)))
            f.write(struct.pack("<i", iid))
            f.write(f"image{iid:03d}.png".encode() + b"\x00")
            f.write(struct.pack("<Q", 2))
            for k in range(2):
                f.write(struct.pack("<ddq", 10.0 * k, 20.0 * k, k))
    # points3D.bin
    with open(tmp_path / "points3D.bin", "wb") as f:
        f.write(struct.pack("<Q", n_pts))
        for pid in range(n_pts):
            f.write(struct.pack("<Q", pid))
            f.write(struct.pack("<ddd", float(pid), 0.0, 1.0))
            f.write(struct.pack("<BBB", 10, 20, 30))
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ii", 1, pid))


def test_colmap_binary_parsing(tmp_path):
    _write_colmap_binary(tmp_path)
    cams = colmap.read_cameras_binary(tmp_path / "cameras.bin")
    assert cams[1].model == "PINHOLE" and cams[1].width == 640
    imgs = colmap.read_images_binary(tmp_path / "images.bin")
    assert len(imgs) == 2
    assert imgs[1].name == "image001.png"
    assert imgs[1].xys.shape == (2, 2)
    assert imgs[1].point3D_ids.tolist() == [0, 1]
    xyz, rgb, err = colmap.read_points3D_binary(tmp_path / "points3D.bin")
    assert xyz.shape == (5, 3)
    np.testing.assert_allclose(xyz[:, 0], np.arange(5))
    np.testing.assert_allclose(rgb[0], [10, 20, 30])


def test_qvec_roundtrip(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    if q[0] < 0:
        q = -q
    R = colmap.qvec2rotmat(q)
    q2 = colmap.rotmat2qvec(R)
    np.testing.assert_allclose(q2, q, atol=1e-6)


def test_pose_generators_shapes():
    Rs = [np.eye(3) for _ in range(3)]
    Ts = [np.array([0.1 * i, 0.0, -2.0]) for i in range(3)]
    bounds = np.array([[1.0, 10.0]] * 3)
    rng = np.random.default_rng(0)

    for poses in (
        pose_sampling.generate_random_poses_llff(Rs, Ts, bounds, n_poses=10, rng=rng),
        pose_sampling.generate_random_poses_interp(Rs, Ts, n_poses=10, rng=rng),
        pose_sampling.generate_random_poses_360(Rs, Ts, n_poses=10, rng=rng),
        pose_sampling.generate_spiral_path(Rs, Ts, bounds, n_frames=10),
    ):
        assert poses.shape == (10, 4, 4)
        assert np.all(np.isfinite(poses))
        # rotations orthonormal
        R = poses[:, :3, :3]
        eye = np.broadcast_to(np.eye(3), R.shape)
        np.testing.assert_allclose(R @ R.transpose(0, 2, 1), eye, atol=1e-5)
