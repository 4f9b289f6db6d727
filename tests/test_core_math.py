"""Unit tests for core math vs hand-computed / numpy-reference values
(SURVEY.md §4 test strategy item 1)."""

import jax
import jax.numpy as jnp
import numpy as np

from sdpgs_tpu.core import sh as sh_lib
from sdpgs_tpu.core.camera import Camera, projection_matrix, world_to_view_matrix
from sdpgs_tpu.core.transforms import (
    build_covariance_3d,
    covariance_to_symm6,
    normalize_quat,
    quat_to_rotmat,
    symm6_to_covariance,
)


def test_quat_identity():
    q = jnp.array([1.0, 0.0, 0.0, 0.0])
    np.testing.assert_allclose(quat_to_rotmat(q), np.eye(3), atol=1e-6)


def test_quat_axis_rotations(rng):
    # 90 deg about z: w = cos(45), z = sin(45)
    s = np.sqrt(0.5)
    q = jnp.array([s, 0.0, 0.0, s])
    R = np.asarray(quat_to_rotmat(q))
    expected = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    np.testing.assert_allclose(R, expected, atol=1e-6)


def test_quat_orthonormal(rng):
    q = normalize_quat(jnp.asarray(rng.normal(size=(64, 4)), dtype=jnp.float32))
    R = np.asarray(quat_to_rotmat(q))
    eye = np.broadcast_to(np.eye(3), R.shape)
    np.testing.assert_allclose(R @ R.transpose(0, 2, 1), eye, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_cov3d_isotropic():
    scale = jnp.array([[2.0, 2.0, 2.0]])
    quat = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    cov = build_covariance_3d(scale, quat)
    np.testing.assert_allclose(cov[0], 4.0 * np.eye(3), atol=1e-6)


def test_cov3d_rotation_invariance(rng):
    """Isotropic covariance is invariant under any rotation."""
    q = normalize_quat(jnp.asarray(rng.normal(size=(8, 4)), dtype=jnp.float32))
    scale = jnp.full((8, 3), 1.7)
    cov = np.asarray(build_covariance_3d(scale, q))
    np.testing.assert_allclose(cov, np.broadcast_to(1.7**2 * np.eye(3), cov.shape), atol=1e-5)


def test_cov3d_matches_numpy(rng):
    scale = jnp.asarray(np.abs(rng.normal(size=(16, 3))) + 0.1, dtype=jnp.float32)
    quat = normalize_quat(jnp.asarray(rng.normal(size=(16, 4)), dtype=jnp.float32))
    cov = np.asarray(build_covariance_3d(scale, quat))
    R = np.asarray(quat_to_rotmat(quat))
    expected = R @ (np.asarray(scale)[:, :, None] ** 2 * np.transpose(R, (0, 2, 1)))
    np.testing.assert_allclose(cov, expected, atol=1e-4)
    # symmetric pack round trip
    packed = covariance_to_symm6(jnp.asarray(cov))
    np.testing.assert_allclose(np.asarray(symm6_to_covariance(packed)), cov, atol=1e-6)


def test_sh_degree0_constant():
    sh = jnp.zeros((5, 16, 3)).at[:, 0, :].set(1.0)
    dirs = jnp.asarray(np.random.default_rng(1).normal(size=(5, 3)), dtype=jnp.float32)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    out = sh_lib.eval_sh(3, sh, dirs)
    np.testing.assert_allclose(out, sh_lib.C0, atol=1e-6)


def test_sh_rgb_roundtrip(rng):
    rgb = jnp.asarray(rng.uniform(size=(10, 3)), dtype=jnp.float32)
    np.testing.assert_allclose(sh_lib.sh_to_rgb(sh_lib.rgb_to_sh(rgb)), rgb, atol=1e-6)


def test_sh_parseval(rng):
    """Band-1 SH at +x/-x directions are antisymmetric."""
    sh = jnp.zeros((1, 4, 1)).at[0, 3, 0].set(1.0)  # the 'x' band coefficient
    plus = sh_lib.eval_sh(1, sh, jnp.array([[1.0, 0.0, 0.0]]))
    minus = sh_lib.eval_sh(1, sh, jnp.array([[-1.0, 0.0, 0.0]]))
    np.testing.assert_allclose(plus, -minus, atol=1e-6)
    np.testing.assert_allclose(plus[0, 0], -sh_lib.C1, atol=1e-6)


def test_world_to_view_identity():
    V = world_to_view_matrix(np.eye(3), np.zeros(3))
    np.testing.assert_allclose(V, np.eye(4), atol=1e-6)


def test_camera_center_projection():
    """A point straight ahead of the camera projects to the image center."""
    cam = Camera.create(
        R=np.eye(3), T=np.zeros(3), fovx=1.0, fovy=1.0, width=64, height=48
    )
    from sdpgs_tpu.ops.rasterize.preprocess import project_points

    xy, z = project_points(jnp.array([[0.0, 0.0, 5.0]]), cam)
    np.testing.assert_allclose(z[0], 5.0, atol=1e-5)
    np.testing.assert_allclose(xy[0], [63 / 2.0, 47 / 2.0], atol=1e-3)


def test_projection_depth_range():
    P = projection_matrix(0.01, 100.0, 1.0, 1.0)
    for z, expected in [(0.01, 0.0), (100.0, 1.0)]:
        v = P @ np.array([0.0, 0.0, z, 1.0])
        np.testing.assert_allclose(v[2] / v[3], expected, atol=1e-5)


def test_offcenter_projection_matches_pinhole():
    """Projection through the full 3DGS matrix chain matches simple pinhole."""
    rng = np.random.default_rng(2)
    cam = Camera.create(
        R=np.eye(3), T=np.array([0.1, -0.2, 0.3]), fovx=0.9, fovy=0.7,
        width=120, height=90,
    )
    from sdpgs_tpu.ops.rasterize.preprocess import project_points

    pts = rng.normal(size=(20, 3)) * 0.5 + np.array([0, 0, 4.0])
    xy, z = project_points(jnp.asarray(pts, dtype=jnp.float32), cam)
    V = np.asarray(cam.view)
    pv = (V[:3, :3] @ pts.T).T + V[:3, 3]
    fx, fy = float(cam.focal_x), float(cam.focal_y)
    u = pv[:, 0] / pv[:, 2] * fx + (120 - 1) / 2.0
    v = pv[:, 1] / pv[:, 2] * fy + (90 - 1) / 2.0
    np.testing.assert_allclose(np.asarray(z), pv[:, 2], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(xy)[:, 0], u, rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(np.asarray(xy)[:, 1], v, rtol=1e-3, atol=1e-2)
