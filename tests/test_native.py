"""Native library build + parity with the Python fallbacks."""

import struct

import numpy as np
import pytest

from sdpgs_tpu import native
from sdpgs_tpu.data import colmap
from sdpgs_tpu.pipelines.depth_align import _connected_components
from sdpgs_tpu.pipelines.fusion import voxel_downsample as py_voxel


@pytest.fixture(scope="module")
def have_native():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    return True


def _write_points3d(path, n=50, rng=None):
    rng = rng or np.random.default_rng(0)
    xyz = rng.normal(size=(n, 3))
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", n))
        for pid in range(n):
            f.write(struct.pack("<Q", pid))
            f.write(struct.pack("<ddd", *xyz[pid]))
            f.write(struct.pack("<BBB", pid % 256, (pid * 7) % 256, 3))
            f.write(struct.pack("<d", 0.25))
            tl = pid % 3
            f.write(struct.pack("<Q", tl))
            for t in range(tl):
                f.write(struct.pack("<ii", t + 1, pid * 10 + t))
    return xyz


def test_native_points3d_matches_python(tmp_path, have_native):
    path = tmp_path / "points3D.bin"
    xyz = _write_points3d(path)
    nx, nr, ne = native.read_points3d(path)
    px, pr, pe = colmap.read_points3D_binary(path)
    np.testing.assert_allclose(nx, px)
    np.testing.assert_allclose(nr, pr)
    np.testing.assert_allclose(ne, pe)
    np.testing.assert_allclose(nx, xyz)


def test_native_points3d_tracks(tmp_path, have_native):
    path = tmp_path / "points3D.bin"
    _write_points3d(path)
    xyz, rgb, err, obs = native.read_points3d(path, with_tracks=True)
    # point pid has pid % 3 observations with image ids 1..tl
    expect = sum(p % 3 for p in range(50))
    assert obs.shape == (expect, 3)
    assert obs[:, 1].min() >= 1


def test_native_voxel_downsample(have_native, rng):
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    cols = rng.uniform(size=(500, 3)).astype(np.float32)
    np_p, np_c = py_voxel(pts, cols, 0.5)
    na_p, na_c = native.voxel_downsample(pts, cols, 0.5)
    assert len(na_p) == len(np_p)
    # same cell means irrespective of order
    np.testing.assert_allclose(
        np.sort(na_p, axis=0), np.sort(np_p, axis=0), atol=1e-5
    )


def test_native_connected_components(have_native):
    mask = np.zeros((20, 30), bool)
    mask[2:5, 2:6] = True
    mask[10:15, 10:20] = True
    mask[0, 29] = True
    labels_n, n_n = native.connected_components(mask)
    labels_p, n_p = _connected_components(mask)
    assert n_n == n_p == 3
    # same partition up to label permutation
    for lab in range(1, 4):
        cells = labels_n == lab
        ref_lab = labels_p[cells][0]
        assert np.array_equal(cells, labels_p == ref_lab)
