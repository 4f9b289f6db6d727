"""Displacement-window z-buffer kernel vs the XLA scatter-min golden
(losses/depth.py:warp_depth_to_view — itself torch-parity-tested)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402


@pytest.fixture
def rig(rng):
    H, W = 48, 64
    V, B = 3, 4
    K = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]], np.float32)
    depths = rng.uniform(2.0, 6.0, size=(V, H, W)).astype(np.float32)
    depths[0, :4, :4] = 0.0          # holes in the source
    R_t = np.stack([np.eye(3, dtype=np.float32)] * V)
    t_t = np.stack([np.array([0.2 * (i - 1), 0.0, 0.0], np.float32)
                    for i in range(V)])
    R_p = np.stack([np.eye(3, dtype=np.float32)] * B)
    t_p = np.stack([np.array([0.05 * i, 0.02 * i, 0.01], np.float32)
                    for i in range(B)])
    return K, depths, R_t, t_t, R_p, t_p


def test_zbuffer_kernel_matches_scatter(rig):
    from sdpgs_tpu.losses.depth import warp_depth_to_view
    from sdpgs_tpu.ops.warp_pallas import warp_zbuffer_batch

    K, depths, R_t, t_t, R_p, t_p = (jnp.asarray(a) for a in rig)
    got, outl = warp_zbuffer_batch(
        depths, K, R_t, t_t, R_p, t_p, interpret=True
    )
    assert np.all(np.asarray(outl) == 0), np.asarray(outl)
    for b in range(R_p.shape[0]):
        for v in range(depths.shape[0]):
            ref = warp_depth_to_view(
                depths[v], K, R_t[v], t_t[v], R_p[b], t_p[b]
            )
            np.testing.assert_array_equal(
                np.asarray(got[b, v]), np.asarray(ref),
                err_msg=f"pair b={b} v={v}",
            )


def test_zbuffer_kernel_counts_outliers(rng):
    """A baseline big enough to push displacements past the static window
    (while still landing in-frame: needs W > DU) must be COUNTED (the
    caller falls back to the XLA path), not silently wrong."""
    from sdpgs_tpu.ops.warp_pallas import DU, warp_zbuffer_batch

    H, W = 32, 256
    K = jnp.asarray(np.array(
        [[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]], np.float32))
    depths = jnp.asarray(
        rng.uniform(2.0, 6.0, size=(1, H, W)).astype(np.float32))
    R = jnp.asarray(np.eye(3, dtype=np.float32)[None])
    # du ~ fx * bx / z = 60*8/z in [80, 240]: rows with z < 5 exceed DU=96
    # and x small enough keeps u in-frame
    t_far = jnp.asarray(np.array([[8.0, 0.0, 0.0]], np.float32))
    got, outl = warp_zbuffer_batch(
        depths, K, R, jnp.zeros((1, 3)), R, t_far, interpret=True,
    )
    assert int(outl[0]) > 0
    assert DU < 240


def test_reproject_batch_matches_unbatched(rig):
    """The batched fused-reprojection entry point (kernel path on
    TPU/interpret, scatter elsewhere) reproduces reproject_fused_depth."""
    from sdpgs_tpu.losses.depth import (
        reproject_fused_depth,
        reproject_fused_depth_batch,
    )

    K, depths, R_t, t_t, R_p, t_p = (jnp.asarray(a) for a in rig)
    fused_b, w_b, outl = reproject_fused_depth_batch(
        depths, K, R_t, t_t, R_p, t_p, interpret=True
    )
    assert np.all(np.asarray(outl) == 0)
    for b in range(R_p.shape[0]):
        fused, w = reproject_fused_depth(
            depths, K, R_t, t_t, R_p[b], t_p[b]
        )
        np.testing.assert_allclose(
            np.asarray(fused_b[b]), np.asarray(fused), rtol=1e-6, atol=1e-6
        )
        np.testing.assert_array_equal(np.asarray(w_b[b]), np.asarray(w))
