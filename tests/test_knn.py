import jax.numpy as jnp
import numpy as np

from sdpgs_tpu.ops.knn import knn, mean_sq_dist_to_knn


def brute_force_knn(pts, k):
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    idx = np.argsort(d2, axis=1)[:, :k]
    return np.take_along_axis(d2, idx, axis=1), idx


def test_knn_matches_bruteforce(rng):
    pts = rng.normal(size=(300, 3)).astype(np.float32)
    d2, idx = knn(jnp.asarray(pts), k=3, chunk=64)
    ref_d2, ref_idx = brute_force_knn(pts, 3)
    np.testing.assert_allclose(np.asarray(d2), ref_d2, rtol=1e-3, atol=1e-4)
    # indices can differ on ties; distances are the contract
    np.testing.assert_allclose(
        np.sort(np.asarray(d2), axis=1), np.sort(ref_d2, axis=1), rtol=1e-3, atol=1e-4
    )


def test_knn_respects_mask(rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    mask = np.ones(100, np.float32)
    mask[50:] = 0.0
    d2, idx = knn(jnp.asarray(pts), k=3, mask=jnp.asarray(mask), chunk=50)
    assert np.all(np.asarray(idx)[:50] < 50)


def test_mean_sq_dist(rng):
    pts = rng.normal(size=(128, 3)).astype(np.float32)
    out = np.asarray(mean_sq_dist_to_knn(jnp.asarray(pts), k=3))
    ref_d2, _ = brute_force_knn(pts, 3)
    np.testing.assert_allclose(out, np.maximum(ref_d2.mean(1), 1e-7), rtol=1e-3)
    assert np.all(out >= 1e-7)
