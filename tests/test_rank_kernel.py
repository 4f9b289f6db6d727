"""Rank kernel (Pallas, interpret mode) vs a python reference: within-tile
ranks count FULL rect membership of earlier depth-sorted Gaussians (matching
the production scan path's mask-cumsum semantics)."""

import numpy as np
import jax.numpy as jnp

from sdpgs_tpu.ops.rasterize.rank_pallas import compute_ranks_pallas


def test_rank_kernel_matches_reference(rng):
    P, D, tiles_x, tiles_y = 512, 4, 16, 16
    T = tiles_x * tiles_y
    xmin = rng.integers(0, 15, P)
    w = rng.integers(1, 3, P)
    ymin = rng.integers(0, 15, P)
    h = rng.integers(1, 3, P)
    xmax = np.minimum(xmin + w, tiles_x)
    ymax = np.minimum(ymin + h, tiles_y)
    valid = rng.random(P) > 0.2
    xmax = np.where(valid, xmax, xmin)
    ymax = np.where(valid, ymax, ymin)
    packed = (xmin | (xmax << 7) | (ymin << 14) | (ymax << 21)).astype(np.int32)

    tid = np.full((P, D), -1, np.int32)
    for p in range(P):
        cnt = 0
        for ty in range(ymin[p], ymax[p]):
            for tx in range(xmin[p], xmax[p]):
                if cnt < D:
                    tid[p, cnt] = ty * tiles_x + tx
                cnt += 1

    rank_k, counts_k = compute_ranks_pallas(
        jnp.asarray(packed), jnp.asarray(tid), T, tiles_x
    )

    cnt = np.zeros(T, np.int64)
    rank_ref = np.zeros((P, D), np.int64)
    for p in range(P):
        for d in range(D):
            if tid[p, d] >= 0:
                rank_ref[p, d] = cnt[tid[p, d]]
        for ty in range(ymin[p], ymax[p]):
            for tx in range(xmin[p], xmax[p]):
                cnt[ty * tiles_x + tx] += 1

    m = tid >= 0
    assert np.array_equal(np.asarray(rank_k)[m], rank_ref[m])
    assert np.array_equal(np.asarray(counts_k), cnt.astype(np.int32))
