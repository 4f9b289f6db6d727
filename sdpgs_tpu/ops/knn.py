"""k-nearest-neighbor ops, replacing the reference's ``simple_knn._C.distCUDA2``
CUDA extension (consumed at reference/scene/gaussian_model.py:198-201 for init
scales and :514-518 for proximity densification, where a modified version also
returns nearest-neighbor indices).

TPU-native design: chunked brute force with the pairwise-distance matrix
expressed as a matmul (``|a|^2 + |b|^2 - 2 a.b``) so the MXU does the work;
``lax.top_k`` extracts the k smallest. O(N^2) flops is fine at the point
counts involved (<=1e6) and is entirely fused by XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def knn(
    points: jnp.ndarray,
    k: int = 3,
    mask: jnp.ndarray | None = None,
    chunk: int = 1024,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """For each point, the k nearest *other* points.

    Args:
      points: [N, 3].
      k: neighbor count (excluding self).
      mask: optional [N] float/bool validity; invalid points are never
        neighbors and get +inf distances.
      chunk: query chunk size (memory/throughput tradeoff).

    Returns:
      (sq_dists [N, k], indices [N, k]) sorted by ascending distance.
    """
    n = points.shape[0]
    pad = (-n) % chunk
    pts = jnp.pad(points, ((0, pad), (0, 0)))
    valid = jnp.ones((n,), jnp.float32) if mask is None else mask.astype(jnp.float32)
    valid = jnp.pad(valid, (0, pad))

    sq_norm = jnp.sum(points * points, axis=-1)  # [N]
    big = jnp.float32(jnp.inf)

    def one_chunk(q):
        q_pts, q_idx = q  # [C,3], [C]
        # [C, N] squared distances via MXU.
        d2 = (
            jnp.sum(q_pts * q_pts, axis=-1, keepdims=True)
            - 2.0 * (q_pts @ points.T)
            + sq_norm[None, :]
        )
        # Exclude self and dead points.
        self_mask = q_idx[:, None] == jnp.arange(n)[None, :]
        d2 = jnp.where(self_mask | (valid[None, :n] == 0.0), big, d2)
        neg_d, idx = jax.lax.top_k(-d2, k)
        return -neg_d, idx

    idxs = jnp.arange(pts.shape[0])
    qp = pts.reshape(-1, chunk, 3)
    qi = idxs.reshape(-1, chunk)
    d2, ind = jax.lax.map(one_chunk, (qp, qi))
    d2 = d2.reshape(-1, k)[:n]
    ind = ind.reshape(-1, k)[:n]
    return jnp.maximum(d2, 0.0), ind


def mean_sq_dist_to_knn(
    points: jnp.ndarray, k: int = 3, mask: jnp.ndarray | None = None
) -> jnp.ndarray:
    """``distCUDA2`` equivalent: mean squared distance to the k nearest
    neighbors, clamped from below like the reference
    (gaussian_model.py:198: ``clamp_min(distCUDA2(...), 1e-7)``)."""
    d2, _ = knn(points, k=k, mask=mask)
    finite = jnp.isfinite(d2)
    d2 = jnp.where(finite, d2, 0.0)
    cnt = jnp.maximum(jnp.sum(finite, axis=-1), 1)
    return jnp.maximum(jnp.sum(d2, axis=-1) / cnt, 1e-7)
