"""Rotation / scaling / covariance math as vmappable pure functions.

Behavioral parity targets (formulas, not code) in the reference:
- quaternion -> rotation matrix: reference/utils/general_utils.py:88-109 and
  reference cuda_rasterizer/forward.cu:118-152 (``computeCov3D``).
- 3D covariance Sigma = R * diag(s^2) * R^T (the reference builds
  L = R S and Sigma = L L^T; identical result).

All functions operate on single items; batch with ``jax.vmap`` or rely on
broadcasting where noted.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize_quat(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Normalize quaternion(s) [..., 4] stored as (w, x, y, z).

    Smooth norm so the gradient is 0 (not NaN) at q == 0 — dead padding
    slots can carry zero quaternions."""
    return q / jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True) + eps * eps)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion(s) (w, x, y, z) [..., 4] -> rotation matrix [..., 3, 3].

    The caller is responsible for normalization (the reference normalizes in
    the model activation, reference/scene/gaussian_model.py:41, and passes the
    normalized quat to the kernel).
    """
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [1.0 - 2.0 * (y * y + z * z), 2.0 * (x * y - r * z), 2.0 * (x * z + r * y)],
        axis=-1,
    )
    row1 = jnp.stack(
        [2.0 * (x * y + r * z), 1.0 - 2.0 * (x * x + z * z), 2.0 * (y * z - r * x)],
        axis=-1,
    )
    row2 = jnp.stack(
        [2.0 * (x * z - r * y), 2.0 * (y * z + r * x), 1.0 - 2.0 * (x * x + y * y)],
        axis=-1,
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def build_covariance_3d(
    scale: jnp.ndarray, quat: jnp.ndarray, scale_modifier: float = 1.0
) -> jnp.ndarray:
    """World-space covariance [..., 3, 3] from activated scale [..., 3] and
    normalized quaternion [..., 4].

    Sigma = R diag(s^2) R^T  (reference forward.cu:118-152).
    """
    rot = quat_to_rotmat(quat)
    s2 = jnp.square(scale * scale_modifier)
    # R @ diag(s2) @ R^T, batched. Full f32 precision: covariance conditioning
    # feeds the conic inversion, bf16 matmul is too coarse here.
    return jnp.einsum(
        "...ij,...j,...kj->...ik", rot, s2, rot, precision=jax.lax.Precision.HIGHEST
    )


def covariance_to_symm6(cov: jnp.ndarray) -> jnp.ndarray:
    """Pack symmetric [..., 3, 3] covariance into [..., 6] upper triangle
    (xx, xy, xz, yy, yz, zz) — matches the reference's storage order."""
    return jnp.stack(
        [
            cov[..., 0, 0],
            cov[..., 0, 1],
            cov[..., 0, 2],
            cov[..., 1, 1],
            cov[..., 1, 2],
            cov[..., 2, 2],
        ],
        axis=-1,
    )


def symm6_to_covariance(sym: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`covariance_to_symm6`."""
    xx, xy, xz, yy, yz, zz = (sym[..., i] for i in range(6))
    row0 = jnp.stack([xx, xy, xz], axis=-1)
    row1 = jnp.stack([xy, yy, yz], axis=-1)
    row2 = jnp.stack([xz, yz, zz], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def inverse_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    """Logit; reference/utils/general_utils.py:18."""
    return jnp.log(x / (1.0 - x))
