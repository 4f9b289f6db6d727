"""Per-Gaussian screen-space preprocessing (pure XLA, fully differentiable).

Behavioral parity with reference cuda_rasterizer/forward.cu:74-256
(``computeCov2D`` / ``preprocessCUDA``): EWA 2D covariance with the J*W
Jacobian, 0.3 low-pass dilation, conic inversion, 3-sigma pixel radius, and
near-plane culling at z <= 0.2 (auxiliary.h:139-164).

Everything here is elementwise per Gaussian -> embarrassingly parallel; XLA
fuses it into the surrounding graph, so no Pallas kernel is needed. The
backward pass is JAX autodiff (the reference hand-writes it in
backward.cu:144-396).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from sdpgs_tpu.core.camera import Camera


class Preprocessed(NamedTuple):
    """Per-Gaussian screen-space quantities, all [P, ...]."""

    valid: jnp.ndarray    # [P] bool — survives culling, det != 0, radius > 0
    mean2d: jnp.ndarray   # [P, 2] pixel-space center
    depth: jnp.ndarray    # [P] view-space z
    conic: jnp.ndarray    # [P, 3] inverse 2D covariance (a, b, c)
    radius: jnp.ndarray   # [P] 3-sigma screen radius (pixels, ceil)


def ndc_to_pixel(v: jnp.ndarray, size: int) -> jnp.ndarray:
    """reference auxiliary.h:41-44."""
    return ((v + 1.0) * size - 1.0) * 0.5


def project_points(xyz: jnp.ndarray, cam: Camera) -> tuple[jnp.ndarray, jnp.ndarray]:
    """World points [P,3] -> (pixel xy [P,2], view-space z [P])."""
    ones = jnp.ones_like(xyz[:, :1])
    hom = jnp.concatenate([xyz, ones], axis=-1)
    p_view = hom @ cam.view.T                       # [P, 4]
    p_hom = hom @ cam.full_proj.T                   # [P, 4]
    p_w = 1.0 / (p_hom[:, 3] + 1e-7)
    ndc = p_hom[:, :3] * p_w[:, None]
    xy = jnp.stack(
        [ndc_to_pixel(ndc[:, 0], cam.width), ndc_to_pixel(ndc[:, 1], cam.height)],
        axis=-1,
    )
    return xy, p_view[:, 2]


def ewa_cov2d(
    xyz: jnp.ndarray,
    cov3d: jnp.ndarray,
    cam: Camera,
    low_pass: float = 0.3,
) -> jnp.ndarray:
    """EWA projection of world covariance to 2D screen covariance.

    Args:
      xyz: [P, 3] world means.
      cov3d: [P, 3, 3] world covariance.
      cam: camera.

    Returns [P, 3] packed (cov_xx, cov_xy, cov_yy), with low-pass dilation on
    the diagonal (reference forward.cu:74-113).
    """
    ones = jnp.ones_like(xyz[:, :1])
    t = (jnp.concatenate([xyz, ones], axis=-1) @ cam.view.T)[:, :3]  # view space

    lim_x = 1.3 * cam.tan_fovx
    lim_y = 1.3 * cam.tan_fovy
    # Keep t_z away from 0: culled Gaussians (z <= near) still flow through
    # this math, and a 0/NaN primal would poison gradients of live ones via
    # 0-cotangent * NaN-Jacobian products.
    tz = t[:, 2]
    tz = jnp.where(jnp.abs(tz) < 1e-6, 1e-6, tz)
    tx = jnp.clip(t[:, 0] / tz, -lim_x, lim_x) * tz
    ty = jnp.clip(t[:, 1] / tz, -lim_y, lim_y) * tz

    fx, fy = cam.focal_x, cam.focal_y
    zero = jnp.zeros_like(tz)
    # J: d(pixel)/d(view) Jacobian of the perspective projection, rows = (u, v).
    J = jnp.stack(
        [
            jnp.stack([fx / tz, zero, -(fx * tx) / (tz * tz)], axis=-1),
            jnp.stack([zero, fy / tz, -(fy * ty) / (tz * tz)], axis=-1),
        ],
        axis=-2,
    )  # [P, 2, 3]
    W = cam.view[:3, :3]                            # world -> view rotation
    hi = jax.lax.Precision.HIGHEST
    JW = jnp.einsum("pij,jk->pik", J, W, precision=hi)            # [P, 2, 3]
    cov2d = jnp.einsum("pik,pkl,pjl->pij", JW, cov3d, JW, precision=hi)  # [P, 2, 2]
    return jnp.stack(
        [cov2d[:, 0, 0] + low_pass, cov2d[:, 0, 1], cov2d[:, 1, 1] + low_pass],
        axis=-1,
    )


def preprocess_fused(
    xyz: jnp.ndarray,        # [P, 3]
    scale: jnp.ndarray,      # [P, 3] activated scale
    quat: jnp.ndarray,       # [P, 4] normalized (w, x, y, z)
    cam: Camera,
    alive: jnp.ndarray,
    near: float = 0.2,
    low_pass: float = 0.3,
    scale_modifier: float = 1.0,
) -> Preprocessed:
    """Fully scalar-expanded preprocess: cov3D -> EWA cov2D -> conic ->
    radius without materializing per-Gaussian 3x3 matrices. Batched tiny
    einsums lower terribly on TPU (~12ms/step for cov3d+EWA at 131k
    Gaussians); as ~100 vectorized [P] ops this is bandwidth-bound (<1ms).
    Same math as :func:`preprocess` (forward.cu:74-256)."""
    # world -> view
    V = cam.view
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    tx = V[0, 0] * x + V[0, 1] * y + V[0, 2] * z + V[0, 3]
    ty = V[1, 0] * x + V[1, 1] * y + V[1, 2] * z + V[1, 3]
    tz = V[2, 0] * x + V[2, 1] * y + V[2, 2] * z + V[2, 3]
    depth = tz

    # projection to pixels
    FP = cam.full_proj
    hx = FP[0, 0] * x + FP[0, 1] * y + FP[0, 2] * z + FP[0, 3]
    hy = FP[1, 0] * x + FP[1, 1] * y + FP[1, 2] * z + FP[1, 3]
    hw = FP[3, 0] * x + FP[3, 1] * y + FP[3, 2] * z + FP[3, 3]
    inv_w = 1.0 / (hw + 1e-7)
    mean2d = jnp.stack(
        [
            ndc_to_pixel(hx * inv_w, cam.width),
            ndc_to_pixel(hy * inv_w, cam.height),
        ],
        axis=-1,
    )

    # rotation matrix entries from the quaternion (forward.cu:118-152)
    r, qx, qy, qz = quat[:, 0], quat[:, 1], quat[:, 2], quat[:, 3]
    R00 = 1 - 2 * (qy * qy + qz * qz)
    R01 = 2 * (qx * qy - r * qz)
    R02 = 2 * (qx * qz + r * qy)
    R10 = 2 * (qx * qy + r * qz)
    R11 = 1 - 2 * (qx * qx + qz * qz)
    R12 = 2 * (qy * qz - r * qx)
    R20 = 2 * (qx * qz - r * qy)
    R21 = 2 * (qy * qz + r * qx)
    R22 = 1 - 2 * (qx * qx + qy * qy)
    s0 = scale[:, 0] * scale_modifier
    s1 = scale[:, 1] * scale_modifier
    s2 = scale[:, 2] * scale_modifier

    # A = W @ (R * diag(s)): columns j of R scaled by s_j, rotated to view
    W_ = V[:3, :3]

    def wrow(i):
        return (
            W_[i, 0] * R00 + W_[i, 1] * R10 + W_[i, 2] * R20,
            W_[i, 0] * R01 + W_[i, 1] * R11 + W_[i, 2] * R21,
            W_[i, 0] * R02 + W_[i, 1] * R12 + W_[i, 2] * R22,
        )

    A00, A01, A02 = wrow(0)
    A10, A11, A12 = wrow(1)
    A20, A21, A22 = wrow(2)
    A00, A01, A02 = A00 * s0, A01 * s1, A02 * s2
    A10, A11, A12 = A10 * s0, A11 * s1, A12 * s2
    A20, A21, A22 = A20 * s0, A21 * s1, A22 * s2

    # J @ A with the EWA clamped Jacobian (forward.cu:74-113)
    lim_x = 1.3 * cam.tan_fovx
    lim_y = 1.3 * cam.tan_fovy
    tz_safe = jnp.where(jnp.abs(tz) < 1e-6, 1e-6, tz)
    cx = jnp.clip(tx / tz_safe, -lim_x, lim_x) * tz_safe
    cy = jnp.clip(ty / tz_safe, -lim_y, lim_y) * tz_safe
    fx, fy = cam.focal_x, cam.focal_y
    j00 = fx / tz_safe
    j02 = -(fx * cx) / (tz_safe * tz_safe)
    j11 = fy / tz_safe
    j12 = -(fy * cy) / (tz_safe * tz_safe)
    m00 = j00 * A00 + j02 * A20
    m01 = j00 * A01 + j02 * A21
    m02 = j00 * A02 + j02 * A22
    m10 = j11 * A10 + j12 * A20
    m11 = j11 * A11 + j12 * A21
    m12 = j11 * A12 + j12 * A22

    a = m00 * m00 + m01 * m01 + m02 * m02 + low_pass
    b = m00 * m10 + m01 * m11 + m02 * m12
    c = m10 * m10 + m11 * m11 + m12 * m12 + low_pass

    det = a * c - b * b
    det_safe = jnp.where(det == 0.0, 1.0, det)
    inv_det = 1.0 / det_safe
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)

    mid = 0.5 * (a + c)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(mid + disc, 0.0)))

    valid = (
        (depth > near)
        & (det != 0.0)
        & (radius > 0.0)
        & (alive > 0.0)
        & jnp.isfinite(depth)
    )
    return Preprocessed(
        valid=valid,
        mean2d=mean2d,
        depth=depth,
        conic=conic,
        radius=jnp.where(valid, radius, 0.0),
    )


def preprocess(
    xyz: jnp.ndarray,
    cov3d: jnp.ndarray,
    cam: Camera,
    alive: jnp.ndarray,
    near: float = 0.2,
    low_pass: float = 0.3,
) -> Preprocessed:
    """Cull + project + invert covariance + compute screen radius.

    Parity: forward.cu:155-256.
    """
    mean2d, depth = project_points(xyz, cam)
    cov = ewa_cov2d(xyz, cov3d, cam, low_pass)
    a, b, c = cov[:, 0], cov[:, 1], cov[:, 2]
    det = a * c - b * b
    det_safe = jnp.where(det == 0.0, 1.0, det)
    inv_det = 1.0 / det_safe
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)

    mid = 0.5 * (a + c)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lambda_max = mid + disc
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda_max, 0.0)))

    valid = (
        (depth > near)
        & (det != 0.0)
        & (radius > 0.0)
        & (alive > 0.0)
        & jnp.isfinite(depth)
    )
    return Preprocessed(
        valid=valid,
        mean2d=mean2d,
        depth=depth,
        conic=conic,
        radius=jnp.where(valid, radius, 0.0),
    )
