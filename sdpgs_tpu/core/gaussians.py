"""Gaussian cloud state as a static-capacity masked pytree.

Replaces the reference's ``scene/gaussian_model.py`` GaussianModel (torch
nn.Parameters with shape-changing densify surgery). TPU-first design:

- struct-of-arrays with a fixed ``capacity`` and a float ``alive`` mask;
  densify/clone/split/prune toggle mask entries and overwrite free slots,
  never changing array shapes (so the train step compiles once),
- raw (pre-activation) parameters exactly like the reference: log-scale,
  logit-opacity, unnormalized quaternion (activations at
  reference/scene/gaussian_model.py:26-41),
- dead slots are neutralized by multiplying activated opacity with ``alive``.

Parity notes (reference file:line):
- params: _xyz/_features_dc/_features_rest/_scaling/_rotation/_opacity/
  _language_feature/confidence   (gaussian_model.py:52-65)
- init from point cloud: SH DC from RGB, scale = log(sqrt(mean 3-NN sq dist)),
  identity quat, opacity 0.1 (gaussian_model.py:189-214)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from sdpgs_tpu.core import sh as sh_lib
from sdpgs_tpu.core.transforms import (
    build_covariance_3d,
    covariance_to_symm6,
    inverse_sigmoid,
    normalize_quat,
)


@struct.dataclass
class Gaussians:
    """Trainable Gaussian parameters (raw/pre-activation), fixed capacity P.

    ``alive`` is float32 {0,1}; the number of live Gaussians is
    ``alive.sum()`` (traced). Capacity is static.
    """

    xyz: jnp.ndarray            # [P, 3]
    features_dc: jnp.ndarray    # [P, 1, 3] SH DC coefficients
    features_rest: jnp.ndarray  # [P, (K-1), 3] higher-order SH
    scaling: jnp.ndarray        # [P, 3] log-scale
    rotation: jnp.ndarray       # [P, 4] unnormalized quaternion (w,x,y,z)
    opacity: jnp.ndarray        # [P, 1] logit-opacity
    language_feature: jnp.ndarray  # [P, 3] segment/language feature
    alive: jnp.ndarray          # [P] float mask
    confidence: jnp.ndarray     # [P, 1] per-Gaussian confidence (non-trainable)

    # ---- static metadata ----
    max_sh_degree: int = struct.field(pytree_node=False, default=3)

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    # ---- activations (reference gaussian_model.py:26-41,146-187) ----
    def get_scaling(self) -> jnp.ndarray:
        return jnp.exp(self.scaling)

    def get_rotation(self) -> jnp.ndarray:
        return normalize_quat(self.rotation)

    def get_opacity(self) -> jnp.ndarray:
        """Activated opacity with dead slots forced to zero."""
        return jax.nn.sigmoid(self.opacity) * self.alive[:, None]

    def get_features(self) -> jnp.ndarray:
        """[P, K, 3] full SH coefficient stack."""
        return jnp.concatenate([self.features_dc, self.features_rest], axis=1)

    def get_language_feature(self) -> jnp.ndarray:
        return self.language_feature

    def get_covariance(self, scale_modifier: float = 1.0) -> jnp.ndarray:
        """[P, 6] packed symmetric world covariance."""
        cov = build_covariance_3d(self.get_scaling(), self.get_rotation(), scale_modifier)
        return covariance_to_symm6(cov)

    def num_alive(self) -> jnp.ndarray:
        return jnp.sum(self.alive).astype(jnp.int32)

    def colors_from_sh(self, cam_pos: jnp.ndarray, active_degree: int) -> jnp.ndarray:
        """Per-Gaussian RGB from SH at the given camera position
        (reference gaussian_renderer/__init__.py:269-274)."""
        dirs = self.xyz - cam_pos[None, :]
        dirs = dirs / jnp.sqrt(jnp.sum(dirs * dirs, axis=-1, keepdims=True) + 1e-24)
        rgb = sh_lib.eval_sh(active_degree, self.get_features(), dirs)
        return jnp.maximum(rgb + 0.5, 0.0)

    def language_feature_normalized(self) -> jnp.ndarray:
        """Degree-0 'SH' language feature, normalized
        (reference gaussian_renderer/__init__.py:282-287): the per-Gaussian
        feature is scaled by the SH DC constant and L2-normalized.

        Smooth norm (sqrt(|f|^2 + eps^2)): language features start at exactly
        zero (reference gaussian_model.py:225), where ``jnp.linalg.norm`` has
        a NaN gradient (torch special-cases it to 0)."""
        f = self.language_feature * sh_lib.C0
        norm = jnp.sqrt(jnp.sum(f * f, axis=-1, keepdims=True) + 1e-18)
        return f / (norm + 1e-9)


def create_from_points(
    points: np.ndarray,
    colors: np.ndarray,
    capacity: int,
    max_sh_degree: int = 3,
    features: Optional[np.ndarray] = None,
    init_scale: Optional[np.ndarray] = None,
    initial_opacity: float = 0.1,
) -> Gaussians:
    """Initialize from a point cloud (reference gaussian_model.py:189-214).

    Args:
      points: [N, 3] float positions (N <= capacity).
      colors: [N, 3] float RGB in [0, 1].
      capacity: static slot count P (padding is dead).
      features: optional [N, 3] language features (default zeros-ish).
      init_scale: optional [N] per-point scale (mean sq dist to 3-NN);
        computed with the JAX k-NN op if omitted.
    """
    n = points.shape[0]
    if n > capacity:
        raise ValueError(f"{n} points exceed capacity {capacity}")
    if init_scale is None:
        from sdpgs_tpu.ops.knn import mean_sq_dist_to_knn

        init_scale = np.asarray(
            mean_sq_dist_to_knn(jnp.asarray(points, dtype=jnp.float32), k=3)
        )
    dist2 = np.clip(init_scale, 1e-7, None)
    log_scale = np.log(np.sqrt(dist2))[:, None].repeat(3, axis=1)

    K = sh_lib.num_sh_coeffs(max_sh_degree)

    def pad(a, fill=0.0):
        out = np.full((capacity,) + a.shape[1:], fill, dtype=np.float32)
        out[:n] = a
        return jnp.asarray(out)

    fdc = sh_lib.rgb_to_sh(np.asarray(colors, dtype=np.float32))[:, None, :]
    rot = np.zeros((n, 4), dtype=np.float32)
    rot[:, 0] = 1.0
    opa = np.full((n, 1), float(inverse_sigmoid(jnp.float32(initial_opacity))), np.float32)
    if features is None:
        features = np.zeros((n, 3), dtype=np.float32)

    alive = np.zeros((capacity,), dtype=np.float32)
    alive[:n] = 1.0

    rot_pad = np.zeros((capacity, 4), dtype=np.float32)
    rot_pad[:, 0] = 1.0  # identity quat in dead slots (zero quat has no grad)
    rot_pad[:n] = rot

    return Gaussians(
        xyz=pad(np.asarray(points, np.float32)),
        features_dc=pad(np.asarray(fdc)),
        features_rest=pad(np.zeros((n, K - 1, 3), np.float32)),
        scaling=pad(log_scale, fill=-10.0),
        rotation=jnp.asarray(rot_pad),
        opacity=pad(opa, fill=-10.0),
        language_feature=pad(np.asarray(features, np.float32)),
        alive=jnp.asarray(alive),
        confidence=pad(np.ones((n, 1), np.float32), fill=1.0),
        max_sh_degree=max_sh_degree,
    )


def random_init(
    key: jax.Array,
    num_points: int,
    capacity: int,
    extent: float = 1.3,
    max_sh_degree: int = 3,
) -> Gaussians:
    """Random point-cloud init used when no MVS fusion exists
    (reference dataset_readers.py:540-556: uniform in a scaled box, SH from
    random colors)."""
    kp, kc = jax.random.split(key)
    pts = (jax.random.uniform(kp, (num_points, 3)) * 2.0 - 1.0) * extent
    cols = jax.random.uniform(kc, (num_points, 3))
    return create_from_points(np.asarray(pts), np.asarray(cols), capacity, max_sh_degree)


def prune_mask(g: Gaussians, mask: jnp.ndarray) -> Gaussians:
    """Kill Gaussians where ``mask`` is True (reference prune_points,
    gaussian_model.py:478-499 — here a mask flip instead of re-allocation)."""
    return g.replace(alive=g.alive * (1.0 - mask.astype(jnp.float32)))
