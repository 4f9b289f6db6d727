"""Renderer facade over the tile rasterizer.

Parity with reference/gaussian_renderer/__init__.py: ``render`` (:209-338)
plus the ``render_for_depth`` (:18-95, opacity frozen at 0.95, colors = 1)
and ``render_for_opa`` (:96-181, geometry detached) variants.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from sdpgs_tpu.config import RasterizeConfig
from sdpgs_tpu.core.camera import Camera
from sdpgs_tpu.core.gaussians import Gaussians
from sdpgs_tpu.ops.rasterize import rasterize, RenderOutput


def render(
    cam: Camera,
    g: Gaussians,
    cfg: RasterizeConfig,
    bg: jnp.ndarray,
    active_sh_degree: int,
    scaling_modifier: float = 1.0,
    override_color: Optional[jnp.ndarray] = None,
    override_language: Optional[jnp.ndarray] = None,
    means2d_offset: Optional[jnp.ndarray] = None,
    confidence: Optional[jnp.ndarray] = None,
) -> RenderOutput:
    """Render one view: SH -> RGB (python-side, the reference default
    ``convert_SHs_python=True``), degree-0 normalized language feature,
    extended rasterize."""
    from sdpgs_tpu.ops.rasterize.preprocess_pallas import (
        preprocess_color_applicable,
        preprocess_color_pallas,
    )

    scale = g.get_scaling() * scaling_modifier
    quat = g.get_rotation()
    prep = None
    if override_color is None and preprocess_color_applicable(g.capacity, cfg):
        # fused Pallas preprocess + SH (preprocess_pallas.py): one
        # VMEM-resident pass instead of ~100 short XLA loops (1.24 ms ->
        # sub-0.3 at 131k; the pseudo step pays it twice)
        prep, color = preprocess_color_pallas(
            g.xyz, scale, quat, g.get_features(), g.alive, cam,
            active_sh_degree, near=cfg.near, low_pass=cfg.low_pass,
            interpret=jax.default_backend() != "tpu",
        )
    else:
        color = (
            override_color
            if override_color is not None
            else g.colors_from_sh(cam.cam_pos, active_sh_degree)
        )
    feature = (
        override_language
        if override_language is not None
        else g.language_feature_normalized()
    )
    return rasterize(
        g.xyz,
        None,
        g.get_opacity()[:, 0],
        color,
        feature,
        g.alive,
        cam,
        bg,
        cfg,
        means2d_offset=means2d_offset,
        feature_weight=confidence[:, 0] if confidence is not None else None,
        scale=scale,
        quat=quat,
        prep=prep,
    )


def render_for_depth(
    cam: Camera,
    g: Gaussians,
    cfg: RasterizeConfig,
    bg: jnp.ndarray,
    active_sh_degree: int,
) -> RenderOutput:
    """Depth-only rendering with opacity frozen at 0.95 and white colors
    (reference gaussian_renderer/__init__.py:18-95): geometry gradients only."""
    opacity = jnp.full((g.capacity,), 0.95, jnp.float32) * g.alive
    color = jnp.ones((g.capacity, 3), jnp.float32)
    feature = jax.lax.stop_gradient(g.language_feature_normalized())
    return rasterize(
        g.xyz, None, opacity, color, feature, g.alive, cam, bg, cfg,
        scale=g.get_scaling(), quat=g.get_rotation(),
    )


def render_for_opa(
    cam: Camera,
    g: Gaussians,
    cfg: RasterizeConfig,
    bg: jnp.ndarray,
    active_sh_degree: int,
) -> RenderOutput:
    """Opacity-only rendering with geometry detached
    (reference gaussian_renderer/__init__.py:96-181)."""
    xyz = jax.lax.stop_gradient(g.xyz)
    color = jax.lax.stop_gradient(g.colors_from_sh(cam.cam_pos, active_sh_degree))
    feature = jax.lax.stop_gradient(g.language_feature_normalized())
    return rasterize(
        xyz, None, g.get_opacity()[:, 0], color, feature, g.alive, cam, bg, cfg,
        scale=jax.lax.stop_gradient(g.get_scaling()),
        quat=jax.lax.stop_gradient(g.get_rotation()),
    )
