"""Fused Pallas preprocess+SH kernel vs the XLA golden path
(preprocess_fused + colors_from_sh), values AND gradients."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402


@pytest.fixture
def inputs(rng):
    from sdpgs_tpu.core.camera import Camera

    P = 512
    xyz = rng.normal(size=(P, 3)).astype(np.float32) * 0.5 + [0, 0, 3.0]
    scale = rng.uniform(0.01, 0.1, size=(P, 3)).astype(np.float32)
    quat = rng.normal(size=(P, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    features = rng.normal(size=(P, 16, 3)).astype(np.float32) * 0.3
    alive = (rng.random(P) > 0.1).astype(np.float32)
    # a few behind-camera / dead points exercise culling
    xyz[:5, 2] = -1.0
    cam = Camera.create(R=np.eye(3), T=np.array([0.05, -0.02, 0.0]),
                        fovx=0.9, fovy=0.7, width=96, height=64)
    return (jnp.asarray(xyz), jnp.asarray(scale), jnp.asarray(quat),
            jnp.asarray(features), jnp.asarray(alive), cam)


@pytest.mark.parametrize("deg", [0, 1, 3])
def test_fused_kernel_matches_golden(inputs, deg):
    from sdpgs_tpu.core.gaussians import Gaussians
    from sdpgs_tpu.core import sh as sh_lib
    from sdpgs_tpu.ops.rasterize.preprocess import preprocess_fused
    from sdpgs_tpu.ops.rasterize.preprocess_pallas import (
        preprocess_color_pallas,
    )

    xyz, scale, quat, features, alive, cam = inputs
    prep, color = preprocess_color_pallas(
        xyz, scale, quat, features, alive, cam, deg, interpret=True
    )
    ref = preprocess_fused(xyz, scale, quat, cam, alive)
    dirs = xyz - cam.cam_pos[None, :]
    dirs = dirs / jnp.sqrt(jnp.sum(dirs * dirs, -1, keepdims=True) + 1e-24)
    ref_color = jnp.maximum(
        sh_lib.eval_sh(deg, features, dirs) + 0.5, 0.0
    )
    np.testing.assert_array_equal(np.asarray(prep.valid), np.asarray(ref.valid))
    for name in ("mean2d", "depth", "conic", "radius"):
        np.testing.assert_allclose(
            np.asarray(getattr(prep, name)), np.asarray(getattr(ref, name)),
            rtol=2e-5, atol=2e-5, err_msg=name)
    np.testing.assert_allclose(
        np.asarray(color), np.asarray(ref_color), rtol=2e-5, atol=2e-5)


def test_fused_kernel_gradients_match(inputs):
    from sdpgs_tpu.core import sh as sh_lib
    from sdpgs_tpu.ops.rasterize.preprocess import preprocess_fused
    from sdpgs_tpu.ops.rasterize.preprocess_pallas import (
        preprocess_color_pallas,
    )

    xyz, scale, quat, features, alive, cam = inputs
    rngw = np.random.default_rng(0)
    P = xyz.shape[0]
    w2 = jnp.asarray(rngw.normal(size=(P, 2)).astype(np.float32))
    w3 = jnp.asarray(rngw.normal(size=(P, 3)).astype(np.float32))
    w1 = jnp.asarray(rngw.normal(size=(P,)).astype(np.float32))

    def loss_kernel(xyz, scale, quat, features):
        prep, color = preprocess_color_pallas(
            xyz, scale, quat, features, alive, cam, 3, interpret=True
        )
        return (jnp.sum(prep.mean2d * w2) + jnp.sum(prep.conic * w3)
                + jnp.sum(prep.depth * w1) + jnp.sum(color * w3))

    def loss_ref(xyz, scale, quat, features):
        prep = preprocess_fused(xyz, scale, quat, cam, alive)
        dirs = xyz - cam.cam_pos[None, :]
        dirs = dirs / jnp.sqrt(
            jnp.sum(dirs * dirs, -1, keepdims=True) + 1e-24)
        color = jnp.maximum(sh_lib.eval_sh(3, features, dirs) + 0.5, 0.0)
        return (jnp.sum(prep.mean2d * w2) + jnp.sum(prep.conic * w3)
                + jnp.sum(prep.depth * w1) + jnp.sum(color * w3))

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(xyz, scale, quat, features)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(xyz, scale, quat, features)
    for a, b, name in zip(gk, gr, ("xyz", "scale", "quat", "features")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5, err_msg=name)


def test_render_with_fused_preprocess_matches(rng, monkeypatch):
    """Full render through the fused-preprocess path vs the same config with
    the kernel gated off: isolates exactly the preprocess+SH seam."""
    from sdpgs_tpu.config import RasterizeConfig
    from sdpgs_tpu.core.camera import Camera
    from sdpgs_tpu.core.gaussians import create_from_points
    from sdpgs_tpu.render import render
    import sdpgs_tpu.ops.rasterize.preprocess_pallas as pp

    P = 256
    pts = rng.normal(size=(P, 3)).astype(np.float32) * 0.4 + [0, 0, 3.0]
    cols = rng.uniform(size=(P, 3)).astype(np.float32)
    g = create_from_points(pts, cols, P, init_scale=np.full(P, 0.05))
    cam = Camera.create(R=np.eye(3), T=np.zeros(3), fovx=0.9, fovy=0.7,
                        width=64, height=48)
    cfg = RasterizeConfig(tile=16, max_per_tile=128, max_tiles_per_gaussian=8,
                          chunk=32, use_pallas=True, interpret_kernels=True)
    bg = jnp.zeros(3)
    out_k = render(cam, g, cfg, bg, 3)
    assert pp.preprocess_color_applicable(P, cfg)  # the kernel path ran

    monkeypatch.setattr(
        pp, "preprocess_color_applicable", lambda *_: False)
    out_x = render(cam, g, cfg, bg, 3)
    np.testing.assert_allclose(
        np.asarray(out_k.color), np.asarray(out_x.color), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out_k.depth), np.asarray(out_x.depth), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(out_k.radii), np.asarray(out_x.radii))
