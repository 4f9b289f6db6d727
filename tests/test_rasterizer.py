"""Rasterizer validation: tiled path vs naive golden renderer, gradient
sanity, compositing semantics (SURVEY.md §4 items 2-3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdpgs_tpu.config import RasterizeConfig
from sdpgs_tpu.core.camera import Camera
from sdpgs_tpu.core.transforms import build_covariance_3d, normalize_quat
from sdpgs_tpu.ops.rasterize.rasterizer import rasterize, rasterize_naive


CFG = RasterizeConfig(tile=16, max_per_tile=128, max_tiles_per_gaussian=32, chunk=32,
                      use_pallas=False)


def make_scene(rng, n=200, width=80, height=64):
    cam = Camera.create(
        R=np.eye(3), T=np.zeros(3), fovx=0.9, fovy=0.75, width=width, height=height
    )
    xyz = jnp.asarray(
        rng.normal(size=(n, 3)) * np.array([1.0, 0.8, 0.5]) + np.array([0, 0, 4.0]),
        dtype=jnp.float32,
    )
    scale = jnp.asarray(np.abs(rng.normal(size=(n, 3))) * 0.06 + 0.02, jnp.float32)
    quat = normalize_quat(jnp.asarray(rng.normal(size=(n, 4)), jnp.float32))
    cov3d = build_covariance_3d(scale, quat)
    opacity = jnp.asarray(rng.uniform(0.2, 0.95, size=(n,)), jnp.float32)
    color = jnp.asarray(rng.uniform(size=(n, 3)), jnp.float32)
    feature = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    alive = jnp.ones((n,), jnp.float32)
    bg = jnp.array([0.0, 0.0, 0.0])
    return xyz, cov3d, opacity, color, feature, alive, cam, bg


def test_tiled_matches_naive(rng):
    args = make_scene(rng)
    out_t = rasterize(*args, CFG)
    out_n = rasterize_naive(*args, CFG)
    assert int(out_t.overflow) == 0 and int(out_t.clipped) == 0
    np.testing.assert_allclose(out_t.color, out_n.color, atol=2e-5)
    np.testing.assert_allclose(out_t.depth, out_n.depth, atol=2e-4)
    np.testing.assert_allclose(out_t.alpha, out_n.alpha, atol=2e-5)
    np.testing.assert_allclose(out_t.feature, out_n.feature, atol=2e-4)


def test_background_composites():
    """Empty scene renders pure background."""
    cam = Camera.create(R=np.eye(3), T=np.zeros(3), fovx=0.9, fovy=0.75,
                        width=32, height=32)
    n = 4
    out = rasterize(
        jnp.zeros((n, 3)),
        jnp.broadcast_to(jnp.eye(3) * 1e-4, (n, 3, 3)),
        jnp.zeros((n,)),
        jnp.zeros((n, 3)),
        jnp.zeros((n, 3)),
        jnp.zeros((n,)),  # all dead
        cam,
        jnp.array([0.25, 0.5, 0.75]),
        CFG,
    )
    np.testing.assert_allclose(
        out.color, np.broadcast_to([0.25, 0.5, 0.75], (32, 32, 3)), atol=1e-6
    )
    np.testing.assert_allclose(out.alpha, 0.0, atol=1e-6)


def test_single_gaussian_center():
    """One opaque Gaussian in front of the camera dominates the center pixel."""
    cam = Camera.create(R=np.eye(3), T=np.zeros(3), fovx=0.9, fovy=0.9,
                        width=48, height=48)
    out = rasterize(
        jnp.array([[0.0, 0.0, 2.0]]),
        jnp.broadcast_to(jnp.eye(3) * 0.04, (1, 3, 3)),
        jnp.array([0.95]),
        jnp.array([[1.0, 0.0, 0.0]]),
        jnp.zeros((1, 3)),
        jnp.ones((1,)),
        cam,
        jnp.zeros(3),
        CFG,
    )
    c = np.asarray(out.color)[23, 23]
    assert c[0] > 0.85 and c[1] < 0.05
    assert float(out.depth[23, 23]) == pytest.approx(2.0 * float(out.alpha[23, 23]), rel=1e-3)


def test_depth_ordering_occlusion():
    """A nearer opaque Gaussian must occlude a farther one."""
    cam = Camera.create(R=np.eye(3), T=np.zeros(3), fovx=0.9, fovy=0.9,
                        width=32, height=32)
    xyz = jnp.array([[0.0, 0.0, 2.0], [0.0, 0.0, 5.0]])
    cov = jnp.broadcast_to(jnp.eye(3) * 0.05, (2, 3, 3))
    out = rasterize(
        xyz, cov,
        jnp.array([0.99, 0.99]),
        jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]),
        jnp.zeros((2, 3)),
        jnp.ones((2,)),
        cam, jnp.zeros(3), CFG,
    )
    c = np.asarray(out.color)[15, 15]
    assert c[0] > 0.9 and c[1] < 0.05  # red (near) wins


def test_gradients_finite_and_flow(rng):
    xyz, cov3d, opacity, color, feature, alive, cam, bg = make_scene(rng, n=64)

    def loss_fn(xyz, opacity, color, offset):
        out = rasterize(
            xyz, cov3d, opacity, color, feature, alive, cam, bg, CFG,
            means2d_offset=offset,
        )
        return jnp.sum(out.color**2) + jnp.sum(out.depth**2) * 0.01

    offset = jnp.zeros((64, 2))
    grads = jax.grad(loss_fn, argnums=(0, 1, 2, 3))(xyz, opacity, color, offset)
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))
    # screen-space offset grads are the densification signal; must be nonzero
    assert float(jnp.abs(grads[3]).sum()) > 0.0
    assert float(jnp.abs(grads[0]).sum()) > 0.0


def test_grad_matches_naive(rng):
    """Autodiff through the tiled path == autodiff through the naive path."""
    xyz, cov3d, opacity, color, feature, alive, cam, bg = make_scene(rng, n=48)
    target = np.asarray(
        rasterize_naive(xyz, cov3d, opacity, color, feature, alive, cam, bg, CFG).color
    )

    def loss_t(o):
        out = rasterize(xyz, cov3d, o, color, feature, alive, cam, bg, CFG)
        return jnp.mean((out.color - target) ** 2)

    def loss_n(o):
        out = rasterize_naive(xyz, cov3d, o, color, feature, alive, cam, bg, CFG)
        return jnp.mean((out.color - target) ** 2)

    g_t = np.asarray(jax.grad(loss_t)(opacity))
    g_n = np.asarray(jax.grad(loss_n)(opacity))
    np.testing.assert_allclose(g_t, g_n, atol=1e-6, rtol=1e-4)


def test_finite_difference_opacity(rng):
    """Finite-difference check of the compositing gradient (tiny scene)."""
    xyz, cov3d, opacity, color, feature, alive, cam, bg = make_scene(rng, n=8,
                                                                     width=32, height=32)

    def loss(o):
        out = rasterize(xyz, cov3d, o, color, feature, alive, cam, bg, CFG)
        return jnp.sum(out.color)

    g = np.asarray(jax.grad(loss)(opacity))
    eps = 1e-3
    for i in range(4):
        d = np.zeros(8, np.float32)
        d[i] = eps
        fd = (float(loss(opacity + d)) - float(loss(opacity - d))) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=5e-2, atol=5e-3)


def test_overflow_telemetry():
    """Per-tile capacity overflow is counted, not silent."""
    tiny = RasterizeConfig(tile=16, max_per_tile=32, max_tiles_per_gaussian=16,
                           chunk=32, use_pallas=False)
    rng = np.random.default_rng(3)
    cam = Camera.create(R=np.eye(3), T=np.zeros(3), fovx=0.9, fovy=0.9,
                        width=32, height=32)
    n = 256
    xyz = jnp.asarray(rng.normal(size=(n, 3)) * 0.05 + np.array([0, 0, 3.0]), jnp.float32)
    cov = jnp.broadcast_to(jnp.eye(3) * 0.01, (n, 3, 3))
    out = rasterize(
        xyz, cov, jnp.full((n,), 0.5), jnp.ones((n, 3)), jnp.zeros((n, 3)),
        jnp.ones((n,)), cam, jnp.zeros(3), tiny,
    )
    assert int(out.overflow) > 0


def test_gather_backward_matches_scatter(rng):
    """The gather-based payload backward (grad_gather_min_rows exceeded)
    produces the same gradients as the scatter-add transpose — including
    with K-cap overflow, where dropped entries must contribute zero."""
    import jax

    from sdpgs_tpu.config import RasterizeConfig
    from sdpgs_tpu.core.camera import Camera
    from sdpgs_tpu.core.gaussians import create_from_points
    from sdpgs_tpu.render import render

    n, cap = 128, 256
    pts = (rng.normal(size=(n, 3)) * 0.4 + [0, 0, 3.0]).astype(np.float32)
    g = create_from_points(pts, rng.uniform(size=(n, 3)).astype(np.float32),
                           cap, init_scale=np.full(n, 0.03))
    cam = Camera.create(R=np.eye(3), T=np.zeros(3), fovx=0.9, fovy=0.7,
                        width=64, height=48)
    bg = jnp.zeros(3)
    tgt = jnp.asarray(rng.uniform(size=(48, 64, 3)).astype(np.float32))

    # max_per_tile=8 forces K-cap overflow; the pallas variants route
    # through the compact lanes/row kernels (interpret mode) so the
    # entry_slot map from the kernel-returned ranks — and the zero-grads-at-
    # sentinel-slots invariant of the Pallas composite — are exercised too.
    variants = [
        dict(tile=16, max_per_tile=64, max_tiles_per_gaussian=8, chunk=8,
             use_pallas=False),
        dict(tile=16, max_per_tile=8, max_tiles_per_gaussian=8, chunk=8,
             use_pallas=False),
        dict(tile=16, max_per_tile=128, max_tiles_per_gaussian=8, chunk=32,
             use_pallas=True, interpret_kernels=True, rank_block_slots=64,
             rank_kernel_lanes=True),   # S=64 forces block-slot drops
        dict(tile=16, max_per_tile=128, max_tiles_per_gaussian=8, chunk=32,
             use_pallas=True, interpret_kernels=True, rank_block_slots=2048,
             rank_kernel_lanes=False),
    ]
    for base in variants:

        def loss(params, cfg):
            out = render(cam, g.replace(**params), cfg, bg, 1)
            return (jnp.sum((out.color - tgt) ** 2) + jnp.sum(out.depth)
                    + jnp.sum(out.feature ** 2))

        params = {"xyz": g.xyz, "opacity": g.opacity, "scaling": g.scaling,
                  "rotation": g.rotation, "features_dc": g.features_dc,
                  "language_feature": g.language_feature}
        g_sc = jax.grad(loss)(params, RasterizeConfig(**base))
        g_ga = jax.grad(loss)(
            params, RasterizeConfig(**base, grad_gather_min_rows=0))
        # windowed two-phase backward (grad_window.py): 4 windows of 64
        # slots over the 256-slot capacity. slack 4.0 sizes the slab to
        # keep EVERY row — this is the exactness check; slab-drop
        # accounting is covered in tests/test_grad_window.py.
        g_wd = jax.grad(loss)(
            params, RasterizeConfig(**base, grad_window_min_rows=0,
                                    grad_window_bits=6,
                                    grad_window_slack=4.0))
        for k in params:
            np.testing.assert_allclose(
                np.asarray(g_ga[k]), np.asarray(g_sc[k]),
                rtol=1e-5, atol=1e-6, err_msg=f"{k} {base}")
            np.testing.assert_allclose(
                np.asarray(g_wd[k]), np.asarray(g_sc[k]),
                rtol=1e-5, atol=1e-6, err_msg=f"windowed {k} {base}")
