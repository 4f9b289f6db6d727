"""Pallas compositing kernel vs the XLA golden path (interpret mode on CPU;
the same comparison runs compiled on real TPU via bench/integration)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdpgs_tpu.config import RasterizeConfig
from sdpgs_tpu.core.camera import Camera
from sdpgs_tpu.core.transforms import build_covariance_3d, normalize_quat
from sdpgs_tpu.ops.rasterize.composite_pallas import composite_tiles_pallas
from sdpgs_tpu.ops.rasterize.composite_xla import composite_tiles_xla, tile_pixel_coords


CFG = RasterizeConfig(tile=16, max_per_tile=128, max_tiles_per_gaussian=16, chunk=32,
                      chunk_pallas=128, use_pallas=False, bwd_bf16=False)


def random_payload(rng, T=6, K=128, C=7, npix=256):
    xy = rng.uniform(0, 96, size=(T, K, 2)).astype(np.float32)
    # random positive-definite conics
    a = rng.uniform(0.05, 0.4, size=(T, K)).astype(np.float32)
    c = rng.uniform(0.05, 0.4, size=(T, K)).astype(np.float32)
    b = (rng.uniform(-0.5, 0.5, size=(T, K)) * np.sqrt(a * c)).astype(np.float32) * 0.9
    conic = np.stack([a, b, c], axis=-1)
    opa = rng.uniform(0.0, 1.0, size=(T, K)).astype(np.float32)
    vals = rng.normal(size=(T, K, C)).astype(np.float32)
    px, py = tile_pixel_coords(T, 1, 16)
    return (jnp.asarray(xy), jnp.asarray(conic), jnp.asarray(opa), jnp.asarray(vals),
            px, py)


def test_pallas_matches_xla_forward(rng):
    args = random_payload(rng)
    out_x = composite_tiles_xla(*args, CFG)
    out_p = composite_tiles_pallas(*args, CFG)
    np.testing.assert_allclose(out_p.final_t, out_x.final_t, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(out_p.values, out_x.values, atol=1e-4, rtol=1e-4)


def test_pallas_matches_xla_grads(rng):
    xy, conic, opa, vals, px, py = random_payload(rng, T=4, K=128)
    tgt = np.asarray(composite_tiles_xla(xy, conic, opa, vals, px, py, CFG).values)

    def loss_with(fn):
        def f(xy, conic, opa, vals):
            out = fn(xy, conic, opa, vals, px, py, CFG)
            return jnp.mean((out.values - tgt) ** 2) + 0.1 * jnp.mean(out.final_t**2)
        return f

    gx = jax.grad(loss_with(composite_tiles_xla), argnums=(0, 1, 2, 3))(
        xy, conic, opa, vals
    )
    gp = jax.grad(loss_with(composite_tiles_pallas), argnums=(0, 1, 2, 3))(
        xy, conic, opa, vals
    )
    for a, b, name in zip(gx, gp, ["xy", "conic", "opa", "vals"]):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4, rtol=2e-3, err_msg=name
        )


def test_pallas_bf16_bwd_is_noop_off_tpu(rng):
    """bwd_bf16=True lowers the backward kernel's two triangular matmuls to
    bf16 operands ON TPU ONLY; off-TPU (CPU/interpret, which is where this
    suite runs) the flag must be a guarded no-op — the CPU backend cannot
    execute batched bf16 dots, and the fp32 contract (backward.cu:399-557)
    must hold. Assert cfg16 grads are BIT-IDENTICAL to f32 grads here, which
    is exactly the guard working; the ~1% bf16-vs-exact tolerance is a
    TPU-side check (scripts/perf_bwd_bf16.py)."""
    xy, conic, opa, vals, px, py = random_payload(rng, T=4, K=128)
    cfg16 = dataclasses.replace(CFG, bwd_bf16=True)
    tgt = np.asarray(composite_tiles_xla(xy, conic, opa, vals, px, py, CFG).values)

    def loss_with(fn, cfg):
        def f(xy, conic, opa, vals):
            out = fn(xy, conic, opa, vals, px, py, cfg)
            return jnp.mean((out.values - tgt) ** 2) + 0.1 * jnp.mean(out.final_t**2)
        return f

    # forward bit-identical to the f32-bwd kernel
    out16 = composite_tiles_pallas(xy, conic, opa, vals, px, py, cfg16)
    out32 = composite_tiles_pallas(xy, conic, opa, vals, px, py, CFG)
    np.testing.assert_array_equal(np.asarray(out16.values), np.asarray(out32.values))

    gx = jax.grad(loss_with(composite_tiles_xla, CFG), argnums=(0, 1, 2, 3))(
        xy, conic, opa, vals
    )
    g32 = jax.grad(loss_with(composite_tiles_pallas, CFG), argnums=(0, 1, 2, 3))(
        xy, conic, opa, vals
    )
    gp = jax.grad(loss_with(composite_tiles_pallas, cfg16), argnums=(0, 1, 2, 3))(
        xy, conic, opa, vals
    )
    for a, b, name in zip(g32, gp, ["xy", "conic", "opa", "vals"]):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a), err_msg=name)
    for a, b, name in zip(gx, gp, ["xy", "conic", "opa", "vals"]):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.maximum(np.abs(a).max(), 1e-6)
        assert np.abs(b - a).max() / denom < 2e-2, name


def test_pallas_bwd_inf_alpha_raw_no_nan(rng):
    """Dead sentinel entries with garbage conics can push power >> 0 so
    exp(power) overflows to inf; the opacity-grad reduction must mask the
    product inside the where (0 * inf = NaN otherwise)."""
    xy, conic, opa, vals, px, py = random_payload(rng, T=2, K=128)
    # poison a few slots: huge negative-definite "conic" => power = -0.5*q > 0
    conic = conic.at[:, -8:, 0].set(-500.0)
    conic = conic.at[:, -8:, 2].set(-500.0)
    conic = conic.at[:, -8:, 1].set(0.0)

    def f(xy, conic, opa, vals):
        out = composite_tiles_pallas(xy, conic, opa, vals, px, py, CFG)
        return jnp.sum(out.values ** 2) + jnp.sum(out.final_t ** 2)

    g = jax.grad(f, argnums=(0, 1, 2, 3))(xy, conic, opa, vals)
    for arr, name in zip(g, ["xy", "conic", "opa", "vals"]):
        assert np.all(np.isfinite(np.asarray(arr))), name


def test_pallas_early_termination_consistency(rng):
    """Opaque near-field wall: early-exit path must still match XLA."""
    T, K = 2, 128
    xy = np.tile(np.array([8.0, 8.0], np.float32), (T, K, 1))
    xy += rng.normal(size=xy.shape).astype(np.float32) * 2.0
    conic = np.tile(np.array([0.5, 0.0, 0.5], np.float32), (T, K, 1))
    opa = np.full((T, K), 0.98, np.float32)
    vals = rng.normal(size=(T, K, 7)).astype(np.float32)
    px, py = tile_pixel_coords(2, 1, 16)
    args = (jnp.asarray(xy), jnp.asarray(conic), jnp.asarray(opa), jnp.asarray(vals),
            px, py)
    out_x = composite_tiles_xla(*args, CFG)
    out_p = composite_tiles_pallas(*args, CFG)
    np.testing.assert_allclose(out_p.values, out_x.values, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(out_p.final_t, out_x.final_t, atol=1e-6)


def test_pallas_vmap_batching(rng):
    """vmap over a view batch must work for the pallas composite (multi-view
    training batches vmap the whole render)."""
    args1 = random_payload(rng, T=4, K=128)
    args2 = random_payload(np.random.default_rng(7), T=4, K=128)
    stacked = tuple(jnp.stack([a, b]) for a, b in zip(args1, args2))

    f = jax.vmap(lambda xy, con, opa, vals, px, py:
                 composite_tiles_pallas(xy, con, opa, vals, px, py, CFG).values)
    out = f(*stacked)
    ref0 = composite_tiles_pallas(*args1, CFG).values
    ref1 = composite_tiles_pallas(*args2, CFG).values
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(ref1), atol=1e-5)

    # grad-of-vmap
    def loss(xy):
        return jnp.sum(f(xy, *stacked[1:]) ** 2)

    g = jax.grad(loss)(stacked[0])
    assert np.all(np.isfinite(np.asarray(g)))
