"""Unit tests for the windowed two-phase payload backward
(ops/rasterize/grad_window.py): map inversion, drop accounting, and the
custom_vjp backward vs the autodiff scatter transpose."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdpgs_tpu.ops.rasterize.grad_window import (
    WindowMap,
    build_window_map,
    gather_payload_windowed,
    window_geometry,
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _reference_grad(idx, ct, P):
    """Numpy scatter-add: the semantics the windowed path must match."""
    T, K, C = ct.shape
    out = np.zeros((P, C), np.float32)
    for t in range(T):
        for k in range(K):
            g = int(idx[t, k])
            if g < P:
                out[g] += ct[t, k]
    return out


def test_map_covers_every_live_row(rng):
    P, T, K, nw, Ec = 64, 5, 16, 4, 80
    idx = rng.integers(0, P + 1, size=(T, K)).astype(np.int32)
    m = jax.jit(build_window_map, static_argnums=(1, 2, 3))(
        jnp.asarray(idx), P, nw, Ec
    )
    assert int(m.overflow) == 0
    src = np.asarray(m.src)
    live = {(t * K + k) for t in range(T) for k in range(K) if idx[t, k] < P}
    mapped = {int(s) for s in src if s < T * K}
    assert mapped == live
    # each mapped slot sits in the (interleaved) window of its row's gid
    for n, s in enumerate(src):
        if s < T * K:
            w = n // Ec
            assert idx[s // K, s % K] % nw == w


def test_map_drop_accounting(rng):
    """Rows past the slab capacity are dropped AND counted."""
    P, T, K, nw = 64, 4, 32, 4
    # every row targets (interleaved) window 0 -> massive skew
    idx = (nw * rng.integers(0, P // nw, size=(T, K))).astype(np.int32)
    Ec = 16
    m = build_window_map(jnp.asarray(idx), P, nw, Ec)
    assert int(m.overflow) == T * K - Ec
    assert int(jnp.sum(m.src < T * K)) == Ec


def test_windowed_backward_exact(rng):
    P, T, K, nw = 128, 6, 32, 4
    C = 13
    Ec = T * K  # no drops
    idx = jnp.asarray(rng.integers(0, P + 1, size=(T, K)).astype(np.int32))
    payload = jnp.asarray(rng.normal(size=(P, C)).astype(np.float32))
    m = build_window_map(idx, P, nw, Ec)

    def loss_w(p):
        g = gather_payload_windowed(p, idx, m.src, m.gid_f, nw, Ec)
        return jnp.sum(jnp.sin(g) * g)

    def loss_ref(p):
        g = jnp.pad(p, ((0, 1), (0, 0)))[idx]
        return jnp.sum(jnp.sin(g) * g)

    gw = jax.grad(loss_w)(payload)
    gr = jax.grad(loss_ref)(payload)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gr),
                               rtol=1e-6, atol=1e-6)
    # and against the explicit numpy scatter with the same cotangent
    ct = np.ones((T, K, C), np.float32)
    bwd = jax.grad(
        lambda p: jnp.sum(gather_payload_windowed(p, idx, m.src, m.gid_f,
                                                  nw, Ec))
    )(payload)
    np.testing.assert_allclose(
        np.asarray(bwd), _reference_grad(np.asarray(idx), ct, P),
        rtol=1e-6, atol=1e-6)


def test_window_geometry_gates():
    class Cfg:
        grad_window_min_rows = 1000
        grad_window_bits = 5
        grad_window_slack = 1.25

    cfg = Cfg()
    assert window_geometry(128, 999, cfg) is None          # too few rows
    assert window_geometry(100, 2000, cfg) is None         # P not divisible
    assert window_geometry(32, 2000, cfg) is None          # nw < 2
    got = window_geometry(128, 2048, cfg)
    assert got is not None
    nw, Ec = got
    assert nw == 4
    assert Ec % 128 == 0 and Ec >= 2048 // nw
