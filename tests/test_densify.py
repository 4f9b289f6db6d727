"""Densify/prune semantics on static-capacity masked arrays."""

import jax
import jax.numpy as jnp
import numpy as np

from sdpgs_tpu.core.gaussians import create_from_points
from sdpgs_tpu.opt.adam import adam_init
from sdpgs_tpu.opt.densify import (
    DensifyStats,
    densify_and_prune,
    init_stats,
    reset_opacity,
)


def make_gaussians(n=16, capacity=64, scale=0.01):
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    cols = rng.uniform(size=(n, 3)).astype(np.float32)
    g = create_from_points(pts, cols, capacity, init_scale=np.full(n, scale**2))
    return g


def run_densify(g, grads, extent=1.0, min_opacity=0.005, **kw):
    stats = init_stats(g.capacity)
    stats = DensifyStats(
        xyz_gradient_accum=jnp.asarray(grads),
        denom=jnp.ones(g.capacity),
        max_radii2d=jnp.zeros(g.capacity),
    )
    return densify_and_prune(
        g, adam_init(g), stats, jax.random.PRNGKey(0),
        grad_threshold=0.001, min_opacity=min_opacity, extent=extent,
        percent_dense=0.01, run_proximity=False, **kw,
    )


def test_clone_spawns_children():
    g = make_gaussians(n=8, capacity=32, scale=0.001)  # small -> clone branch
    grads = np.zeros(32, np.float32)
    grads[:4] = 0.01  # over threshold
    g2, opt2, stats2, info = run_densify(g, grads)
    assert int(info.spawned) == 4
    assert int(info.num_alive) == 12  # 8 + 4 clones
    # clones duplicate the source position
    alive = np.asarray(g2.alive) > 0
    xyz = np.asarray(g2.xyz)[alive]
    for i in range(4):
        src = np.asarray(g.xyz)[i]
        assert (np.abs(xyz - src).sum(1) < 1e-6).sum() >= 2  # source + clone


def test_split_replaces_source():
    g = make_gaussians(n=8, capacity=64, scale=10.0)  # big -> split branch
    grads = np.zeros(64, np.float32)
    grads[:3] = 0.01
    g2, opt2, stats2, info = run_densify(g, grads)
    # 3 sources split into 2 children each; sources die
    assert int(info.spawned) == 6
    assert int(info.num_alive) == 8 - 3 + 6
    # child scale shrinks by 1/(0.8*2)
    alive2 = np.asarray(g2.alive) > 0
    assert np.asarray(g2.scaling)[alive2].max() <= np.asarray(g.scaling)[:8].max()


def test_opacity_prune():
    g = make_gaussians(n=8, capacity=32)
    g = g.replace(opacity=g.opacity.at[:4, 0].set(-20.0))  # ~0 opacity
    g2, _, _, info = run_densify(g, np.zeros(32, np.float32))
    assert int(info.num_alive) == 4
    assert int(info.pruned) == 4


def test_capacity_overflow_counted():
    g = make_gaussians(n=30, capacity=32, scale=0.001)
    grads = np.full(32, 0.01, np.float32)  # everyone wants to clone
    g2, _, _, info = run_densify(g, grads)
    assert int(info.dropped) > 0
    assert int(info.num_alive) == 32  # filled to capacity


def test_densify_resets_stats_and_moments():
    g = make_gaussians(n=8, capacity=32, scale=0.001)
    grads = np.zeros(32, np.float32)
    grads[:2] = 0.01
    g2, opt2, stats2, info = run_densify(g, grads)
    assert float(jnp.sum(stats2.xyz_gradient_accum)) == 0.0
    # spawned slots have zeroed adam moments
    assert float(jnp.sum(jnp.abs(opt2.mu["xyz"]))) == 0.0


def test_reset_opacity():
    g = make_gaussians(n=8, capacity=16)
    opt = adam_init(g)
    opt = opt.replace(nu={**opt.nu, "opacity": opt.nu["opacity"] + 1.0})
    g2, opt2 = reset_opacity(g, opt, ceiling=0.01)
    act = np.asarray(jax.nn.sigmoid(g2.opacity[:8, 0]))
    assert np.all(act <= 0.01 + 1e-6)
    assert float(jnp.sum(opt2.nu["opacity"])) == 0.0
    # other moments untouched
    assert float(jnp.sum(opt2.nu["xyz"])) == 0.0


def test_proximity_bridging():
    # two far clusters with huge scale -> proximity spawns midpoints
    pts = np.array([[0, 0, 0], [0.1, 0, 0], [10, 0, 0], [10.1, 0, 0]], np.float32)
    cols = np.ones((4, 3), np.float32) * 0.5
    g = create_from_points(pts, cols, 16, init_scale=np.full(4, 4.0))
    from sdpgs_tpu.ops.knn import knn

    d2, idx = knn(g.xyz, k=3, mask=g.alive, chunk=16)
    finite = jnp.isfinite(d2)
    dist = jnp.sum(jnp.where(finite, d2, 0), -1) / jnp.maximum(finite.sum(-1), 1)
    stats = init_stats(16)
    g2, _, _, info = densify_and_prune(
        g, adam_init(g), stats, jax.random.PRNGKey(0),
        grad_threshold=1e9, min_opacity=0.005, extent=1.0, percent_dense=0.01,
        run_proximity=True, knn_dist=dist, knn_idx=idx,
    )
    assert int(info.spawned) > 0  # bridge points created
    # bridge points lie between the clusters
    alive2 = np.asarray(g2.alive) > 0
    new_mask = alive2.copy()
    new_mask[:4] = False
    xs = np.asarray(g2.xyz)[new_mask][:, 0]
    assert np.all((xs > 0.0) & (xs < 10.2))
