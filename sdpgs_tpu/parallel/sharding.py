"""Sharding rules for the train state and view batches."""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sdpgs_tpu.train.state import TrainState


def _ns(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def state_shardings(mesh: Mesh, state: TrainState) -> TrainState:
    """Sharding pytree matching TrainState:

    - Gaussian params: replicated (every device rasterizes every Gaussian)
    - Adam moments + densify stats: sharded along 'gauss' (ZeRO-1)
    - scalars: replicated
    """
    repl = _ns(mesh)

    def gauss_sharded(leaf):
        return _ns(mesh, "gauss") if leaf.ndim >= 1 else repl

    return TrainState(
        gaussians=jax.tree_util.tree_map(lambda _: repl, state.gaussians),
        opt_state=state.opt_state.replace(
            mu=jax.tree_util.tree_map(gauss_sharded, state.opt_state.mu),
            nu=jax.tree_util.tree_map(gauss_sharded, state.opt_state.nu),
            step=repl,
        ),
        stats=jax.tree_util.tree_map(gauss_sharded, state.stats),
        step=repl,
        rng=repl,
        max_overflow=repl,
        max_clipped=repl,
        max_slab=repl,
    )


def shard_train_state(state: TrainState, mesh: Mesh) -> TrainState:
    shardings = state_shardings(mesh, state)
    return jax.tree_util.tree_map(jax.device_put, state, shardings)


def batch_sharding(mesh: Mesh, batch) -> object:
    """View batches shard their leading (view) axis over 'data'."""
    return jax.tree_util.tree_map(
        lambda leaf: _ns(mesh, "data") if getattr(leaf, "ndim", 0) >= 1 else _ns(mesh),
        batch,
    )


def shard_batch(batch, mesh: Mesh):
    return jax.tree_util.tree_map(jax.device_put, batch, batch_sharding(mesh, batch))
