"""Train state pytree + checkpointing.

The reference checkpoints a raw tuple of params + densify stats + the torch
Adam state_dict (reference/train.py:212-215, gaussian_model.py:67-144).
Here the whole state is one pytree saved with orbax (sharding-aware), plus
PLY export for interop (see sdpgs_tpu/data/ply.py).
"""

from __future__ import annotations

from pathlib import Path
import jax
import jax.numpy as jnp
from flax import struct

from sdpgs_tpu.core.gaussians import Gaussians
from sdpgs_tpu.opt.adam import GaussianAdamState, adam_init
from sdpgs_tpu.opt.densify import DensifyStats, init_stats


@struct.dataclass
class TrainState:
    gaussians: Gaussians
    opt_state: GaussianAdamState
    stats: DensifyStats
    step: jnp.ndarray          # scalar int32 (iteration counter)
    rng: jax.Array
    # Running max of capacity drops since the host last looked (device-side,
    # folded in every step inside the jit — free): no step's overflow/clip
    # can slip through between log points, making "losses are never silent"
    # (binning.py) airtight. The Trainer reads + resets these at its
    # telemetry-ladder boundaries. The static-shape answer to the
    # reference's dynamic resize callbacks (rasterize_points.cu:27-33).
    # (no defaults: every template construction — e.g. sharding pytrees —
    # must make an explicit choice for these leaves)
    max_overflow: jnp.ndarray
    max_clipped: jnp.ndarray
    max_slab: jnp.ndarray      # grad-window slab drops (gradient-only): a
                               # separate channel so a slab-driven event
                               # grows grad_window_slack instead of S/K

    @classmethod
    def create(cls, gaussians: Gaussians, seed: int = 0) -> "TrainState":
        return cls(
            gaussians=gaussians,
            opt_state=adam_init(gaussians),
            stats=init_stats(gaussians.capacity),
            step=jnp.int32(0),
            rng=jax.random.PRNGKey(seed),
            max_overflow=jnp.int32(0),
            max_clipped=jnp.int32(0),
            max_slab=jnp.int32(0),
        )


def save_checkpoint(path: str | Path, state: TrainState, step: int) -> None:
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path / f"ckpt_{step}", state)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str | Path, step: int, template: TrainState) -> TrainState:
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path / f"ckpt_{step}", template)
