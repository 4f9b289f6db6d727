"""Multi-chip scaling: device meshes + sharding rules.

The reference is strictly single-GPU (SURVEY.md §2.3); parallelism here is a
new first-class subsystem:

- **data axis**: view-batch data parallelism — each device renders a slice
  of the view batch against replicated Gaussian parameters; per-Gaussian
  gradients are summed by XLA (the cross-device analogue of the CUDA
  backward's atomicAdd accumulation across pixels).
- **gauss axis**: ZeRO-style sharding of the Adam moments and densification
  statistics over the Gaussian dimension; parameters are kept replicated for
  rendering, with XLA inserting the reduce-scatter/all-gather pair around
  the optimizer update.
- **tile axis**: tile-partitioned rasterization (``tile_shard.py``) — each
  device bins and composites only the image tiles it owns; the backward's
  per-Gaussian gradient accumulation becomes one psum over the axis.

Collectives ride ICI automatically via GSPMD (shard_map for the tile axis);
nothing here issues explicit collectives.
"""

from sdpgs_tpu.parallel.mesh import make_mesh  # noqa: F401
from sdpgs_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    shard_batch,
    shard_train_state,
    state_shardings,
)
from sdpgs_tpu.parallel.tile_shard import (  # noqa: F401
    rasterize_tile_sharded,
    render_tile_sharded,
)
