"""Optimizer + adaptive density control (static-capacity, mask-based)."""

from sdpgs_tpu.opt.adam import (  # noqa: F401
    GaussianAdamState,
    adam_init,
    adam_update,
    expon_lr,
    learning_rates,
    zero_state_rows,
)
from sdpgs_tpu.opt.densify import (  # noqa: F401
    DensifyStats,
    add_densification_stats,
    densify_and_prune,
    init_stats,
    reset_opacity,
)
