"""Monocular-depth estimator facade (the reference's
``utils/depth_utils.estimate_depth``: MiDaS DPT loaded from a hard-coded hub
path at import time, frozen, 384x512 in/out, gradients enabled in train
mode).

Here loading is explicit: pass a converted .npz (tools/convert_dpt.py). The
returned callable is a pure jittable function [3, H, W] -> [H, W] inverse
depth, differentiable w.r.t. the input image. Returns ``None`` when no
weights are available — the trainer then skips the mono-depth pseudo terms
and keeps the reprojection term (which needs no network)."""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Optional

import jax.numpy as jnp


def make_mono_depth_fn(
    weights_path: Optional[str] = None,
) -> Optional[Callable[[jnp.ndarray], jnp.ndarray]]:
    if not weights_path or not Path(weights_path).exists():
        return None
    import numpy as np

    from sdpgs_tpu.models.dpt import DPTArch, DPTDepthModel

    params = dict(np.load(weights_path))
    arch = (
        DPTArch.hybrid()
        if any(k.startswith("dpt.embeddings.backbone.") for k in params)
        else DPTArch.large()
    )
    model = DPTDepthModel(params, arch)

    def estimate_depth(image: jnp.ndarray) -> jnp.ndarray:
        return model(image)

    return estimate_depth
