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
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class MonoDepth(NamedTuple):
    """Depth net as (pure apply, params pytree).

    The params ride through the train step as a jit *argument*, never a
    closure constant: a captured DPT-Hybrid would bake ~470MB of weights
    into the HLO (the remote-compile relay rejects such payloads outright,
    and it bloats compilation everywhere else)."""

    apply: Callable[[Any, jnp.ndarray], jnp.ndarray]  # (params, [3,H,W]) -> [H,W]
    params: Any


def mono_depth_from_params(
    raw: dict,
    arch=None,
    dtype: Optional[jnp.dtype] = None,
    matmul_precision: str = "default",
    resize_method: str = "bicubic",
    phase_stem: bool = True,
) -> MonoDepth:
    """Wrap an in-memory DPT param dict (state-dict names) as a
    :class:`MonoDepth`. Used by :func:`make_mono_depth_fn` (npz from disk),
    the pseudo-window bench flavor, and the synthetic acceptance rig
    (``dpt.random_params``).

    ``matmul_precision``: the package-wide default is "highest" (6-pass f32
    MXU — geometry needs it), but the depth net does NOT: it feeds
    scale-invariant Pearson losses, and single-pass bf16 ("default") runs
    the MXU ~6x faster. Override with "BF16_BF16_F32_X3"/"highest" to trade
    speed back for accuracy.

    ``resize_method``: "bicubic" (default) matches the reference's
    ``F.interpolate(..., mode="bicubic")`` in/out resizes to torch parity
    (utils/depth_utils.py:33-44), run as MXU matmuls (ops/resize.py);
    "bilinear" keeps the pre-r3 behavior."""
    import numpy as np

    from sdpgs_tpu.models.dpt import DPTArch, _resize_bilinear, dpt_forward

    if arch is None:
        arch = (
            DPTArch.hybrid()
            if any(k.startswith("dpt.embeddings.backbone.") for k in raw)
            else DPTArch.large()
        )
    params = {
        k: jnp.asarray(v, dtype if (dtype and np.asarray(v).dtype == np.float32) else None)
        for k, v in raw.items()
    }

    def apply(params, image: jnp.ndarray) -> jnp.ndarray:
        """[3, H, W] image in [0, 1] -> [H, W] inverse depth (differentiable;
        reference utils/depth_utils.py:18-45: 384x512 in/out, bicubic)."""
        H, W = image.shape[1:]
        stem_phases = None
        # the in/out resize matmuls run under the NET's precision context
        # (not the package-wide 6-pass f32 default) and, when the net is
        # bf16, on bf16 operands: the result feeds a bf16 network / a
        # scale-invariant Pearson loss either way, so full-precision
        # resizes here were pure waste (f/g measured on the critical path)
        with jax.default_matmul_precision(matmul_precision):
            img = image[None] if dtype is None else image[None].astype(dtype)
            if resize_method == "bilinear":
                x = _resize_bilinear(img, 384, 512, align_corners=False)
                x = (x - 0.5) / 0.5                        # DPT normalization
            elif phase_stem and arch.is_hybrid:
                # Fused resize + space-to-depth: the BiT embedder's 7x7/2
                # conv runs dense over phase tensors; the 384x512 image (and
                # its strided reads) never materializes. Normalize BEFORE
                # the resize (affine commutes with it: interpolation rows
                # sum to 1) so the phase tensors' zero pad rows equal the
                # conv's zero padding.
                from sdpgs_tpu.ops.resize import resize2d_stem_phases

                norm = (img - 0.5) / 0.5
                stem_phases = resize2d_stem_phases(
                    norm, 384, 512, resize_method, align_corners=False)
                x = jnp.zeros((1, 3, 384, 512), norm.dtype)  # unused, DCE'd
            else:
                from sdpgs_tpu.ops.resize import resize2d

                x = resize2d(img, 384, 512, resize_method,
                             align_corners=False)
                x = (x - 0.5) / 0.5                        # DPT normalization
            depth = dpt_forward(params, x, arch,
                                stem_phases=stem_phases).astype(jnp.float32)
        # The final H,W upsample runs OUTSIDE the reduced-precision context:
        # the [1, 1, 384, 512] resize pair is negligible compute, and keeping
        # it full-precision means the returned depth map's fidelity is set by
        # the net, not by a bf16 resize of its output (ADVICE r4).
        if resize_method == "bilinear":
            out = _resize_bilinear(depth[:, None], H, W,
                                   align_corners=False)
        else:
            from sdpgs_tpu.ops.resize import resize2d

            out = resize2d(depth[:, None], H, W, resize_method,
                           align_corners=False)
        return out[0, 0]

    return MonoDepth(apply, params)


def make_mono_depth_fn(
    weights_path: Optional[str] = None,
    dtype: Optional[jnp.dtype] = None,
    matmul_precision: str = "default",
    resize_method: str = "bicubic",
) -> Optional[MonoDepth]:
    """Load a converted DPT checkpoint (tools/convert_dpt.py) as a
    :class:`MonoDepth`. ``dtype=jnp.bfloat16`` stores/runs the params in
    bf16 (f32 in/out) — an HBM-side knob; compute speed is governed by
    ``matmul_precision`` (see :func:`mono_depth_from_params`). Quality-wise
    the Pearson pseudo-depth losses are scale-invariant, so bf16's ~0.5%
    relative depth noise is far below the loss-weight scale."""
    if not weights_path or not Path(weights_path).exists():
        return None
    import numpy as np

    raw = dict(np.load(weights_path))
    arch = None
    if "__arch__" in raw:  # embedded architecture (dpt.save_params)
        from sdpgs_tpu.models.dpt import arch_from_json_bytes

        arch = arch_from_json_bytes(raw.pop("__arch__"))
    return mono_depth_from_params(raw, arch=arch, dtype=dtype,
                                  matmul_precision=matmul_precision,
                                  resize_method=resize_method)
