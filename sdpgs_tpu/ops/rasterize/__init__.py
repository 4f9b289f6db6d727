"""Differentiable tile rasterizer for anisotropic 3D Gaussians.

TPU-native replacement for the reference CUDA rasterizer
(reference/submodules/diff-gaussian-rasterization). Pipeline:

  preprocess (XLA, autodiff)  ->  binning (sort, non-differentiable)
  ->  gather payload (XLA; transpose = deterministic scatter-add)
  ->  per-tile front-to-back compositing (Pallas kernel w/ custom_vjp,
      or a pure-XLA chunked-scan fallback used as the golden model).

Extended semantics (the reference's vendored kernel returns only
(color, radii), but the framework consumes color/depth/alpha/feature —
see reference/gaussian_renderer/__init__.py:315-326): compositing emits
RGB, expected depth, alpha, and a 3-channel feature image in one pass.
"""

from sdpgs_tpu.ops.rasterize.rasterizer import rasterize, RenderOutput  # noqa: F401
