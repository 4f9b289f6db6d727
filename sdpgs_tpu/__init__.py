"""SDP-GS-TPU: a TPU-native sparse-depth-prior Gaussian-splatting framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of SDP-GS
(few-shot novel-view synthesis with segment-aligned monocular depth priors),
designed TPU-first:

- the differentiable tile rasterizer is a Pallas kernel family with a
  ``jax.custom_vjp`` (replacing the reference's CUDA rasterizer,
  ``/root/reference/submodules/diff-gaussian-rasterization``),
- Gaussian state is a static-capacity masked pytree (struct-of-arrays),
- densify/prune are masked-array ops, not shape-changing tensor surgery,
- multi-chip scaling uses ``jax.sharding`` meshes + XLA collectives.
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry (projection, covariance, compositing accumulation) needs true f32
# matmuls; the framework's hot loops are elementwise/VPU-bound, so the MXU
# rate loss is irrelevant here. Kernels that can tolerate bf16 opt in
# explicitly with their own `precision=` argument.
_jax.config.update("jax_default_matmul_precision", "highest")

from sdpgs_tpu.core.gaussians import Gaussians  # noqa: F401
from sdpgs_tpu.core.camera import Camera  # noqa: F401
