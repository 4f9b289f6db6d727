"""LPIPS perceptual metric (VGG16 backbone) in JAX.

The reference imports a non-vendored ``lpipsPyTorch`` (metrics.py:18,
train.py:35). This is a from-scratch JAX implementation of the standard
LPIPS-VGG formulation: VGG16 conv features at 5 stages, channel-unit
normalization, learned 1x1 linear heads, spatial mean, sum over stages.

Pretrained weights cannot be downloaded offline; convert them once with
``tools/convert_lpips.py`` (torch checkpoint -> .npz) and pass the path.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv layout: (out_channels, n_convs) per stage before each pool.
VGG16_STAGES = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]

# LPIPS input normalization (ImageNet-derived shift/scale used by LPIPS).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(x, w, b):
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out + b[None, :, None, None]


def _maxpool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
    )


class LPIPS:
    """Weights: dict with 'conv{s}_{i}_w/b' for VGG and 'lin{s}_w' heads."""

    def __init__(self, params: Dict[str, np.ndarray]):
        self.params = {k: jnp.asarray(v) for k, v in params.items()}

    @classmethod
    def load(cls, path) -> "LPIPS":
        return cls(dict(np.load(path)))

    def features(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        """x: [3, H, W] in [0,1] -> list of stage activations."""
        x = x * 2.0 - 1.0                                # LPIPS expects [-1,1]
        x = (x - jnp.asarray(_SHIFT)[:, None, None]) / jnp.asarray(_SCALE)[:, None, None]
        h = x[None]
        feats = []
        for s, (ch, n_convs) in enumerate(VGG16_STAGES):
            for i in range(n_convs):
                h = _conv(h, self.params[f"conv{s}_{i}_w"], self.params[f"conv{s}_{i}_b"])
                h = jax.nn.relu(h)
            feats.append(h)
            if s < len(VGG16_STAGES) - 1:
                h = _maxpool(h)
        return feats

    def __call__(self, img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
        """[3, H, W] pair in [0,1] -> scalar LPIPS distance."""
        f1 = self.features(img1)
        f2 = self.features(img2)
        total = jnp.float32(0.0)
        for s, (a, b) in enumerate(zip(f1, f2)):
            a = a / jnp.sqrt(jnp.sum(a * a, axis=1, keepdims=True) + 1e-10)
            b = b / jnp.sqrt(jnp.sum(b * b, axis=1, keepdims=True) + 1e-10)
            diff = (a - b) ** 2
            w = self.params[f"lin{s}_w"]                 # [1, C, 1, 1]
            total = total + jnp.mean(jnp.sum(diff * w, axis=1))
        return total
