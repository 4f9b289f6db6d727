"""BiT (Big Transfer, ResNet-v1.5-style bottleneck variant) backbone in jnp
— the convolutional stem of DPT-Hybrid (MiDaS 3.0 hybrid, the reference's
default depth net, reference/utils/depth_utils.py:4 ``DPT_Hybrid``).

Mirrors transformers ``BitBackbone`` with ``layer_type='bottleneck'``,
``stem_type='same'`` (weight-standardized convs, TF-style dynamic SAME
padding, GroupNorm+ReLU); parameters keyed by the torch state-dict names.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class BitArch:
    embedding_size: int = 64
    hidden_sizes: Sequence[int] = (256, 512, 1024)
    depths: Sequence[int] = (3, 4, 9)
    num_groups: int = 32
    width_factor: int = 1


def _make_div(value, divisor=8):
    min_value = divisor
    new_value = max(min_value, int(value + divisor / 2) // divisor * divisor)
    if new_value < 0.9 * value:
        new_value += divisor
    return new_value


def _ws_weight(w: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Weight standardization: per-output-channel zero-mean unit-var
    (biased variance, matching F.batch_norm with training=True)."""
    o = w.shape[0]
    flat = w.reshape(o, -1)
    mu = flat.mean(axis=1, keepdims=True)
    var = flat.var(axis=1, keepdims=True)
    return ((flat - mu) / jnp.sqrt(var + eps)).reshape(w.shape)


def _same_pad(x: jnp.ndarray, k: int, s: int, value: float = 0.0) -> jnp.ndarray:
    """TF dynamic SAME padding (transformers DynamicPad2d)."""
    H, W = x.shape[-2:]

    def pad_amount(n):
        return max((math.ceil(n / s) - 1) * s + k - n, 0)

    ph, pw = pad_amount(H), pad_amount(W)
    if ph == 0 and pw == 0:
        return x
    return jnp.pad(
        x,
        ((0, 0), (0, 0), (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2)),
        constant_values=value,
    )


def _ws_conv(p, name, x, k: int, stride: int = 1) -> jnp.ndarray:
    w = _ws_weight(p[f"{name}.weight"])
    x = _same_pad(x, k, stride)
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


def _gn(p, name, x, num_groups: int, act: bool = True, eps: float = 1e-5) -> jnp.ndarray:
    B, C, H, W = x.shape
    g = x.reshape(B, num_groups, C // num_groups, H, W)
    mu = g.mean(axis=(2, 3, 4), keepdims=True)
    var = g.var(axis=(2, 3, 4), keepdims=True)
    g = (g - mu) / jnp.sqrt(var + eps)
    x = g.reshape(B, C, H, W)
    x = x * p[f"{name}.weight"][None, :, None, None] + p[f"{name}.bias"][None, :, None, None]
    return jax.nn.relu(x) if act else x


def _maxpool_same(x: jnp.ndarray, k: int = 3, s: int = 2) -> jnp.ndarray:
    """Max-pool with TF dynamic SAME padding, run SEPARABLY (1xk then kx1):
    forward-identical (max is associative); gradients measured identical on
    continuous activations (exact ties could route subgradients differently
    — the same latitude CUDA atomics have). The backward becomes two small
    select_and_scatters instead of one k*k-tap one — 1.55 vs 1.83 ms f/g at
    stem resolution (scripts/perf_maxpool.py, v5e; the equality-mask custom
    VJP was an earlier dead end at 3.66)."""
    x = _same_pad(x, k, s, value=0.0)
    r = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 1, k), (1, 1, 1, s), "VALID"
    )
    return jax.lax.reduce_window(
        r, -jnp.inf, jax.lax.max, (1, 1, k, 1), (1, 1, s, 1), "VALID"
    )


def stem_phase_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """Rearrange a (weight-standardized) [O, C, 7, 7] stride-2 conv kernel
    into the [O, C*4, 4, 4] stride-1 kernel over 2x2 phase-split inputs
    (``ops.resize.resize2d_stem_phases``): tap ``i = 2*ay + py`` of phase
    ``py`` (``i = 7`` does not exist -> zero row)."""
    O, C = w.shape[:2]
    parts = []
    for c in range(C):
        for py in range(2):
            for px in range(2):
                sub = w[:, c, py::2, px::2]
                parts.append(jnp.pad(
                    sub, ((0, 0), (0, 4 - sub.shape[1]), (0, 4 - sub.shape[2]))
                ))
    return jnp.stack(parts, axis=1)


def stem_phase_conv(p, phases: jnp.ndarray, prefix: str = "bit") -> jnp.ndarray:
    """Embedder 7x7/2 WS conv evaluated from phase-split inputs
    ([B, C, 2, 2, Hp, Wp] from ``resize2d_stem_phases``) as one dense
    stride-1 conv — the resized image and its TF-SAME padding never
    materialize, eliminating the strided data movement that made every
    direct stem reformulation lose (docs/ROADMAP.md "Stem-conv")."""
    B, C = phases.shape[:2]
    w = stem_phase_kernel(_ws_weight(p[f"{prefix}.embedder.convolution.weight"]))
    x = phases.reshape(B, C * 4, *phases.shape[-2:])
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


def bit_backbone(
    p: Dict[str, jnp.ndarray],
    pixel_values: jnp.ndarray,
    arch: BitArch = BitArch(),
    prefix: str = "bit",
    stem_phases: jnp.ndarray = None,
) -> List[jnp.ndarray]:
    """[B, 3, H, W] -> feature maps of every stage ([/4, /8, /16] for the
    3-stage DPT-hybrid configuration).

    ``stem_phases`` ([B, C, 2, 2, Hp, Wp]) replaces ``pixel_values`` for the
    embedder conv with the fused resize+space-to-depth form."""
    G = arch.num_groups
    # stem: WS conv 7x7/2 + GN+ReLU + dynamic-SAME maxpool 3x3/2
    if stem_phases is not None:
        x = stem_phase_conv(p, stem_phases, prefix)
    else:
        x = _ws_conv(p, f"{prefix}.embedder.convolution", pixel_values, 7, 2)
    x = _gn(p, f"{prefix}.embedder.norm", x, G)
    x = _maxpool_same(x)

    feats = []
    for si, (depth, hidden) in enumerate(zip(arch.depths, arch.hidden_sizes)):
        out_ch = _make_div(hidden * arch.width_factor)
        stage_stride = 1 if si == 0 else 2
        for li in range(depth):
            name = f"{prefix}.encoder.stages.{si}.layers.{li}"
            stride = stage_stride if li == 0 else 1
            shortcut = x
            if li == 0:
                shortcut = _ws_conv(p, f"{name}.downsample.conv", x, 1, stride)
                shortcut = _gn(p, f"{name}.downsample.norm", shortcut, G, act=False)
            h = _ws_conv(p, f"{name}.conv1", x, 1)
            h = _gn(p, f"{name}.norm1", h, G)
            h = _ws_conv(p, f"{name}.conv2", h, 3, stride)
            h = _gn(p, f"{name}.norm2", h, G)
            h = _ws_conv(p, f"{name}.conv3", h, 1)
            h = _gn(p, f"{name}.norm3", h, G, act=False)
            x = jax.nn.relu(h + shortcut)
        feats.append(x)
    return feats
