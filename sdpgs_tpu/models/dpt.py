"""DPT (dense prediction transformer) monocular depth estimation in JAX.

Replaces the reference's MiDaS dependency (reference/utils/depth_utils.py
loads ``DPT_Hybrid`` from a hard-coded torch.hub path at import time). This
is a from-scratch jnp implementation of the DPT-Large architecture (MiDaS
3.0 family): ViT backbone with 4 hooked stages, readout-projected
reassembly, top-down feature fusion, depth head.

Parameters are stored under the torch ``DPTForDepthEstimation`` state-dict
names so checkpoints convert mechanically (tools/convert_dpt.py); the
implementation is validated against the torch reference with random weights
in tests (no pretrained download needed for the equivalence check).

The forward is differentiable end-to-end: the reference backpropagates the
pseudo-view depth loss *through* MiDaS into the rendered image
(depth_utils.py:38-44), and this port preserves that.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DPTArch:
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    patch_size: int = 16
    backbone_out_indices: Sequence[int] = (5, 11, 17, 23)
    neck_hidden_sizes: Sequence[int] = (256, 512, 1024, 1024)
    reassemble_factors: Sequence[float] = (4, 2, 1, 0.5)
    fusion_hidden_size: int = 256
    layer_norm_eps: float = 1e-12
    is_hybrid: bool = False
    bit: "object" = None  # BitArch when is_hybrid

    @classmethod
    def large(cls) -> "DPTArch":
        return cls()

    @classmethod
    def hybrid(cls) -> "DPTArch":
        """DPT-Hybrid == MiDaS 3.0 hybrid (Intel/dpt-hybrid-midas): ViT-Base
        on a BiT-R50 3-stage stem, CNN features feeding the two
        highest-resolution fusion branches."""
        from sdpgs_tpu.models.bit import BitArch

        return cls(hidden_size=768, num_layers=12, num_heads=12,
                   intermediate_size=3072,
                   backbone_out_indices=(2, 5, 8, 11),
                   neck_hidden_sizes=(256, 512, 768, 768),
                   reassemble_factors=(1, 1, 1, 0.5),
                   is_hybrid=True, bit=BitArch())

    @classmethod
    def tiny(cls, **kw) -> "DPTArch":
        """Small config for architecture-equivalence tests."""
        return cls(hidden_size=32, num_layers=4, num_heads=2, intermediate_size=64,
                   backbone_out_indices=(0, 1, 2, 3), neck_hidden_sizes=(8, 12, 24, 32),
                   fusion_hidden_size=16, **kw)

    @classmethod
    def tiny_hybrid(cls, **kw) -> "DPTArch":
        from sdpgs_tpu.models.bit import BitArch

        return cls(hidden_size=32, num_layers=4, num_heads=2, intermediate_size=64,
                   backbone_out_indices=(0, 1, 2, 3),
                   neck_hidden_sizes=(16, 32, 32, 32),
                   reassemble_factors=(1, 1, 1, 0.5),
                   fusion_hidden_size=16, is_hybrid=True,
                   bit=BitArch(embedding_size=16, hidden_sizes=(16, 32, 32),
                               depths=(1, 1, 1), num_groups=8), **kw)


def _linear(p, name, x):
    return x @ p[f"{name}.weight"].T + p[f"{name}.bias"]


def _layernorm(p, name, x, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    xn = (x - mu) / jnp.sqrt(var + eps)
    return xn * p[f"{name}.weight"] + p[f"{name}.bias"]


def _conv(p, name, x, stride=1, padding="SAME", bias=True):
    w = p[f"{name}.weight"]
    out = jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    if bias:
        out = out + p[f"{name}.bias"][None, :, None, None]
    return out


def _conv_transpose_block(p, name, x, factor):
    """ConvTranspose2d with kernel == stride == factor: exact einsum form.
    torch weight layout: [in, out, k, k]."""
    w = p[f"{name}.weight"]
    b = p[f"{name}.bias"]
    out = jnp.einsum("bchw,coij->bohiwj", x, w)
    B, O, H, k, W, _ = out.shape
    out = out.reshape(B, O, H * factor, W * factor)
    return out + b[None, :, None, None]


def _resize_bilinear(x, out_h, out_w, align_corners):
    """[B, C, H, W] bilinear resize, both align_corners conventions.

    Routed through the matmul resize (ops/resize.py, torch-parity weights):
    the gather-based formulation below costs ~2x more on TPU (jnp.take
    chains vs two MXU matmuls) — kept as the reference implementation for
    the fallback path."""
    from sdpgs_tpu.ops.resize import resize2d

    return resize2d(x, out_h, out_w, method="bilinear",
                    align_corners=align_corners)


def _resize_bilinear_gather(x, out_h, out_w, align_corners):
    """Original gather-based formulation (golden for the matmul path)."""
    B, C, H, W = x.shape

    def axis_coords(n_in, n_out):
        if align_corners and n_out > 1:
            return jnp.linspace(0.0, n_in - 1.0, n_out)
        s = n_in / n_out
        return jnp.clip((jnp.arange(n_out) + 0.5) * s - 0.5, 0.0, n_in - 1.0)

    ys = axis_coords(H, out_h)
    xs = axis_coords(W, out_w)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, H - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, W - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    wy = (ys - y0)[None, None, :, None]
    wx = (xs - x0)[None, None, None, :]

    # Lerp weights in the input dtype so a bf16 network stays bf16 end to
    # end (f32 weights would upcast and break dtype-matched convs).
    wy = wy.astype(x.dtype)
    wx = wx.astype(x.dtype)
    top = jnp.take(x, y0, axis=2)
    bot = jnp.take(x, y1, axis=2)
    rows = top * (1 - wy) + bot * wy
    left = jnp.take(rows, x0, axis=3)
    right = jnp.take(rows, x1, axis=3)
    return left * (1 - wx) + right * wx


def _attention(p, layer, x, arch: DPTArch):
    pre = f"dpt.encoder.layer.{layer}.attention.attention"
    B, N, C = x.shape
    H = arch.num_heads
    dh = C // H

    def heads(name):
        v = _linear(p, f"{pre}.{name}", x)
        return v.reshape(B, N, H, dh).transpose(0, 2, 1, 3)

    q, k, v = heads("query"), heads("key"), heads("value")
    attn = jax.nn.softmax(q @ k.transpose(0, 1, 3, 2) / jnp.sqrt(dh), axis=-1)
    out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, N, C)
    return _linear(p, f"dpt.encoder.layer.{layer}.attention.output.dense", out)


def _vit_layer(p, i, x, arch: DPTArch):
    h = _layernorm(p, f"dpt.encoder.layer.{i}.layernorm_before", x, arch.layer_norm_eps)
    x = x + _attention(p, i, h, arch)
    h = _layernorm(p, f"dpt.encoder.layer.{i}.layernorm_after", x, arch.layer_norm_eps)
    h = _linear(p, f"dpt.encoder.layer.{i}.intermediate.dense", h)
    h = jax.nn.gelu(h, approximate=False)
    h = _linear(p, f"dpt.encoder.layer.{i}.output.dense", h)
    return x + h


def _embed(p, x, arch: DPTArch, stem_phases=None):
    """[B, 3, H, W] -> tokens [B, N+1, C] (+ CNN features when hybrid); pos
    embeddings interpolated to the actual grid
    (modeling_dpt.py:_resize_pos_embed)."""
    B = x.shape[0]
    cnn_feats = []
    if arch.is_hybrid:
        from sdpgs_tpu.models.bit import bit_backbone

        feats = bit_backbone(p, x, arch.bit, prefix="dpt.embeddings.backbone.bit",
                             stem_phases=stem_phases)
        cnn_feats = feats[:2]
        feat = jax.lax.conv_general_dilated(
            feats[-1], p["dpt.embeddings.projection.weight"], (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        ) + p["dpt.embeddings.projection.bias"][None, :, None, None]
    else:
        feat = jax.lax.conv_general_dilated(
            x, p["dpt.embeddings.patch_embeddings.projection.weight"],
            (arch.patch_size, arch.patch_size), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        ) + p["dpt.embeddings.patch_embeddings.projection.bias"][None, :, None, None]
    B_, C, gh, gw = feat.shape
    tokens = feat.reshape(B, C, gh * gw).transpose(0, 2, 1)

    pos = p["dpt.embeddings.position_embeddings"]        # [1, N0+1, C]
    pos_tok, pos_grid = pos[:, :1], pos[:, 1:]
    g0 = int(round(float(np.sqrt(pos_grid.shape[1]))))
    if (g0, g0) != (gh, gw):
        grid = pos_grid.reshape(1, g0, g0, -1).transpose(0, 3, 1, 2)
        grid = _resize_bilinear(grid, gh, gw, align_corners=False)
        pos_grid = grid.reshape(1, -1, gh * gw).transpose(0, 2, 1)
    cls = jnp.broadcast_to(p["dpt.embeddings.cls_token"], (B, 1, C))
    tokens = jnp.concatenate([cls, tokens], axis=1)
    return tokens + jnp.concatenate([pos_tok, pos_grid], axis=1), gh, gw, cnn_feats


def _residual_unit(p, name, x):
    h = jax.nn.relu(x)
    h = _conv(p, f"{name}.convolution1", h)
    h = jax.nn.relu(h)
    h = _conv(p, f"{name}.convolution2", h)
    return x + h


def dpt_forward(p: Dict[str, jnp.ndarray], pixel_values: jnp.ndarray,
                arch: DPTArch = DPTArch.large(),
                stem_phases=None) -> jnp.ndarray:
    """[B, 3, H, W] normalized input -> [B, H, W] inverse depth.

    ``stem_phases`` (hybrid only): phase-split form of ``pixel_values``
    (``ops.resize.resize2d_stem_phases``) feeding the BiT embedder conv as a
    dense stride-1 conv; ``pixel_values`` is then unused (DCE'd by XLA)."""
    tokens, gh, gw, cnn_feats = _embed(p, pixel_values, arch,
                                       stem_phases=stem_phases)

    # Hybrid: the two highest-res neck inputs come from the CNN stem, the
    # rest from ViT hooks backbone_out_indices[2:] (modeling_dpt.py:1047-1058)
    vit_hooks = (
        arch.backbone_out_indices[2:] if arch.is_hybrid else arch.backbone_out_indices
    )
    hooked: List[jnp.ndarray] = []
    x = tokens
    for i in range(arch.num_layers):
        x = _vit_layer(p, i, x, arch)
        if i in vit_hooks:
            hooked.append(x)

    # --- reassemble (modeling_dpt.py:555-597, readout_type='project') ------
    feats = list(cnn_feats)  # hybrid: stages 0,1 pass through (Identity)
    offset = len(cnn_feats)
    for j, h in enumerate(hooked):
        i = j + offset
        cls, grid = h[:, 0], h[:, 1:]
        B, N, C = grid.shape
        readout = jnp.broadcast_to(cls[:, None, :], grid.shape)
        merged = jnp.concatenate([grid, readout], axis=-1)
        proj = _linear(p, f"neck.reassemble_stage.readout_projects.{i}.0", merged)
        proj = jax.nn.gelu(proj, approximate=False)
        fm = proj.transpose(0, 2, 1).reshape(B, C, gh, gw)
        fm = _conv(p, f"neck.reassemble_stage.layers.{i}.projection", fm)
        factor = arch.reassemble_factors[i]
        if factor > 1:
            fm = _conv_transpose_block(
                p, f"neck.reassemble_stage.layers.{i}.resize", fm, int(factor)
            )
        elif factor < 1:
            fm = _conv(p, f"neck.reassemble_stage.layers.{i}.resize", fm, stride=2,
                       padding=[(1, 1), (1, 1)])
        feats.append(fm)
    feats = [
        jax.lax.conv_general_dilated(
            fm, p[f"neck.convs.{i}.weight"], (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        for i, fm in enumerate(feats)
    ]

    # --- fusion, top-down (modeling_dpt.py:622-758) -------------------------
    fused = None
    for idx, fm in enumerate(reversed(feats)):
        li = idx  # fusion_stage.layers index
        name = f"neck.fusion_stage.layers.{li}"
        if fused is None:
            h = fm
        else:
            if fused.shape[2:] != fm.shape[2:]:
                fused = _resize_bilinear(fused, fm.shape[2], fm.shape[3],
                                         align_corners=False)
            h = fm + _residual_unit(p, f"{name}.residual_layer1", fused)
        h = _residual_unit(p, f"{name}.residual_layer2", h)
        h = _resize_bilinear(h, h.shape[2] * 2, h.shape[3] * 2, align_corners=True)
        fused = _conv(p, f"{name}.projection", h)

    # --- head (modeling_dpt.py:920-956) -------------------------------------
    h = _conv(p, "head.head.0", fused)
    h = _resize_bilinear(h, h.shape[2] * 2, h.shape[3] * 2, align_corners=True)
    h = _conv(p, "head.head.2", h)
    h = jax.nn.relu(h)
    h = _conv(p, "head.head.4", h)
    h = jax.nn.relu(h)
    return h[:, 0]


def random_params(arch: DPTArch = DPTArch.hybrid(), seed: int = 0,
                  image_size: int = 384) -> Dict[str, np.ndarray]:
    """Random weights with the exact shapes/names of the torch
    ``DPTForDepthEstimation`` state dict (the subset ``dpt_forward``
    consumes). Torch-free: lets benchmarks and the synthetic acceptance rig
    run a full-size DPT-Hybrid (the reference's MiDaS role,
    utils/depth_utils.py:4) without pretrained weights or a torch install.

    Init follows transformers' conventions in spirit (normal(0.02) weights,
    zero biases, unit norms) — magnitudes only matter for finiteness; the
    compute cost is value-independent. Validated shape-for-shape against the
    torch state dict in tests/test_dpt.py."""
    from sdpgs_tpu.models.bit import _make_div

    rng = np.random.default_rng(seed)
    p: Dict[str, np.ndarray] = {}

    def w(name, *shape):
        p[name] = rng.normal(0.0, 0.02, size=shape).astype(np.float32)

    def zeros(name, *shape):
        p[name] = np.zeros(shape, np.float32)

    def ones(name, *shape):
        p[name] = np.ones(shape, np.float32)

    def linear(name, out_f, in_f):
        w(f"{name}.weight", out_f, in_f)
        zeros(f"{name}.bias", out_f)

    def conv(name, out_c, in_c, k, bias=True):
        w(f"{name}.weight", out_c, in_c, k, k)
        if bias:
            zeros(f"{name}.bias", out_c)

    def norm(name, c):
        ones(f"{name}.weight", c)
        zeros(f"{name}.bias", c)

    C, I = arch.hidden_size, arch.intermediate_size

    # --- embeddings -------------------------------------------------------
    if arch.is_hybrid:
        bit = arch.bit
        pre = "dpt.embeddings.backbone.bit"
        emb = _make_div(bit.embedding_size * bit.width_factor)
        conv(f"{pre}.embedder.convolution", emb, 3, 7, bias=False)
        norm(f"{pre}.embedder.norm", emb)
        in_ch = emb
        for si, (depth, hidden) in enumerate(zip(bit.depths, bit.hidden_sizes)):
            out_ch = _make_div(hidden * bit.width_factor)
            mid_ch = _make_div(out_ch / 4)
            for li in range(depth):
                name = f"{pre}.encoder.stages.{si}.layers.{li}"
                if li == 0:
                    conv(f"{name}.downsample.conv", out_ch, in_ch, 1, bias=False)
                    norm(f"{name}.downsample.norm", out_ch)
                conv(f"{name}.conv1", mid_ch, in_ch, 1, bias=False)
                norm(f"{name}.norm1", mid_ch)
                conv(f"{name}.conv2", mid_ch, mid_ch, 3, bias=False)
                norm(f"{name}.norm2", mid_ch)
                conv(f"{name}.conv3", out_ch, mid_ch, 1, bias=False)
                norm(f"{name}.norm3", out_ch)
                in_ch = out_ch
        conv("dpt.embeddings.projection", C, in_ch, 1)
    else:
        conv("dpt.embeddings.patch_embeddings.projection", C, 3,
             arch.patch_size)
    n_tok = (image_size // arch.patch_size) ** 2
    w("dpt.embeddings.position_embeddings", 1, n_tok + 1, C)
    zeros("dpt.embeddings.cls_token", 1, 1, C)

    # --- ViT encoder ------------------------------------------------------
    for i in range(arch.num_layers):
        pre = f"dpt.encoder.layer.{i}"
        norm(f"{pre}.layernorm_before", C)
        for nm in ("query", "key", "value"):
            linear(f"{pre}.attention.attention.{nm}", C, C)
        linear(f"{pre}.attention.output.dense", C, C)
        norm(f"{pre}.layernorm_after", C)
        linear(f"{pre}.intermediate.dense", I, C)
        linear(f"{pre}.output.dense", C, I)

    # --- neck -------------------------------------------------------------
    F = arch.fusion_hidden_size
    n_cnn = 2 if arch.is_hybrid else 0
    for i in range(4):
        nh = arch.neck_hidden_sizes[i]
        if i >= n_cnn:
            linear(f"neck.reassemble_stage.readout_projects.{i}.0", C, 2 * C)
            conv(f"neck.reassemble_stage.layers.{i}.projection", nh, C, 1)
            factor = arch.reassemble_factors[i]
            if factor > 1:
                k = int(factor)  # ConvTranspose2d: torch layout [in, out, k, k]
                w(f"neck.reassemble_stage.layers.{i}.resize.weight", nh, nh, k, k)
                zeros(f"neck.reassemble_stage.layers.{i}.resize.bias", nh)
            elif factor < 1:
                conv(f"neck.reassemble_stage.layers.{i}.resize", nh, nh, 3)
        conv(f"neck.convs.{i}", F, nh, 3, bias=False)
    for li in range(4):
        name = f"neck.fusion_stage.layers.{li}"
        for res in ("residual_layer1", "residual_layer2"):
            conv(f"{name}.{res}.convolution1", F, F, 3)
            conv(f"{name}.{res}.convolution2", F, F, 3)
        conv(f"{name}.projection", F, F, 1)

    # --- head -------------------------------------------------------------
    conv("head.head.0", F // 2, F, 3)
    conv("head.head.2", 32, F // 2, 3)
    conv("head.head.4", 1, 32, 1)
    return p


def save_params(path, params: Dict[str, np.ndarray],
                arch: DPTArch | None = None) -> None:
    """Save a DPT param dict as .npz, embedding the architecture as a JSON
    ``__arch__`` entry so loaders need no shape heuristics (full-size
    checkpoints from tools/convert_dpt.py omit it and rely on the
    large/hybrid key-prefix detection)."""
    import json

    out = {k: np.asarray(v) for k, v in params.items()}
    if arch is not None:
        d = dataclasses.asdict(arch)
        out["__arch__"] = np.frombuffer(
            json.dumps(d).encode(), dtype=np.uint8
        )
    np.savez(path, **out)


def arch_from_json_bytes(raw: np.ndarray) -> DPTArch:
    """Rebuild a DPTArch from the ``__arch__`` npz entry."""
    import json

    from sdpgs_tpu.models.bit import BitArch

    d = json.loads(bytes(np.asarray(raw, np.uint8)).decode())
    bit = d.pop("bit", None)
    if bit is not None:
        bit = BitArch(**{k: tuple(v) if isinstance(v, list) else v
                         for k, v in bit.items()})
    return DPTArch(**{k: tuple(v) if isinstance(v, list) else v
                      for k, v in d.items()}, bit=bit)


class DPTDepthModel:
    """Loaded DPT with an ``estimate_depth``-style interface
    (reference utils/depth_utils.py:18-45: resize to 384x512, normalize,
    forward, resize back)."""

    def __init__(self, params: Dict[str, np.ndarray], arch: DPTArch = DPTArch.large()):
        self.params = {k: jnp.asarray(v) for k, v in params.items()}
        self.arch = arch

    @classmethod
    def load(cls, path, arch: DPTArch = DPTArch.large()) -> "DPTDepthModel":
        return cls(dict(np.load(path)), arch)

    def __call__(self, image: jnp.ndarray) -> jnp.ndarray:
        """[3, H, W] image in [0, 1] -> [H, W] inverse depth (differentiable)."""
        H, W = image.shape[1:]
        x = _resize_bilinear(image[None], 384, 512, align_corners=False)
        x = (x - 0.5) / 0.5                                  # DPT normalization
        depth = dpt_forward(self.params, x, self.arch)       # [1, 384, 512]
        out = _resize_bilinear(depth[:, None], H, W, align_corners=False)
        return out[0, 0]
