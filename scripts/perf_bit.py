"""BiT stem layout experiment: NCHW (torch layout, current) vs NHWC
(TPU-native lanes-on-channels) vs NHWC+bf16 — fwd and fwd+input-grad.
Decides whether to rewrite bit.py/dpt.py conv internals in NHWC.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_bit.py
"""

from __future__ import annotations

import time
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

N = 10


def timed(name, body, *args):
    def loop(eps, *a):
        def it(i, eps):
            return body(eps, *a) * 0.0 + eps
        return jax.lax.fori_loop(0, N, it, eps)

    fn = jax.jit(loop)
    out = fn(jnp.float32(0.0), *args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(out, *args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / N
    print(f"{name:44s} {dt*1000:7.2f} ms", flush=True)
    return dt


# ---- NHWC variant of bit.py (prototype; weights pre-transposed) -----------

def _ws_weight_hwio(w, eps=1e-8):
    mu = jnp.mean(w, axis=(0, 1, 2), keepdims=True)
    var = jnp.var(w, axis=(0, 1, 2), keepdims=True)
    return (w - mu) * jax.lax.rsqrt(var + eps)


def _same_pad_nhwc(x, k, s):
    def pad_amount(n):
        pad = max(k - s, 0) if n % s == 0 else max(k - n % s, 0)
        return (pad // 2, pad - pad // 2)

    ph = pad_amount(x.shape[1])
    pw = pad_amount(x.shape[2])
    return jnp.pad(x, ((0, 0), ph, pw, (0, 0)))


def _ws_conv_nhwc(p, name, x, k, stride=1):
    w = _ws_weight_hwio(p[f"{name}.weight"])
    if k > 1:
        x = _same_pad_nhwc(x, k, stride)
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _gn_nhwc(p, name, x, groups, act=True, eps=1e-5):
    B, H, W, C = x.shape
    xg = x.reshape(B, H, W, groups, C // groups)
    mu = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xg, axis=(1, 2, 4), keepdims=True)
    xn = ((xg - mu) * jax.lax.rsqrt(var + eps)).reshape(B, H, W, C)
    out = xn * p[f"{name}.weight"] + p[f"{name}.bias"]
    return jax.nn.relu(out) if act else out


def _maxpool_nhwc(x, k=3, s=2):
    x = _same_pad_nhwc(x, k, s)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1), "VALID")


def bit_backbone_nhwc(p, x_nhwc, arch, prefix="bit"):
    from sdpgs_tpu.models.bit import _make_div

    G = arch.num_groups
    x = _ws_conv_nhwc(p, f"{prefix}.embedder.convolution", x_nhwc, 7, 2)
    x = _gn_nhwc(p, f"{prefix}.embedder.norm", x, G)
    x = _maxpool_nhwc(x)

    feats = []
    for si, (depth, hidden) in enumerate(zip(arch.depths, arch.hidden_sizes)):
        stage_stride = 1 if si == 0 else 2
        for li in range(depth):
            name = f"{prefix}.encoder.stages.{si}.layers.{li}"
            stride = stage_stride if li == 0 else 1
            shortcut = x
            if li == 0:
                shortcut = _ws_conv_nhwc(p, f"{name}.downsample.conv", x, 1, stride)
                shortcut = _gn_nhwc(p, f"{name}.downsample.norm", shortcut, G, act=False)
            h = _ws_conv_nhwc(p, f"{name}.conv1", x, 1)
            h = _gn_nhwc(p, f"{name}.norm1", h, G)
            h = _ws_conv_nhwc(p, f"{name}.conv2", h, 3, stride)
            h = _gn_nhwc(p, f"{name}.norm2", h, G)
            h = _ws_conv_nhwc(p, f"{name}.conv3", h, 1)
            h = _gn_nhwc(p, f"{name}.norm3", h, G, act=False)
            x = jax.nn.relu(h + shortcut)
        feats.append(x)
    return feats


def main():
    from sdpgs_tpu.models.bit import BitArch, bit_backbone
    from sdpgs_tpu.models.dpt import DPTArch, random_params

    arch = DPTArch.hybrid()
    raw = random_params(arch, seed=0)
    pre = "dpt.embeddings.backbone.bit"
    p = {k: jnp.asarray(v) for k, v in raw.items() if k.startswith(pre)}
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 3, 384, 512)).astype(np.float32))
    x_nhwc = jnp.transpose(x, (0, 2, 3, 1))

    # pre-transposed OIHW -> HWIO weights for the NHWC variant
    p_hwio = {
        k: (jnp.transpose(v, (2, 3, 1, 0)) if k.endswith(".weight") and v.ndim == 4 else v)
        for k, v in p.items()
    }

    def nchw_fwd(eps, p):
        with jax.default_matmul_precision("default"):
            feats = bit_backbone(p, x + eps, arch.bit, prefix=pre)
            return sum(jnp.sum(f) for f in feats)

    def nchw_fg(eps, p):
        def loss(xx):
            with jax.default_matmul_precision("default"):
                return sum(jnp.sum(f) for f in bit_backbone(p, xx, arch.bit, prefix=pre))
        return jnp.sum(jax.grad(loss)(x + eps))

    def nhwc_fwd(eps, p):
        with jax.default_matmul_precision("default"):
            feats = bit_backbone_nhwc(p, x_nhwc + eps, arch.bit, prefix=pre)
            return sum(jnp.sum(f) for f in feats)

    def nhwc_fg(eps, p):
        def loss(xx):
            with jax.default_matmul_precision("default"):
                return sum(jnp.sum(f) for f in bit_backbone_nhwc(p, xx, arch.bit, prefix=pre))
        return jnp.sum(jax.grad(loss)(x_nhwc + eps))

    pb = {k: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v
          for k, v in p_hwio.items()}
    xb = x_nhwc.astype(jnp.bfloat16)

    def nhwc_bf16_fwd(eps, p):
        with jax.default_matmul_precision("default"):
            feats = bit_backbone_nhwc(p, (x_nhwc + eps).astype(jnp.bfloat16),
                                      arch.bit, prefix=pre)
            return sum(jnp.sum(f.astype(jnp.float32)) for f in feats)

    def nhwc_bf16_fg(eps, p):
        def loss(xx):
            with jax.default_matmul_precision("default"):
                return sum(jnp.sum(f.astype(jnp.float32)) for f in
                           bit_backbone_nhwc(p, xx.astype(jnp.bfloat16),
                                             arch.bit, prefix=pre))
        return jnp.sum(jax.grad(loss)(x_nhwc + eps))

    # numerical sanity: NHWC matches NCHW
    fa = bit_backbone(p, x, arch.bit, prefix=pre)
    fb = bit_backbone_nhwc(p_hwio, x_nhwc, arch.bit, prefix=pre)
    for a, b in zip(fa, fb):
        err = float(jnp.max(jnp.abs(a - jnp.transpose(b, (0, 3, 1, 2)))))
        print(f"layout parity max err: {err:.3e}", flush=True)

    # per-stage split (NCHW): stem only, then cumulative through each stage
    from sdpgs_tpu.models.bit import _gn, _maxpool_same, _ws_conv

    def through_stage(n_stages):
        def body(eps, p):
            def run(xx):
                with jax.default_matmul_precision("default"):
                    G = arch.bit.num_groups
                    h = _ws_conv(p, f"{pre}.embedder.convolution", xx, 7, 2)
                    h = _gn(p, f"{pre}.embedder.norm", h, G)
                    h = _maxpool_same(h)
                    feats = []
                    for si in range(n_stages):
                        depth = arch.bit.depths[si]
                        stage_stride = 1 if si == 0 else 2
                        for li in range(depth):
                            name = f"{pre}.encoder.stages.{si}.layers.{li}"
                            stride = stage_stride if li == 0 else 1
                            shortcut = h
                            if li == 0:
                                shortcut = _ws_conv(p, f"{name}.downsample.conv", h, 1, stride)
                                shortcut = _gn(p, f"{name}.downsample.norm", shortcut, G, act=False)
                            u = _ws_conv(p, f"{name}.conv1", h, 1)
                            u = _gn(p, f"{name}.norm1", u, G)
                            u = _ws_conv(p, f"{name}.conv2", u, 3, stride)
                            u = _gn(p, f"{name}.norm2", u, G)
                            u = _ws_conv(p, f"{name}.conv3", u, 1)
                            u = _gn(p, f"{name}.norm3", u, G, act=False)
                            h = jax.nn.relu(u + shortcut)
                    return jnp.sum(h)
            return jnp.sum(jax.grad(run)(x + eps))
        return body

    for ns in range(4):
        timed(f"bit NCHW f/g through stage {ns}", through_stage(ns), p)

    timed("bit NCHW fwd", nchw_fwd, p)
    timed("bit NCHW fwd+input grad", nchw_fg, p)
    timed("bit NHWC fwd", nhwc_fwd, p_hwio)
    timed("bit NHWC fwd+input grad", nhwc_fg, p_hwio)
    timed("bit NHWC bf16 fwd", nhwc_bf16_fwd, pb)
    timed("bit NHWC bf16 fwd+input grad", nhwc_bf16_fg, pb)


if __name__ == "__main__":
    main()
