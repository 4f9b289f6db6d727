"""R4 DPT-Hybrid fine-grained split (bf16 params+acts, 'default' precision,
the production bench config) to find the fat in the 6.7 ms fwd / 13.5 ms
f/g budget: BiT stem conv vs bottleneck stages, ViT, neck reassemble,
fusion, head. Device-side fori loops.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_dpt2.py
"""

from __future__ import annotations

import time

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
    print(f"{name:46s} {dt*1000:7.2f} ms", flush=True)
    return dt


def main():
    from sdpgs_tpu.models.bit import (
        BitArch, _gn, _maxpool_same, _ws_conv, bit_backbone,
    )
    from sdpgs_tpu.models.dpt import DPTArch, dpt_forward, random_params

    arch = DPTArch.hybrid()
    p0 = random_params(arch, seed=0)
    p = {k: (jnp.asarray(v).astype(jnp.bfloat16)
             if np.asarray(v).dtype == np.float32 else jnp.asarray(v))
         for k, v in p0.items()}
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 3, 384, 512)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    bit_prefix = "dpt.embeddings.backbone.bit"
    barch = BitArch()

    def fg(body):
        def run(eps, p):
            def loss(xx):
                with jax.default_matmul_precision("default"):
                    return body(xx, p)
            v, gr = jax.value_and_grad(loss)(x + eps.astype(jnp.bfloat16))
            return (v + jnp.sum(gr)).astype(jnp.float32)
        return run

    def fwd(body):
        def run(eps, p):
            with jax.default_matmul_precision("default"):
                return body(x + eps.astype(jnp.bfloat16), p).astype(jnp.float32)
        return run

    def stem_only(xx, p):
        h = _ws_conv(p, f"{bit_prefix}.embedder.convolution", xx, 7, 2)
        h = _gn(p, f"{bit_prefix}.embedder.norm", h, barch.num_groups)
        return jnp.sum(_maxpool_same(h))

    def backbone_all(xx, p):
        feats = bit_backbone(p, xx, barch, prefix=bit_prefix)
        return sum(jnp.sum(f) for f in feats)

    def full(xx, p):
        return jnp.sum(dpt_forward(p, xx, arch))

    timed("stem conv+gn+maxpool fwd", fwd(stem_only), p)
    timed("stem conv+gn+maxpool f/g", fg(stem_only), p)
    timed("BiT backbone (stem+16 blocks) fwd", fwd(backbone_all), p)
    timed("BiT backbone f/g", fg(backbone_all), p)
    timed("full DPT fwd", fwd(full), p)
    timed("full DPT f/g", fg(full), p)

    # stage-isolated: run stage tensors directly
    with jax.default_matmul_precision("default"):
        h = _ws_conv(p, f"{bit_prefix}.embedder.convolution", x, 7, 2)
        h = _gn(p, f"{bit_prefix}.embedder.norm", h, barch.num_groups)
        s0_in = jax.block_until_ready(_maxpool_same(h))

    def stages_only(xx_eps, p):
        # run the bottleneck stages from the pooled stem output
        from sdpgs_tpu.models import bit as bit_mod
        feats = []
        h = s0_in + xx_eps
        G = barch.num_groups
        for si, (depth, hidden) in enumerate(zip(barch.depths, barch.hidden_sizes)):
            stage_stride = 1 if si == 0 else 2
            for li in range(depth):
                name = f"{bit_prefix}.encoder.stages.{si}.layers.{li}"
                stride = stage_stride if li == 0 else 1
                shortcut = h
                if li == 0:
                    shortcut = bit_mod._ws_conv(p, f"{name}.downsample.conv", h, 1, stride)
                    shortcut = bit_mod._gn(p, f"{name}.downsample.norm", shortcut, G, act=False)
                t = bit_mod._ws_conv(p, f"{name}.conv1", h, 1)
                t = bit_mod._gn(p, f"{name}.norm1", t, G)
                t = bit_mod._ws_conv(p, f"{name}.conv2", t, 3, stride)
                t = bit_mod._gn(p, f"{name}.norm2", t, G)
                t = bit_mod._ws_conv(p, f"{name}.conv3", t, 1)
                t = bit_mod._gn(p, f"{name}.norm3", t, G, act=False)
                h = jax.nn.relu(t + shortcut)
            feats.append(h)
        return sum(jnp.sum(f) for f in feats)

    def stages_run(eps, p):
        with jax.default_matmul_precision("default"):
            return stages_only(eps.astype(jnp.bfloat16), p).astype(jnp.float32)
    timed("BiT stages only (from pooled stem) fwd", stages_run, p)


if __name__ == "__main__":
    main()
