"""DPT-Hybrid section timing on TPU: BiT stem, ViT encoder, neck
(reassemble + convs), fusion + head — fwd and fwd+input-grad, at the
bench precision (f32 params, 'default' single-pass-bf16 matmul context).
Device-side fori loops.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_dpt.py
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
    print(f"{name:40s} {dt*1000:7.2f} ms", flush=True)
    return dt


def main():
    from sdpgs_tpu.models.dpt import (
        DPTArch, _embed, _vit_layer, dpt_forward, random_params,
    )

    arch = DPTArch.hybrid()
    p = {k: jnp.asarray(v) for k, v in random_params(arch, seed=0).items()}
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 3, 384, 512)).astype(np.float32))

    # params ride as jit ARGUMENTS: closure capture bakes ~470MB of
    # constants into the HLO and the remote-compile relay 413s.
    def full_fwd(eps, p):
        with jax.default_matmul_precision("default"):
            return jnp.sum(dpt_forward(p, x + eps, arch))

    def full_fwd_grad(eps, p):
        def loss(xx):
            with jax.default_matmul_precision("default"):
                return jnp.sum(dpt_forward(p, xx, arch))
        return jnp.sum(jax.grad(loss)(x + eps))

    def embed_only(eps, p):
        with jax.default_matmul_precision("default"):
            tokens, gh, gw, cnn = _embed(p, x + eps, arch)
            return jnp.sum(tokens) + sum(jnp.sum(c) for c in cnn)

    def embed_vit(eps, p):
        with jax.default_matmul_precision("default"):
            tokens, gh, gw, cnn = _embed(p, x + eps, arch)
            h = tokens
            for i in range(arch.num_layers):
                h = _vit_layer(p, i, h, arch)
            return jnp.sum(h) + sum(jnp.sum(c) for c in cnn)

    timed("embed (BiT stem + patchify)", embed_only, p)
    timed("embed + 12 ViT layers", embed_vit, p)
    timed("full fwd", full_fwd, p)
    timed("full fwd + input grad", full_fwd_grad, p)

    # bf16 params variant
    pb = {k: (v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v)
          for k, v in p.items()}

    def full_fwd_bf16(eps, pb):
        with jax.default_matmul_precision("default"):
            return jnp.sum(dpt_forward(pb, (x + eps).astype(jnp.bfloat16),
                                       arch).astype(jnp.float32))

    def full_fwd_grad_bf16(eps, pb):
        def loss(xx):
            with jax.default_matmul_precision("default"):
                return jnp.sum(dpt_forward(pb, xx.astype(jnp.bfloat16),
                                           arch).astype(jnp.float32))
        return jnp.sum(jax.grad(loss)(x + eps))

    timed("full fwd (bf16 params+acts)", full_fwd_bf16, pb)
    timed("full fwd + input grad (bf16)", full_fwd_grad_bf16, pb)


if __name__ == "__main__":
    main()
