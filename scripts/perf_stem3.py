"""Micro-split of the s2d stem matmul path: patches build, einsum alone,
sin+sum alone — to find the 2.7 ms common cost.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_stem3.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

N = 20


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
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    Ho, Wo = 192, 256
    patches = jnp.asarray(rng.normal(size=(1, 192, Ho, Wo)).astype(np.float32))
    wf = jnp.asarray(rng.normal(size=(64, 192)).astype(np.float32))
    xs = jnp.asarray(rng.normal(size=(1, 12, 195, 259)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(1, 64, Ho, Wo)).astype(np.float32))

    def einsum_only(eps, patches, wf):
        with jax.default_matmul_precision("default"):
            out = jnp.einsum("bkhw,ok->bohw", patches + eps, wf)
        return jnp.sum(out)

    def einsum_2d(eps, patches, wf):
        pf = (patches + eps).reshape(192, Ho * Wo)
        with jax.default_matmul_precision("default"):
            out = jnp.dot(wf, pf, preferred_element_type=jnp.float32)
        return jnp.sum(out)

    def einsum_2d_bf16(eps, patches, wf):
        pf = (patches + eps).reshape(192, Ho * Wo).astype(jnp.bfloat16)
        with jax.default_matmul_precision("default"):
            out = jnp.dot(wf.astype(jnp.bfloat16), pf,
                          preferred_element_type=jnp.float32)
        return jnp.sum(out)

    def patches_only(eps, xs):
        ps = jnp.concatenate(
            [xs[:, :, dh:dh + Ho, dw:dw + Wo] + eps
             for dh in range(4) for dw in range(4)], axis=1)
        return jnp.sum(ps[:, ::7])

    def sin_sum(eps, y):
        return jnp.sum(jnp.sin(y + eps))

    timed("einsum bkhw,ok->bohw", einsum_only, patches, wf)
    timed("dot [64,192]x[192,HW]", einsum_2d, patches, wf)
    timed("dot bf16", einsum_2d_bf16, patches, wf)
    timed("patches build (16 slices+concat)", patches_only, xs)
    timed("sin+sum on [1,64,192,256]", sin_sum, y)


if __name__ == "__main__":
    main()
