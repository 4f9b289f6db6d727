"""BiT stem maxpool 3x3/2: monolithic reduce_window vs separable
(1x3/s(1,2) then 3x1/s(2,1)) — forward-identical (max is associative),
backward = two smaller select_and_scatters instead of one 9-tap one.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_maxpool.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from sdpgs_tpu.models.bit import _same_pad

N = 20


def timed(name, body, n=N):
    def loop(eps):
        def it(i, eps):
            return body(eps) * 0.0 + eps
        return jax.lax.fori_loop(0, n, it, eps)

    fn = jax.jit(loop)
    out = fn(jnp.float32(0.0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(out)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:46s} {dt*1000:7.2f} ms", flush=True)
    return dt


def pool_mono(x):
    x = _same_pad(x, 3, 2, value=0.0)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2), "VALID")


def pool_sep(x):
    x = _same_pad(x, 3, 2, value=0.0)
    r = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 1, 3), (1, 1, 1, 2), "VALID")
    return jax.lax.reduce_window(
        r, -jnp.inf, jax.lax.max, (1, 1, 3, 1), (1, 1, 2, 1), "VALID")


def main():
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(1, 64, 192, 256)).astype(np.float32))
    x0 = jax.block_until_ready(x0)

    a = jax.jit(pool_mono)(x0)
    b = jax.jit(pool_sep)(x0)
    print("fwd equal:", bool(jnp.all(a == b)), a.shape, flush=True)
    ga = jax.jit(jax.grad(lambda x: jnp.sum(pool_mono(x) ** 2)))(x0)
    gb = jax.jit(jax.grad(lambda x: jnp.sum(pool_sep(x) ** 2)))(x0)
    # ties can route grads differently between formulations; report count
    print("grad mismatch elems:",
          int(jnp.sum(jnp.abs(ga - gb) > 1e-6)), flush=True)

    timed("maxpool mono f/g", lambda e: jnp.sum(jax.grad(
        lambda x: jnp.sum(pool_mono(x) ** 2))(x0 + e)))
    timed("maxpool separable f/g", lambda e: jnp.sum(jax.grad(
        lambda x: jnp.sum(pool_sep(x) ** 2))(x0 + e)))
    # bf16 variant (the net runs bf16 params; pooled activations are bf16)
    xb = x0.astype(jnp.bfloat16)
    timed("maxpool mono f/g bf16", lambda e: jnp.sum(jax.grad(
        lambda x: jnp.sum((pool_mono(x.astype(jnp.bfloat16))
                           .astype(jnp.float32)) ** 2))(x0 + e)))


if __name__ == "__main__":
    main()
