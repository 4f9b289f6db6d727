"""On-chip check + timing of the Pallas displacement-window z-buffer
(ops/warp_pallas.py) vs the XLA scatter-min path at bench shapes
(504x378, V=3 train views, B=64-camera prefetch batches).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_warp.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from sdpgs_tpu.losses.depth import (
    reproject_fused_depth,
    reproject_fused_depth_batch,
)

W, H, V, B = 504, 378, 3, 64


def main():
    rng = np.random.default_rng(0)
    K = jnp.asarray(np.array(
        [[521.0, 0, W / 2], [0, 521.0, H / 2], [0, 0, 1]], np.float32))
    depths = jnp.asarray(rng.uniform(2.5, 5.5, (V, H, W)).astype(np.float32))
    R_t = jnp.asarray(np.stack([np.eye(3, dtype=np.float32)] * V))
    t_t = jnp.asarray(np.stack(
        [[0.2 * (i - 1), 0.0, 0.0] for i in range(V)]).astype(np.float32))
    R_p = jnp.asarray(np.stack([np.eye(3, dtype=np.float32)] * B))
    t_p = jnp.asarray(
        (rng.uniform(-0.05, 0.05, (B, 3)) * [1, 1, 0.2]).astype(np.float32))

    fn = jax.jit(reproject_fused_depth_batch)
    t0 = time.time()
    fused, w, outl = fn(depths, K, R_t, t_t, R_p, t_p)
    jax.block_until_ready(fused)
    print(f"kernel path compiled+ran in {time.time()-t0:.1f}s "
          f"outliers={np.asarray(outl).sum()}", flush=True)

    # exactness vs the XLA scatter path on a few cameras
    for b in (0, 1, B - 1):
        f_ref, w_ref = jax.jit(reproject_fused_depth)(
            depths, K, R_t, t_t, R_p[b], t_p[b])
        err = float(jnp.max(jnp.abs(fused[b] - f_ref)))
        werr = float(jnp.max(jnp.abs(w[b] - w_ref)))
        print(f"cam {b}: max|fused-ref|={err:.2e} max|w-ref|={werr:.0f}",
              flush=True)

    # timing: chained batches (device-side dependency via input offset)
    def loop(eps):
        def it(i, eps):
            f, _, _ = reproject_fused_depth_batch(
                depths + eps, K, R_t, t_t, R_p, t_p)
            return jnp.max(f) * 0.0 + eps
        return jax.lax.fori_loop(0, 5, it, eps)

    lf = jax.jit(loop)
    jax.block_until_ready(lf(jnp.float32(0.0)))
    t0 = time.perf_counter()
    jax.block_until_ready(lf(jnp.float32(0.0)))
    dt = (time.perf_counter() - t0) / 5
    print(f"kernel batch ({B} cams x {V} views): {dt*1000:.2f} ms "
          f"= {dt*1000/B:.3f} ms/cam", flush=True)

    # XLA scatter baseline, same harness
    vm = jax.vmap(reproject_fused_depth,
                  in_axes=(None, None, None, None, 0, 0))

    def loop_x(eps):
        def it(i, eps):
            f, _ = vm(depths + eps, K, R_t, t_t, R_p, t_p)
            return jnp.max(f) * 0.0 + eps
        return jax.lax.fori_loop(0, 5, it, eps)

    lx = jax.jit(loop_x)
    jax.block_until_ready(lx(jnp.float32(0.0)))
    t0 = time.perf_counter()
    jax.block_until_ready(lx(jnp.float32(0.0)))
    dt = (time.perf_counter() - t0) / 5
    print(f"XLA scatter batch: {dt*1000:.2f} ms = {dt*1000/B:.3f} ms/cam",
          flush=True)


if __name__ == "__main__":
    main()
