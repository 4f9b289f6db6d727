"""Isolated timing: fused Pallas preprocess+SH vs the XLA path, fwd and
fwd+grad, at bench shapes — including the wrapper's transposes, which are
the suspected tax (bench regressed 75.6 -> 71.9 plain with the kernel on).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_preprocess.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from sdpgs_tpu.core import sh as sh_lib
from sdpgs_tpu.core.camera import Camera
from sdpgs_tpu.ops.rasterize.preprocess import preprocess_fused
from sdpgs_tpu.ops.rasterize.preprocess_pallas import (
    _cam_vec,
    _pp_rows,
    preprocess_color_pallas,
)

P = 1 << 17
DEG = 3


def timed(name, body, n=20):
    def loop(eps):
        def it(i, e):
            return body(e) * 0.0 + e
        return jax.lax.fori_loop(0, n, it, eps)

    fn = jax.jit(loop)
    out = jax.block_until_ready(fn(jnp.float32(0.0)))
    t0 = time.perf_counter()
    jax.block_until_ready(fn(out))
    dt = (time.perf_counter() - t0) / n
    print(f"{name:44s} {dt*1000:7.3f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.normal(size=(P, 3)).astype(np.float32) + [0, 0, 4])
    scale = jnp.asarray(rng.uniform(0.01, 0.05, (P, 3)).astype(np.float32))
    quat = rng.normal(size=(P, 4)).astype(np.float32)
    quat = jnp.asarray(quat / np.linalg.norm(quat, axis=-1, keepdims=True))
    feats = jnp.asarray(rng.normal(size=(P, 16, 3)).astype(np.float32) * 0.2)
    alive = jnp.asarray((rng.random(P) > 0.5).astype(np.float32))
    cam = Camera.create(R=np.eye(3), T=np.zeros(3), fovx=0.9, fovy=0.7,
                        width=504, height=378)

    def xla_fwd(e):
        prep = preprocess_fused(xyz + e, scale, quat, cam, alive)
        dirs = (xyz + e) - cam.cam_pos[None, :]
        dirs = dirs / jnp.sqrt(jnp.sum(dirs * dirs, -1, keepdims=True) + 1e-24)
        color = jnp.maximum(sh_lib.eval_sh(DEG, feats, dirs) + 0.5, 0.0)
        return (jnp.sum(prep.mean2d) + jnp.sum(prep.conic)
                + jnp.sum(prep.depth) + jnp.sum(color))

    def ker_fwd(e):
        prep, color = preprocess_color_pallas(
            xyz + e, scale, quat, feats, alive, cam, DEG)
        return (jnp.sum(prep.mean2d) + jnp.sum(prep.conic)
                + jnp.sum(prep.depth) + jnp.sum(color))

    # rows-only: the kernel WITHOUT the wrapper transposes
    geoT = jnp.concatenate(
        [xyz.T, scale.T, quat.T, alive.reshape(1, P)], 0)
    shT = feats.reshape(P, 48).T
    cv = _cam_vec(cam)

    def rows_fwd(e):
        out = _pp_rows(geoT + e, shT, cv, DEG, 504, 378, (0.2, 0.3), False)
        return jnp.sum(out)

    timed("XLA fwd", xla_fwd)
    timed("kernel fwd (incl. transposes)", ker_fwd)
    timed("kernel fwd (rows only)", rows_fwd)
    timed("XLA f/g", lambda e: jax.grad(xla_fwd)(e))
    timed("kernel f/g (incl. transposes)", lambda e: jax.grad(ker_fwd)(e))
    timed("kernel f/g (rows only)", lambda e: jax.grad(rows_fwd)(e))


if __name__ == "__main__":
    main()
