"""Device-side timing of the pseudo-window step's pieces (DPT-in-the-loop,
reference train.py:138-188). Each section runs N times inside ONE jit via
lax.fori_loop (see perf_sections.py); DPT params ride as jit ARGUMENTS (a
closure-captured net bakes ~470MB constants into the HLO and the relay
rejects the payload).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_pseudo.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

WIDTH, HEIGHT = 504, 378
CAPACITY = 1 << 17
ALIVE = 60_000
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
    print(f"{name:38s} {dt*1000:7.2f} ms", flush=True)
    return dt


def main():
    from sdpgs_tpu.config import RasterizeConfig, TrainConfig
    from sdpgs_tpu.core.camera import Camera
    from sdpgs_tpu.core.gaussians import create_from_points
    from sdpgs_tpu.models.depth_estimator import mono_depth_from_params
    from sdpgs_tpu.models.dpt import DPTArch, random_params
    from sdpgs_tpu.render import render

    rng = np.random.default_rng(0)
    pts = (rng.normal(size=(ALIVE, 3)) * [1.2, 0.9, 0.6] + [0, 0, 4.0]).astype(np.float32)
    cols = rng.uniform(size=(ALIVE, 3)).astype(np.float32)
    g = create_from_points(pts, cols, CAPACITY, init_scale=np.full(ALIVE, 1e-4))
    cam = Camera.create(R=np.eye(3), T=np.array([0.05, 0.02, 0.0]), fovx=0.9,
                        fovy=0.7, width=WIDTH, height=HEIGHT)
    cfg = RasterizeConfig(chunk=64)
    bg = jnp.zeros(3)

    mono32 = mono_depth_from_params(
        random_params(DPTArch.hybrid(), seed=0), arch=DPTArch.hybrid()
    )
    mono16 = mono_depth_from_params(
        {k: v for k, v in random_params(DPTArch.hybrid(), seed=0).items()},
        arch=DPTArch.hybrid(), dtype=jnp.bfloat16,
    )
    img = jnp.asarray(rng.uniform(size=(3, HEIGHT, WIDTH)).astype(np.float32))

    def dpt_fwd32(eps, params, image):
        return jnp.sum(mono32.apply(params, image + eps))

    def dpt_fwdbwd32(eps, params, image):
        return jnp.sum(jax.grad(
            lambda im: jnp.sum(mono32.apply(params, im))
        )(image + eps))

    def dpt_fwd16(eps, params, image):
        return jnp.sum(mono16.apply(params, image + eps))

    def dpt_fwdbwd16(eps, params, image):
        return jnp.sum(jax.grad(
            lambda im: jnp.sum(mono16.apply(params, im))
        )(image + eps))

    def render_fwd(eps):
        out = render(cam, g.replace(xyz=g.xyz + eps), cfg, bg, 3)
        return jnp.sum(out.color) + jnp.sum(out.depth)

    def render_fwdbwd(eps):
        def loss(xyz):
            out = render(cam, g.replace(xyz=xyz), cfg, bg, 3)
            return jnp.sum(out.color) + jnp.sum(out.depth) * 1e-3
        return jnp.sum(jax.grad(loss)(g.xyz + eps))

    def pseudo_chain_fwdbwd(eps, params):
        """render -> DPT(rendered) -> pearson-ish scalar, grads to xyz —
        the pseudo branch's actual composition."""
        def loss(xyz):
            out = render(cam, g.replace(xyz=xyz), cfg, bg, 3)
            mono = mono32.apply(params, out.color.transpose(2, 0, 1))
            d = out.depth.reshape(-1)
            m = -mono.reshape(-1)
            dc = d - d.mean()
            mc = m - m.mean()
            pl = 1.0 - jnp.sum(dc * mc) / jnp.maximum(
                jnp.linalg.norm(dc) * jnp.linalg.norm(mc), 1e-8
            )
            return pl
        return jnp.sum(jax.grad(loss)(g.xyz + eps))

    params16 = mono16.params
    timed("dpt-hybrid fwd f32", dpt_fwd32, mono32.params, img)
    timed("dpt-hybrid fwd+input-grad f32", dpt_fwdbwd32, mono32.params, img)
    timed("dpt-hybrid fwd bf16", dpt_fwd16, params16, img)
    timed("dpt-hybrid fwd+input-grad bf16", dpt_fwdbwd16, params16, img)
    timed("pseudo render fwd", render_fwd)
    timed("pseudo render fwd+bwd(xyz)", render_fwdbwd)
    timed("pseudo chain render+dpt fwd+bwd", pseudo_chain_fwdbwd, mono32.params)


if __name__ == "__main__":
    main()
