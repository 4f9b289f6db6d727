"""Round 2 of pseudo-step perf: DPT matmul-precision variants + accuracy
deltas + V-batch superlinearity section split. One process, device-side
loops (see perf_pseudo.py).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_pseudo2.py
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
    print(f"{name:44s} {dt*1000:7.2f} ms", flush=True)
    return dt


def main():
    from sdpgs_tpu.config import RasterizeConfig
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

    raw = random_params(DPTArch.hybrid(), seed=0)
    monos = {
        prec: mono_depth_from_params(raw, arch=DPTArch.hybrid(),
                                     matmul_precision=prec)
        for prec in ("default", "BF16_BF16_F32_X3", "highest")
    }
    img = jnp.asarray(rng.uniform(size=(3, HEIGHT, WIDTH)).astype(np.float32))

    # --- accuracy: precision variants vs highest on the same input --------
    outs = {}
    for prec, mono in monos.items():
        outs[prec] = jax.jit(mono.apply)(mono.params, img)
    hi = outs["highest"]
    scale = float(jnp.max(hi) - jnp.min(hi)) or 1.0
    for prec in ("default", "BF16_BF16_F32_X3"):
        err = float(jnp.max(jnp.abs(outs[prec] - hi))) / scale
        print(f"dpt {prec:12s} vs highest: rel-range err {err:.5f}", flush=True)

    # --- speed ------------------------------------------------------------
    for prec, mono in monos.items():
        def fwd(eps, params, image, mono=mono):
            return jnp.sum(mono.apply(params, image + eps))

        def fwdbwd(eps, params, image, mono=mono):
            return jnp.sum(jax.grad(
                lambda im: jnp.sum(mono.apply(params, im))
            )(image + eps))

        timed(f"dpt fwd {prec}", fwd, mono.params, img)
        timed(f"dpt fwd+input-grad {prec}", fwdbwd, mono.params, img)

    # --- pseudo chain with the fast net ----------------------------------
    mono = monos["default"]

    def pseudo_chain(eps, params):
        def loss(xyz):
            out = render(cam, g.replace(xyz=xyz), cfg, bg, 3)
            md = mono.apply(params, out.color.transpose(2, 0, 1))
            d = out.depth.reshape(-1)
            m = -md.reshape(-1)
            dc = d - d.mean()
            mc = m - m.mean()
            return 1.0 - jnp.sum(dc * mc) / jnp.maximum(
                jnp.linalg.norm(dc) * jnp.linalg.norm(mc), 1e-8)
        return jnp.sum(jax.grad(loss)(g.xyz + eps))

    timed("pseudo chain render+dpt(default) f/b", pseudo_chain, mono.params)

    # --- V-batch superlinearity section split ----------------------------
    from sdpgs_tpu.ops.rasterize import binning as binning_lib
    from sdpgs_tpu.ops.rasterize.preprocess import preprocess_fused
    from sdpgs_tpu.ops.rasterize.rasterizer import rasterize_tiles

    cams = [Camera.create(R=np.eye(3), T=np.array([0.1 * i, 0, 0]), fovx=0.9,
                          fovy=0.7, width=WIDTH, height=HEIGHT) for i in range(3)]
    camb = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cams)
    scale_p = g.get_scaling()
    quat = g.get_rotation()
    color = g.colors_from_sh(cams[0].cam_pos, 3)
    feature = g.language_feature_normalized()
    opacity = g.get_opacity()[:, 0]

    def prep_bin(cam, eps):
        p = preprocess_fused(g.xyz + eps, scale_p, quat, cam, g.alive,
                             near=cfg.near, low_pass=cfg.low_pass)
        b = binning_lib.bin_gaussians(p, WIDTH, HEIGHT, cfg)
        return jnp.sum(b.tile_index).astype(jnp.float32)

    def gather_comp(cam, eps):
        out, bins, prep, _slab = rasterize_tiles(
            g.xyz + eps, None, opacity, color, feature, g.alive, cam, cfg,
            scale=scale_p, quat=quat)
        return jnp.sum(out.values)

    def gather_comp_bwd(cam, eps):
        def loss(xyz):
            out, bins, prep, _slab = rasterize_tiles(
                xyz, None, opacity, color, feature, g.alive, cam, cfg,
                scale=scale_p, quat=quat)
            return jnp.sum(out.values)
        return jnp.sum(jax.grad(loss)(g.xyz + eps))

    cam0 = cams[0]
    for name, body in (("prep+bin", prep_bin), ("tiles fwd", gather_comp),
                       ("tiles fwd+bwd", gather_comp_bwd)):
        timed(f"{name} V=1", lambda e, b=body: b(cam0, e))
        timed(f"{name} V=3 vmap", lambda e, b=body: jnp.sum(jax.vmap(
            lambda c: b(c, e))(camb)))


if __name__ == "__main__":
    main()
