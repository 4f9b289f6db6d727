"""Bench-shape sharded-training certification (VERDICT r4 weak #5).

The mesh path had only ever executed at toy shapes (alive ~64-79,
parallel/certify.py); bench shapes (131k capacity, 504x378, K=1024) had
only ever run mesh-less — and the r4 ladder VMEM OOM was exactly a
shape-triggered bug the toy could not catch. This script runs the REAL
bench configuration through ``make_train_step(tile_mesh=...)`` on the
8-virtual-device CPU (2,2,2) mesh with the production Pallas kernels in
interpret mode:

  * N train steps sharded (DP=2 x ZeRO=2 x tile=2) vs the same steps
    single-device, comparing loss/psnr trajectories (loose: the tile psum
    and data-mean reorder accumulations) and telemetry (exact);
  * ZeRO 'gauss' shardings asserted on moments/stats after every step;
  * one densify/prune event at bench capacity through the out_shardings-
    pinned jit, shardings asserted after the slot surgery, alive counts
    compared vs the single-device event.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       PYTHONPATH=/root/repo:/root/.axon_site python scripts/certify_bench_shape.py
(flips to the CPU backend internally; safe alongside TPU jobs).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main(steps: int = 3):
    import jax

    jax.config.update("jax_platforms", "cpu")
    assert len(jax.devices()) >= 8, (
        "need XLA_FLAGS=--xla_force_host_platform_device_count=8"
    )
    import dataclasses

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec

    import bench
    from sdpgs_tpu.config import RasterizeConfig, TrainConfig
    from sdpgs_tpu.opt.densify import DensifyInfo, densify_and_prune
    from sdpgs_tpu.ops.knn import knn
    from sdpgs_tpu.parallel import (
        make_mesh,
        shard_batch,
        shard_train_state,
        state_shardings,
    )
    from sdpgs_tpu.parallel.certify import _assert_gauss_sharded
    from sdpgs_tpu.train.state import TrainState
    from sdpgs_tpu.train.step import StepMetrics, ViewBatch, make_train_step

    t0 = time.time()
    cfg = TrainConfig()
    # the bench.py protocol config + interpret-mode Pallas (the production
    # kernel path, executed per-grid-step on CPU)
    cfg.raster = RasterizeConfig(chunk=64, interpret_kernels=True)
    cfg.views_per_batch = 2

    rng = np.random.default_rng(3)
    bench.VIEWS = 2
    g, cams, batch = bench._make_inputs(rng)
    protos = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    bg = jnp.zeros(3)
    slr = jnp.float32(1.0)
    print(f"inputs built ({time.time()-t0:.1f}s): capacity={g.capacity} "
          f"alive={int(np.asarray(jax.device_get(g.num_alive())))} "
          f"image={bench.HEIGHT}x{bench.WIDTH} K={cfg.raster.max_per_tile}",
          flush=True)

    def one_leg(mesh):
        # fresh buffer copies: the donated train step consumes the state's
        # arrays, and legs must not share (or re-use deleted) buffers
        g_leg = jax.tree_util.tree_map(jnp.array, g)
        state = TrainState.create(g_leg, seed=0)
        out_sh = None
        tile_mesh = None
        if mesh is not None:
            state = shard_train_state(state, mesh)
            ss = state_shardings(mesh, state)
            repl = NamedSharding(mesh, PartitionSpec())
            out_sh = (ss, StepMetrics(*([repl] * len(StepMetrics._fields))))
            tile_mesh = mesh
            b = shard_batch(batch, mesh)
        else:
            b = batch
        step = make_train_step(
            cfg, sh_degree=3, with_pseudo=False, tile_mesh=tile_mesh,
            out_shardings=out_sh, unroll_views=False,
        )
        hist = []
        for i in range(steps):
            t = time.time()
            state, m = step(state, b, protos, bg, slr)
            m = jax.device_get(m)
            if mesh is not None:
                _assert_gauss_sharded(state, f"sharded step {i}")
            hist.append({
                "loss": float(m.loss), "psnr": float(m.psnr),
                "overflow": int(m.overflow), "clipped": int(m.clipped),
                "slab": int(m.slab), "alive": int(m.num_alive),
            })
            print(f"  step {i} ({'mesh' if mesh else 'single'}): "
                  f"{json.dumps(hist[-1])} [{time.time()-t:.1f}s]", flush=True)

        # densify/prune event at bench capacity (the r4-style pinned jit)
        extent = 1.0
        opt = cfg.optim

        def densify_fn(gs, opt_state, stats, key, d2, idx):
            finite = jnp.isfinite(d2)
            knn_dist = jnp.sum(jnp.where(finite, d2, 0), -1) / jnp.maximum(
                finite.sum(-1), 1
            )
            return densify_and_prune(
                gs, opt_state, stats, key,
                grad_threshold=opt.densify_grad_threshold,
                min_opacity=opt.prune_threshold,
                extent=extent,
                percent_dense=opt.percent_dense,
                run_proximity=True,
                knn_dist=knn_dist,
                knn_idx=idx,
            )

        if mesh is not None:
            ss = state_shardings(mesh, state)
            repl = NamedSharding(mesh, PartitionSpec())
            info_sh = DensifyInfo(repl, repl, repl, repl)
            fn = jax.jit(densify_fn, out_shardings=(
                ss.gaussians, ss.opt_state, ss.stats, info_sh))
        else:
            fn = jax.jit(densify_fn)
        t = time.time()
        d2, idx = knn(state.gaussians.xyz, k=3, mask=state.gaussians.alive)
        key, sub = jax.random.split(state.rng)
        g2, opt_state, stats, info = fn(
            state.gaussians, state.opt_state, state.stats, sub, d2, idx
        )
        state = state.replace(
            gaussians=g2, opt_state=opt_state, stats=stats, rng=key
        )
        if mesh is not None:
            _assert_gauss_sharded(state, "post-densify")
        alive = int(np.asarray(jax.device_get(state.gaussians.num_alive())))
        print(f"  densify ({'mesh' if mesh else 'single'}): alive={alive} "
              f"[{time.time()-t:.1f}s]", flush=True)
        return hist, alive

    mesh = make_mesh(data=2, gauss=2, tile=2, devices=jax.devices()[:8])
    print("— sharded leg (2,2,2) —", flush=True)
    hist_m, alive_m = one_leg(mesh)
    print("— single-device leg —", flush=True)
    hist_s, alive_s = one_leg(None)

    # telemetry must agree exactly; trajectories loosely (psum reordering)
    for a, b_ in zip(hist_m, hist_s):
        assert (a["overflow"], a["clipped"], a["slab"]) == (
            b_["overflow"], b_["clipped"], b_["slab"]), (a, b_)
        assert a["alive"] == b_["alive"], (a, b_)
    np.testing.assert_allclose(
        [h["loss"] for h in hist_m], [h["loss"] for h in hist_s], rtol=1e-3,
        err_msg="bench-shape sharded trajectory diverged from single-device")
    np.testing.assert_allclose(
        [h["psnr"] for h in hist_m], [h["psnr"] for h in hist_s], rtol=1e-3)
    # densify decisions at bench scale: float-threshold flips under psum
    # reordering can move a few marginal slots (certify.py bound derivation)
    tol = max(3, min(16, int(0.05 * max(alive_m, alive_s))))
    assert abs(alive_m - alive_s) <= tol, (alive_m, alive_s)

    summary = {
        "ok": True,
        "mesh": [2, 2, 2],
        "steps": steps,
        "capacity": int(bench.CAPACITY),
        "alive0": int(bench.ALIVE),
        "image": [bench.HEIGHT, bench.WIDTH],
        "K": cfg.raster.max_per_tile,
        "loss_sharded": [h["loss"] for h in hist_m],
        "loss_single": [h["loss"] for h in hist_s],
        "alive_after_densify": [alive_m, alive_s],
        "wall_s": round(time.time() - t0, 1),
    }
    print("CERTIFY_BENCH_SHAPE " + json.dumps(summary), flush=True)
    return summary


if __name__ == "__main__":
    main()
