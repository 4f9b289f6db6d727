"""Benchmark: full train-step throughput on an LLFF-3-view-shaped synthetic
workload (504x378 @ downsample 8, the reference's benchmark protocol,
run_llff_mvs.sh). Prints ONE JSON line.

Two flavors, matching the reference's 10k-iteration protocol
(run_llff_mvs.sh:11-16):
- ``plain``: the combined-loss train step (photometric + feature + mono-depth
  Pearson + Adam), iterations outside the pseudo window — 6,500 of 10,000.
- ``pseudo``: the same step with the pseudo-view branch in the loss
  (reference train.py:138-188): an extra render from a pseudo camera, a
  full DPT-Hybrid forward on the rendered image, Pearson depth losses
  differentiated THROUGH the depth net, segment-wise Pearson, and multi-view
  reprojection — iterations 2000..5500 (sample_pseudo_interval=1), 3,500 of
  10,000. The DPT runs with architecture-faithful random weights
  (models/dpt.random_params — value-independent compute cost).

The headline ``value`` is the protocol-weighted mean
(10,000 / (6500/plain + 3500/pseudo)); both flavors ride along as extra
keys.

``vs_baseline`` is ESTIMATED: the reference repo ships no measured numbers
(BASELINE.md — its timing events are dead code); the constant below is the
commonly observed ~15 train iters/s of the single-GPU FSGS/SDP-GS lineage at
this protocol (10k iterations in ~11 min). Replace with a measured figure
when reference hardware is available.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

REFERENCE_ITERS_PER_S = 15.0

WIDTH, HEIGHT = 504, 378          # LLFF at resolution /8 (run_llff_mvs.sh)
CAPACITY = 1 << 17                # 131k Gaussian slots
ALIVE = 60_000                    # typical mid-training population
VIEWS = int(os.environ.get("BENCH_VIEWS", "1"))  # reference protocol: 1 view/iter
PLAIN_ITERS = 6_500               # protocol mix (10k total, pseudo window
PSEUDO_ITERS = 3_500              # 2000..5500 @ interval 1)
DPT_ARCH = None                   # None = full DPT-Hybrid; tests inject tiny


def _make_inputs(rng):
    import jax
    import jax.numpy as jnp

    from sdpgs_tpu.core.camera import Camera
    from sdpgs_tpu.core.gaussians import create_from_points
    from sdpgs_tpu.train.step import ViewBatch

    pts = rng.normal(size=(ALIVE, 3)).astype(np.float32) * np.array(
        [1.2, 0.9, 0.6], np.float32
    ) + np.array([0, 0, 4.0], np.float32)
    cols = rng.uniform(size=(ALIVE, 3)).astype(np.float32)
    g = create_from_points(pts, cols, CAPACITY, init_scale=np.full(ALIVE, 1e-4))

    cams = [
        Camera.create(
            R=np.eye(3), T=np.array([0.1 * i, 0.0, 0.0]), fovx=0.9, fovy=0.7,
            width=WIDTH, height=HEIGHT,
        )
        for i in range(VIEWS)
    ]
    batch = ViewBatch(
        camera=jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cams),
        image=jnp.asarray(rng.uniform(size=(VIEWS, 3, HEIGHT, WIDTH)).astype(np.float32)),
        depth_mono=jnp.asarray(
            rng.uniform(1, 8, size=(VIEWS, HEIGHT, WIDTH)).astype(np.float32)
        ),
        feature=jnp.asarray(rng.uniform(size=(VIEWS, 3, HEIGHT, WIDTH)).astype(np.float32)),
        seg_map=jnp.zeros((VIEWS, HEIGHT, WIDTH), np.int32),
    )
    return g, cams, batch


def _make_pseudo(rng, cams):
    """PseudoInputs with a DPT-Hybrid-shaped random-weight depth net (the
    reference's exact MiDaS role at 384x512, utils/depth_utils.py:18-45)."""
    import jax
    import jax.numpy as jnp

    from sdpgs_tpu.core.camera import Camera
    from sdpgs_tpu.models.depth_estimator import mono_depth_from_params
    from sdpgs_tpu.models.dpt import DPTArch, random_params
    from sdpgs_tpu.train.step import PseudoInputs

    arch = DPT_ARCH if DPT_ARCH is not None else DPTArch.hybrid()
    # bf16 params match the TrainConfig.model.dpt_bf16 default (17.8 vs
    # 21.4 ms fwd+input-grad measured, scripts/perf_dpt.py)
    mono = mono_depth_from_params(
        random_params(arch, seed=0), arch=arch, dtype=jnp.bfloat16
    )
    pcam = Camera.create(
        R=np.eye(3), T=np.array([0.05, 0.02, 0.0]), fovx=0.9, fovy=0.7,
        width=WIDTH, height=HEIGHT,
    )
    train_depths = jnp.asarray(
        rng.uniform(1, 8, size=(len(cams), HEIGHT, WIDTH)).astype(np.float32)
    )
    # The reprojection z-buffer is parameter-independent; the Trainer
    # prefetches it for batches of upcoming pseudo cameras in one vmapped
    # call (train/loop.py:_next_pseudo_reproj — each of the ~10k poses is
    # sampled at most once, so there is no reuse to cache). The bench
    # measures that batched precompute and charges the per-camera share to
    # every pseudo step (returned as ``reproj_per_cam_s``).
    from sdpgs_tpu.losses import reproject_fused_depth_batch

    K = cams[0].intrinsics_matrix()
    R_train = jnp.stack([c.view[:3, :3] for c in cams])
    t_train = jnp.stack([c.view[:3, 3] for c in cams])

    B = 64  # Trainer.REPROJ_PREFETCH
    angles = np.linspace(0, 2 * np.pi, B, endpoint=False)
    R_ps = jnp.stack([jnp.asarray(np.eye(3), jnp.float32)] * B)
    t_ps = jnp.asarray(
        np.stack([[0.05 * np.cos(a), 0.05 * np.sin(a), 0.0] for a in angles]),
        jnp.float32,
    )
    # r5: the Pallas displacement-window z-buffer replaces B*V XLA
    # scatter-mins (ops/warp_pallas.py; the trainer prefetch uses the same
    # entry point, with outlier-triggered fallback to the scatter)
    batched = jax.jit(reproject_fused_depth_batch)
    fused_b, weight_b, _ = batched(train_depths, K, R_train, t_train, R_ps, t_ps)
    jax.block_until_ready(fused_b)
    t0 = time.perf_counter()
    fused_b, weight_b, _ = batched(train_depths, K, R_train, t_train, R_ps, t_ps)
    jax.block_until_ready(fused_b)
    reproj_per_cam_s = (time.perf_counter() - t0) / B
    fused, weight = fused_b[0], weight_b[0]
    pseudo = PseudoInputs(
        camera=pcam,
        train_depths=train_depths,
        K=K,
        R_train=R_train,
        t_train=t_train,
        R_pseudo=pcam.view[:3, :3],
        t_pseudo=pcam.view[:3, 3],
        mono_params=mono.params,
        reproj_fused=fused,
        reproj_weight=weight,
    )
    return pseudo, mono, reproj_per_cam_s


def _time_steps(step, state, args, iters):
    import jax

    state, metrics = step(state, *args)               # warmup/compile
    jax.block_until_ready(metrics)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, *args)
    jax.block_until_ready(metrics)
    return iters / (time.perf_counter() - t0), state


def main(plain_timed_iters: int = 30, pseudo_timed_iters: int = 15):
    import jax.numpy as jnp

    from sdpgs_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from sdpgs_tpu.config import RasterizeConfig, TrainConfig
    from sdpgs_tpu.train.state import TrainState
    from sdpgs_tpu.train.step import make_train_step

    rng = np.random.default_rng(0)
    g, cams, batch = _make_inputs(rng)

    cfg = TrainConfig()
    cfg.raster = RasterizeConfig(chunk=64)

    protos = jnp.ones((8, 3))
    bg = jnp.zeros(3)
    lr_scale = jnp.float32(1.0)

    # --- plain flavor ----------------------------------------------------
    state = TrainState.create(g)
    step = make_train_step(cfg, sh_degree=3, unroll_views=True)
    plain_ips, _ = _time_steps(
        step, state, (batch, protos, bg, lr_scale), iters=plain_timed_iters
    )

    # --- pseudo-window flavor (DPT in the loop) --------------------------
    pseudo, mono, reproj_per_cam_s = _make_pseudo(rng, cams)
    g2, _, batch2 = _make_inputs(np.random.default_rng(0))
    state2 = TrainState.create(g2)
    pstep = make_train_step(
        cfg, sh_degree=3, with_pseudo=True, mono_depth_fn=mono.apply,
        unroll_views=True,
    )
    pseudo_ips, _ = _time_steps(
        pstep, state2, (batch2, protos, bg, lr_scale, pseudo),
        iters=pseudo_timed_iters,
    )
    # each real pseudo step consumes one fresh camera's precomputed warp
    # (no pose reuse across the window) — charge the amortized share
    pseudo_ips = 1.0 / (1.0 / pseudo_ips + reproj_per_cam_s)

    weighted = (PLAIN_ITERS + PSEUDO_ITERS) / (
        PLAIN_ITERS / plain_ips + PSEUDO_ITERS / pseudo_ips
    )
    print(
        json.dumps(
            {
                "metric": "train_iters_per_s_protocol",
                "value": round(weighted, 3),
                "unit": "it/s",
                "vs_baseline": round(weighted / REFERENCE_ITERS_PER_S, 3),
                "baseline_note": "estimated (~15 it/s single-GPU lineage; no measured in-repo figure)",
                "plain_iters_per_s": round(plain_ips, 3),
                "pseudo_iters_per_s": round(pseudo_ips, 3),
                "views_per_batch": VIEWS,
            }
        )
    )


if __name__ == "__main__":
    main()
