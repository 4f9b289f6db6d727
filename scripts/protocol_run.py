"""Protocol-scale end-to-end training on real hardware (VERDICT r4 item #4).

The full reference protocol shape — 10k iterations at 504x378 (LLFF /8),
131k-slot capacity, full DPT-Hybrid (random weights) in the pseudo window
2000..5500, SH warmup to 3, the densify window with proximity + opacity
resets, segment-feature losses over a REAL segment structure — driven by the
ACTUAL Trainer on a synthetic scene with ground truth rendered from a hidden
60k-Gaussian set (so PSNR measures true convergence).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/protocol_run.py
Outputs: /tmp/protocol_run/{training_history,eval_results}.json + stdout log.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np

OUT = Path("/tmp/protocol_run")
WIDTH, HEIGHT = 504, 378
CAPACITY = 1 << 17
GT_POINTS = 61_440            # 240 * 256: hits the rank-kernel fast path
INIT_POINTS = 10_000
ITERATIONS = 10_000


def main():
    import jax.numpy as jnp

    from sdpgs_tpu.config import RasterizeConfig, TrainConfig
    from sdpgs_tpu.data.synthetic import SyntheticScene
    from sdpgs_tpu.models.depth_estimator import mono_depth_from_params
    from sdpgs_tpu.models.dpt import DPTArch, random_params
    from sdpgs_tpu.train.loop import Trainer

    t0 = time.time()
    raster = RasterizeConfig(chunk=64)
    print("building protocol-scale synthetic scene...", flush=True)
    scene = SyntheticScene(
        seed=0, n_points=GT_POINTS, capacity=CAPACITY, width=WIDTH,
        height=HEIGHT, n_train=3, n_pseudo=4096, init_scale=1e-4,
        initial_opacity=0.9, raster=raster, n_segments=8, n_test=1,
        point_spread=1.0, depth_center=4.0, init_points=INIT_POINTS,
    )
    OUT.mkdir(parents=True, exist_ok=True)
    scene.model_path = str(OUT)
    print(f"scene built in {time.time()-t0:.1f}s", flush=True)

    cfg = TrainConfig()
    cfg.raster = raster
    cfg.optim.iterations = ITERATIONS
    cfg.optim.test_iterations = (1000, 2000, 3000, 5000, 10000)
    cfg.optim.save_iterations = ()
    cfg.optim.checkpoint_iterations = (5000,)
    # protocol schedule: reference run_llff_mvs.sh flags / config defaults
    cfg.optim.densify_until_iter = 6000
    cfg.optim.start_sample_pseudo = 2000
    cfg.optim.end_sample_pseudo = 5500
    cfg.optim.sample_pseudo_interval = 1

    arch = DPTArch.hybrid()
    mono = mono_depth_from_params(
        random_params(arch, seed=0), arch=arch, dtype=jnp.bfloat16
    )
    trainer = Trainer(cfg, scene=scene, mono_depth_fn=mono)

    t1 = time.time()
    hist = trainer.train(iterations=ITERATIONS, log_every=100)
    wall = time.time() - t1
    res = {
        "iterations": ITERATIONS,
        "wall_s": round(wall, 1),
        "iters_per_s": round(ITERATIONS / wall, 2),
        "final": hist[-1] if hist else None,
        "eval": trainer.eval_history,
    }
    (OUT / "protocol_summary.json").write_text(json.dumps(res, indent=2))
    print(json.dumps(res["final"]))
    print(f"PROTOCOL RUN DONE: {ITERATIONS} iters in {wall:.1f}s "
          f"({ITERATIONS/wall:.2f} it/s incl. events/eval)", flush=True)


if __name__ == "__main__":
    main()
