"""SDP loss-stack A/B at protocol scale (VERDICT r4 -> r5 item #1).

The framework's defining feature — the SDP pseudo-view regularization stack
(reference train.py:138-188) — has never been shown to improve held-out
quality on any rig: the r4 protocol run's final test PSNR (14.47) was WORSE
than its iteration-2000 value (15.96), with no ablation to say why. This
script runs the missing controlled experiment: same scene, same seed, same
schedule, one knob per arm.

Arms (pick one per invocation; artifacts land in /tmp/ablation/<arm>/):
  full      r4 protocol run: random-weight DPT-Hybrid mono-Pearson + segment
            Pearson + reprojection consistency in the pseudo window.
  nopseudo  depth_pseudo_weight=0.0 — the pseudo branch contributes zero
            gradient while the SCHEDULE (opacity resets keyed to
            start_sample_pseudo, densify cadence) stays identical, so the
            comparison isolates the pseudo losses, not the calendar.
  nomono    mono_depth_fn=None — the pseudo branch keeps ONLY the multi-view
            reprojection term; isolates the DPT-dependent terms.
  oracle    the mono term is fed GT depth rendered from the hidden GT
            Gaussian set at each pseudo camera (a perfect depth prior).
            Separates "the mono-Pearson plumbing transmits signal" from
            "random DPT weights inject noise" — the one diagnosis the r4
            evidence could not make (pretrained MiDaS weights are
            egress-blocked, docs/ACCEPTANCE.md).

Run (one arm at a time; the TPU relay serves one client):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/ablation_run.py <arm>
Compare: python scripts/ablation_run.py report
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

import os

OUT = Path(os.environ.get("SDPGS_ABLATION_OUT", "/tmp/ablation"))
SMOKE = os.environ.get("SDPGS_ABLATION_SMOKE", "") not in ("", "0")
WIDTH, HEIGHT = (64, 48) if SMOKE else (504, 378)
CAPACITY = (1 << 10) if SMOKE else (1 << 17)
GT_POINTS = 256 if SMOKE else 61_440
INIT_POINTS = 128 if SMOKE else 10_000
ITERATIONS = 40 if SMOKE else 10_000
ARMS = ("full", "nopseudo", "nomono", "oracle")


def build_scene():
    from sdpgs_tpu.config import RasterizeConfig
    from sdpgs_tpu.data.synthetic import SyntheticScene

    raster = RasterizeConfig(chunk=64) if not SMOKE else RasterizeConfig(
        tile=16, max_per_tile=128, max_tiles_per_gaussian=8, chunk=32,
        use_pallas=False,
    )
    # n_test=4: the r4 run's single test view made the held-out signal too
    # noisy to compare arms; test cameras consume no RNG, so the GT scene and
    # init cloud are bit-identical to the r4 protocol run's.
    return SyntheticScene(
        seed=0, n_points=GT_POINTS, capacity=CAPACITY, width=WIDTH,
        height=HEIGHT, n_train=3, n_pseudo=64 if SMOKE else 4096,
        init_scale=1e-2 if SMOKE else 1e-4,
        initial_opacity=0.9, raster=raster, n_segments=8, n_test=4,
        point_spread=1.0, depth_center=4.0, init_points=INIT_POINTS,
    ), raster


def build_cfg(raster):
    from sdpgs_tpu.config import TrainConfig

    cfg = TrainConfig()
    cfg.raster = raster
    cfg.optim.iterations = ITERATIONS
    cfg.optim.save_iterations = ()
    cfg.optim.checkpoint_iterations = ()
    if SMOKE:
        cfg.optim.test_iterations = (20, 40)
        cfg.optim.densify_until_iter = 25
        cfg.optim.start_sample_pseudo = 5
        cfg.optim.end_sample_pseudo = 35
        cfg.optim.sample_pseudo_interval = 1
        return cfg
    # dense trajectory: the question is WHERE the pseudo window helps/hurts
    cfg.optim.test_iterations = tuple(range(1000, ITERATIONS + 1, 1000))
    cfg.optim.densify_until_iter = 6000
    cfg.optim.start_sample_pseudo = 2000
    cfg.optim.end_sample_pseudo = 5500
    cfg.optim.sample_pseudo_interval = 1
    return cfg


def make_trainer(arm: str, cfg, scene):
    import jax
    import jax.numpy as jnp

    from sdpgs_tpu.train.loop import Trainer

    if arm == "nopseudo":
        cfg.optim.depth_pseudo_weight = 0.0

    if arm in ("full", "nopseudo"):
        from sdpgs_tpu.models.depth_estimator import mono_depth_from_params
        from sdpgs_tpu.models.dpt import DPTArch, random_params

        arch = DPTArch.tiny_hybrid() if SMOKE else DPTArch.hybrid()
        mono = mono_depth_from_params(
            random_params(arch, seed=0), arch=arch, dtype=jnp.bfloat16
        )
        return Trainer(cfg, scene=scene, mono_depth_fn=mono)

    if arm == "nomono":
        return Trainer(cfg, scene=scene, mono_depth_fn=None)

    # oracle: mono_params IS the depth map for the current pseudo camera,
    # refreshed by the trainer right where the reprojection z-buffer is
    # (both are per-camera, parameter-independent precomputes). Sign
    # convention: both consumers negate mono (step.py pearson(depth, -mono),
    # segment_pearson_loss negate_mono=True), so mono = -gt_depth makes a
    # perfect reconstruction score rho = 1.
    from sdpgs_tpu.models.depth_estimator import MonoDepth
    from sdpgs_tpu.render import render

    gt = scene.gt_gaussians
    graster = scene.gt_raster

    @jax.jit
    def gt_depth(cam):
        return render(cam, gt, graster, jnp.zeros(3), 0).depth

    placeholder = jnp.zeros(
        (scene.pseudo_height, scene.pseudo_width), jnp.float32
    )
    mono = MonoDepth(apply=lambda params, img: params, params=placeholder)

    class OracleTrainer(Trainer):
        def _next_pseudo_reproj(self):
            cam, fused, weight = super()._next_pseudo_reproj()
            self.mono_params = -gt_depth(cam)
            return cam, fused, weight

    return OracleTrainer(cfg, scene=scene, mono_depth_fn=mono)


def run_arm(arm: str):
    t0 = time.time()
    scene, raster = build_scene()
    out = OUT / arm
    out.mkdir(parents=True, exist_ok=True)
    scene.model_path = str(out)
    print(f"[{arm}] scene built in {time.time()-t0:.1f}s", flush=True)

    cfg = build_cfg(raster)
    trainer = make_trainer(arm, cfg, scene)

    t1 = time.time()
    hist = trainer.train(iterations=ITERATIONS, log_every=100)
    wall = time.time() - t1
    res = {
        "arm": arm,
        "iterations": ITERATIONS,
        "wall_s": round(wall, 1),
        "iters_per_s": round(ITERATIONS / wall, 2),
        "final": hist[-1] if hist else None,
        "eval": trainer.eval_history,
    }
    (out / "summary.json").write_text(json.dumps(res, indent=2))
    print(f"[{arm}] DONE: {ITERATIONS} iters in {wall:.1f}s "
          f"({ITERATIONS/wall:.2f} it/s wall)", flush=True)


def report():
    rows = {}
    for arm in ARMS:
        p = OUT / arm / "summary.json"
        if not p.exists():
            continue
        rows[arm] = json.loads(p.read_text())
    if not rows:
        print("no arm summaries found under", OUT)
        return
    iters = sorted({e["iteration"] for r in rows.values() for e in r["eval"]})
    print("test PSNR trajectories (n_test=4):")
    print("iter  " + "".join(f"{a:>10}" for a in rows))
    for it in iters:
        line = f"{it:>5} "
        for r in rows.values():
            e = next((x for x in r["eval"] if x["iteration"] == it), None)
            line += f"{e['test']['psnr']:>10.2f}" if e and "test" in e else " " * 10
        print(line)
    print("\nfinal train PSNR / wall:")
    for a, r in rows.items():
        tr = next((x for x in reversed(r["eval"]) if "train" in x), None)
        tpsnr = f"{tr['train']['psnr']:.2f}" if tr else "-"
        print(f"  {a:>9}: train {tpsnr}  wall {r['wall_s']}s "
              f"({r['iters_per_s']} it/s)")


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else ""
    if cmd == "report":
        report()
    elif cmd in ARMS:
        run_arm(cmd)
    else:
        print(f"usage: ablation_run.py {{{'|'.join(ARMS)}|report}}")
        sys.exit(2)
