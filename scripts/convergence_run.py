"""Long-horizon synthetic convergence run (VERDICT r2 next #3).

Runs the REAL train CLI for 1500 iterations on the miniature GT-cloud scene
from the acceptance rig — through the densification window, the pseudo
window (random-weight tiny DPT in the loss), and the scheduled opacity
reset — and checks the PSNR trajectory:

  - train PSNR >= 25 dB at the end (the scene is a consistent render of a
    real splat cloud, so a correct optimizer must fit it well);
  - test PSNR (held-out views) improves substantially over init and ends
    within 6 dB of train (no catastrophic overfit/divergence).

This is the best available proxy for the blocked real-data acceptance
(/root/reference/run_llff_mvs.sh:11-33). Run on CPU:

  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python scripts/convergence_run.py [workdir]

(force-switches to the CPU backend internally; safe to run alongside TPU
jobs). Results land in <workdir>/out/eval_results.json and are summarized
on stdout; docs/CONVERGENCE.md records the last accepted trajectory.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, str(Path(__file__).parents[1]))
sys.path.insert(0, str(Path(__file__).parents[1] / "tests"))

ITERATIONS = 1500


def main(workdir: str = "/tmp/sdpgs_convergence") -> int:
    from test_acceptance import make_full_scene

    root = Path(workdir) / "scene"
    out = Path(workdir) / "out"
    if not (root / "poses_bounds.npy").exists():
        root.mkdir(parents=True, exist_ok=True)
        make_full_scene(root, np.random.default_rng(7))

    from sdpgs_tpu.models.dpt import DPTArch, random_params, save_params

    dpt_path = Path(workdir) / "dpt_tiny_hybrid.npz"
    if not dpt_path.exists():
        save_params(dpt_path, random_params(DPTArch.tiny_hybrid(), seed=3),
                    DPTArch.tiny_hybrid())

    from sdpgs_tpu.pipelines.depth_align import conclude_depth_for_scene

    if not (root / "depth_adjust_maps_stereo").exists():
        conclude_depth_for_scene(
            root, mono_depth_dir="depth_maps_anything", seg_dir="features_dim3",
            out_dir="depth_adjust_maps_stereo",
        )

    from sdpgs_tpu.cli.train_cli import main as train_main

    test_iters = [str(i) for i in (1, 100, 300, 600, 900, 1200, 1500)]
    train_main([
        "-s", str(root), "-m", str(out), "-r", "2", "-l", "features_dim3",
        "--capacity", "1024", "--iterations", str(ITERATIONS), "--seed", "0",
        "--test_iterations", *test_iters,
        "--save_iterations", str(ITERATIONS),
        "--checkpoint_iterations", str(ITERATIONS),
        "--dpt_weights", str(dpt_path),
        "--densify_from_iter", "100", "--densification_interval", "100",
        "--densify_until_iter", "900", "--proximity_until_iter", "300",
        "--prune_from_iter", "100",
        "--start_sample_pseudo", "300", "--end_sample_pseudo", "1200",
        "--sample_pseudo_interval", "1", "--opacity_reset_interval", "3000",
        "--position_lr_max_steps", str(ITERATIONS),
    ])

    evals = json.loads((out / "eval_results.json").read_text())
    print(f"{'iter':>6} {'train_psnr':>10} {'test_psnr':>10}")
    for e in evals:
        print(f"{e['iteration']:>6} {e['train']['psnr']:>10.2f} "
              f"{e['test']['psnr']:>10.2f}")

    first, last = evals[0], evals[-1]
    ok = True
    if last["train"]["psnr"] < 25.0:
        print(f"FAIL: final train PSNR {last['train']['psnr']:.2f} < 25")
        ok = False
    if last["test"]["psnr"] < first["test"]["psnr"] + 5.0:
        print("FAIL: test PSNR gained "
              f"{last['test']['psnr'] - first['test']['psnr']:.2f} dB (< 5)")
        ok = False
    if last["train"]["psnr"] - last["test"]["psnr"] > 6.0:
        print("FAIL: train-test gap "
              f"{last['train']['psnr'] - last['test']['psnr']:.2f} dB (> 6)")
        ok = False
    print("CONVERGENCE", "OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
