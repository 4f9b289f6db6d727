"""Training CLI: the reference's ``python train.py -s <scene> -m <out>``
surface (train.py:309-342) over dataclass configs (saved as cfg.json
instead of the eval()-parsed cfg_args)."""

from __future__ import annotations

import argparse
import dataclasses
import os
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    from sdpgs_tpu.config import ModelConfig, OptimizationConfig, PipelineConfig

    p = argparse.ArgumentParser(description="SDP-GS-TPU training")
    p.add_argument("--source_path", "-s", required=True)
    p.add_argument("--model_path", "-m", default="")
    p.add_argument("--images", "-i", default="images")
    p.add_argument("--language_features_name", "-l",
                   default=ModelConfig.language_features_name)
    p.add_argument("--resolution", "-r", type=int, default=8)
    p.add_argument("--white_background", "-w", action="store_true")
    p.add_argument("--nviews", type=int, default=3)
    p.add_argument("--sh_degree", type=int, default=3)
    p.add_argument("--capacity", type=int, default=ModelConfig.capacity)
    p.add_argument("--iterations", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--test_iterations", nargs="+", type=int,
                   default=[1000, 2000, 3000, 5000, 10000])
    p.add_argument("--save_iterations", nargs="+", type=int, default=[5000, 10000])
    p.add_argument("--checkpoint_iterations", nargs="+", type=int,
                   default=[5000, 10000])
    p.add_argument("--start_checkpoint", type=str, default=None)
    p.add_argument("--dpt_weights", type=str, default="",
                   help=".npz depth net (tools/convert_dpt.py or "
                        "dpt.save_params) for the pseudo window's MiDaS role")
    p.add_argument("--lpips_weights", type=str, default="",
                   help=".npz LPIPS-VGG weights for eval reports")
    p.add_argument("--quiet", action="store_true")
    p.add_argument("--views_per_batch", type=int, default=1,
                   help="views per training step (TPU data-parallel batch; "
                        "must be a multiple of the mesh's data axis)")
    p.add_argument("--mesh", type=str, default="",
                   help="device mesh for multi-chip training, e.g. "
                        "'data=4,gauss=2' or 'data=2,gauss=2,tile=2' "
                        "(axes default to 1; product must divide the "
                        "available device count)")
    from sdpgs_tpu.parallel.distributed import add_distributed_args

    add_distributed_args(p)
    # optimization overrides (reference per-scene flags, run_llff_mvs.sh)
    for f in dataclasses.fields(OptimizationConfig):
        # flags already declared explicitly above
        if f.name in ("iterations", "test_iterations", "save_iterations",
                      "checkpoint_iterations"):
            continue
        if isinstance(f.default, bool):
            p.add_argument(f"--{f.name}", type=lambda s: s.lower() == "true",
                           default=None)
        elif isinstance(f.default, (int, float)):
            p.add_argument(f"--{f.name}", type=type(f.default), default=None)
    return p


def config_from_args(args):
    from sdpgs_tpu.config import OptimizationConfig, TrainConfig

    cfg = TrainConfig()
    cfg.seed = args.seed
    m = cfg.model
    m.source_path = os.path.abspath(args.source_path)
    m.model_path = args.model_path
    m.images = args.images
    m.language_features_name = args.language_features_name
    m.resolution = args.resolution
    m.white_background = args.white_background
    m.nviews = args.nviews
    m.sh_degree = args.sh_degree
    m.capacity = args.capacity
    m.dpt_weights = args.dpt_weights
    m.lpips_weights = args.lpips_weights

    cfg.views_per_batch = args.views_per_batch
    if args.mesh:
        axes = {"data": 1, "gauss": 1, "tile": 1}
        for part in args.mesh.split(","):
            name, _, val = part.partition("=")
            name = name.strip()
            if name not in axes:
                raise SystemExit(
                    f"--mesh: unknown axis {name!r} (data/gauss/tile)")
            axes[name] = int(val)
        cfg.mesh_data = axes["data"]
        cfg.mesh_gauss = axes["gauss"]
        cfg.mesh_tile = axes["tile"]

    for f in dataclasses.fields(OptimizationConfig):
        v = getattr(args, f.name, None)
        if v is not None:
            setattr(cfg.optim, f.name, v)
    if args.iterations is not None:
        cfg.optim.iterations = args.iterations
    cfg.optim.test_iterations = tuple(args.test_iterations)
    cfg.optim.save_iterations = tuple(args.save_iterations) + (cfg.optim.iterations,)
    cfg.optim.checkpoint_iterations = tuple(args.checkpoint_iterations)
    return cfg


def main(argv=None):
    args = build_parser().parse_args(argv)
    cfg = config_from_args(args)

    # Multi-host rendezvous BEFORE the backend is touched: afterwards
    # jax.devices() is the global list and --mesh sizes span all hosts.
    from sdpgs_tpu.parallel.distributed import maybe_initialize_distributed

    if maybe_initialize_distributed(args):
        import jax

        print(
            f"multi-host: process {jax.process_index()}/{jax.process_count()}"
            f", {len(jax.devices())} global devices"
        )

    from sdpgs_tpu.config import save_config
    from sdpgs_tpu.train.loop import Trainer

    if cfg.model.model_path:
        Path(cfg.model.model_path).mkdir(parents=True, exist_ok=True)
        save_config(cfg, Path(cfg.model.model_path) / "cfg.json")

    trainer = Trainer(cfg)
    if args.start_checkpoint:
        ckpt_dir, step = args.start_checkpoint.rsplit(":", 1)
        trainer.restore(ckpt_dir, int(step))
        print(f"resumed from {ckpt_dir} at step {step}")

    # default on_eval = Trainer._training_report: prints L1/PSNR/SSIM(/LPIPS)
    # for train+test views and persists eval_results.json to the model dir
    trainer.train()
    print("\nTraining complete.")


if __name__ == "__main__":
    main()
