"""Typed configuration (dataclasses + JSON), replacing the reference's
reflection-based argparse groups (reference/arguments/__init__.py:19-146) and
its ``eval()``-based saved-config merge (an injection-prone pattern the
rebuild drops in favor of JSON round-trips).

Default values mirror the reference's OptimizationParams / ModelParams /
PipelineParams (reference/arguments/__init__.py:47-124).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Tuple


@dataclass(frozen=True)
class RasterizeConfig:
    """Static geometry of the TPU tile rasterizer.

    The reference sizes everything dynamically per step
    (rasterize_points.cu:27-33 resize callbacks); TPU needs static shapes, so
    capacity knobs live here. Overflows are counted and reported, never
    silent.
    """

    tile: int = 32                  # tile edge in pixels (the reference uses 16,
                                    # config.h:15-16; 32 quarters the binning
                                    # work and maps npix=1024 onto (8,128)
                                    # native tiles — measured 30.0 vs 24.4 it/s)
    max_per_tile: int = 1024        # K: max composited Gaussians per tile
    rank_block_grouped: bool = True  # split S into per-rect-slot regions
                                    # (d0/d1/rest) — fastest; flat layout
                                    # tolerates more growth before dropping
    rank_block_tail: int = 0        # grouped layout only: pooled-tail
                                    # (d>=2) slots per 256-Gaussian
                                    # sub-block; 0 = S//4. Since d0/d1 at
                                    # S//2 >= 256 can never drop (S >= 512),
                                    # EVERY grouped drop is a tail drop — the ladder
                                    # grows this before abandoning the
                                    # grouped readout (4.5x smaller emit
                                    # scan than flat at equal capacity).
    rank_block_slots: int = 512     # S: compacted (tile, rank) entries per
                                    # 256-Gaussian block in the rank kernel
                                    # (~+10% step throughput at light load);
                                    # drops are counted in overflow telemetry
                                    # and the Trainer escalates to 0
                                    # (= compaction off, full P*D scatter)
                                    # when they appear.
    max_tiles_per_gaussian: int = 8   # D: per-Gaussian tile-rect capacity
    grad_gather_min_rows: int = 1 << 62
                                    # payload-gradient backward mode: when
                                    # the table has >= this many (tile, K)
                                    # rows, replace the scatter-add
                                    # transpose with D exact row-gathers
                                    # per Gaussian (each entry's
                                    # (tile*K + rank) slot is unique;
                                    # dropped entries point at sentinel
                                    # slots whose grads are structurally
                                    # zero). Exactness-verified escape
                                    # hatch, DISABLED by default: measured
                                    # slower on v5e even at 1.57M rows
                                    # (235.8 vs 221.2 ms/step; the random-
                                    # access cost moves to the D gathers +
                                    # the unsort instead of vanishing).
    grad_window_min_rows: int = 1 << 20
                                    # windowed two-phase payload backward
                                    # (ops/rasterize/grad_window.py): when
                                    # the table has >= this many rows,
                                    # replace the scatter-add transpose with
                                    # a window-major compact gather + one
                                    # small-destination scatter per window.
                                    # XLA's scatter per-row cost is ~10x
                                    # worse at 1M-row destinations than at
                                    # 131k (measured, perf_r4_scatter.py);
                                    # below ~1M rows the plain scatter wins.
    grad_window_bits: int = 14      # log2 destinations per window (Pw);
                                    # capacity must be divisible by Pw.
                                    # 2^14 gives nw=64 at the 1M scene
                                    # (~7 ms cheaper than the r4 nw=8) and
                                    # nw=8 at bench capacity — the r5 sweep
                                    # found smaller windows strictly >= .
    grad_window_slack: float = 0.85  # per-window slab capacity = slack *
                                    # mean rows/window (128-aligned); rows
                                    # past the cap are counted in overflow
                                    # telemetry like every other capacity.
                                    # Interleaved windows balance to the
                                    # LIVE row count (~52% fill at the 1M
                                    # bench scene), so 0.85 only drops when
                                    # the table itself nears saturation;
                                    # slab rows are gathered+scattered, so
                                    # slack is paid at ~23 ms per 1M rows.
    rank_kernel_lanes: bool = True  # lane-major compact rank kernel:
                                    # per-Gaussian vectors live on lanes so
                                    # the ~30 sublane<->lane relayouts per
                                    # block of the row-major kernel (its
                                    # dominant cost, r3 measurement) vanish;
                                    # also drops the [P, D] tid kernel input
                                    # (rects re-enumerated in-kernel).
    rank_block_gaussians: int = 1024  # Pb: Gaussians per rank-kernel grid
                                    # step, processed as serial 256-wide
                                    # sub-blocks (so compute, compaction
                                    # layout, S semantics, and drop behavior
                                    # are IDENTICAL for every Pb); clamped
                                    # to the capacity. Measured flat 256..
                                    # 1024, worse at 2048 (r3).
    chunk: int = 32                 # XLA-path compositing chunk (K % chunk == 0)
    chunk_pallas: int = 128         # Pallas kernel chunk (MXU tile; K % 128 == 0)
    tiles_per_kernel_step: int = 4  # composite kernels: tiles batched into
                                    # one grid step (falls back to the
                                    # largest divisor of the tile count).
                                    # Measured within noise of 1 on v5e
                                    # (dispatch overhead is small) but the
                                    # best-measured full-step combo used 4.
    alpha_min: float = 1.0 / 255.0  # skip threshold (forward.cu:344)
    alpha_max: float = 0.99         # clamp (forward.cu:343)
    transmittance_min: float = 1e-4  # early-stop threshold (forward.cu:347)
    near: float = 0.2               # frustum near cull (auxiliary.h:154)
    low_pass: float = 0.3           # 2D cov dilation (forward.cu:110-111)
    bwd_bf16: bool = True           # bf16 operands for the backward kernel's
                                    # two triangular [G,G]x[G,npix] matmuls
                                    # (t_excl recompute + suffix sum).
                                    # Measured (scripts/perf_bwd_bf16.py,
                                    # v5e bench): 50.0 -> 53.7 it/s at
                                    # <= 1e-4 relative gradient error on
                                    # every param. Forward stays f32 (color
                                    # accuracy).
    use_pallas: bool = True         # Pallas compositing kernel vs pure-XLA path
    use_rank_kernel: bool = True    # Pallas rank kernel vs the lax.scan path
                                    # (debug/golden-comparison escape hatch)
    interpret_kernels: bool = False  # make the rank-kernel path eligible
                                    # off-TPU (Pallas interpret mode) so CPU
                                    # tests and the multichip dryrun exercise
                                    # the REAL kernel code under shard_map.
                                    # Off by default: interpret mode is slow
                                    # and the scan path is the CPU golden.


@dataclass
class ModelConfig:
    """reference/arguments/__init__.py:47-64."""

    sh_degree: int = 3
    source_path: str = ""
    model_path: str = ""
    images: str = "images"
    language_features_name: str = "language_features_GGrouping_dim3"
    resolution: int = 8
    white_background: bool = False
    eval: bool = True
    nviews: int = 3
    capacity: int = 1 << 17        # static Gaussian slot count (TPU-only knob)
    init_points: int = 10_000      # random init size when no MVS cloud exists
    dpt_weights: str = ""          # .npz from tools/convert_dpt.py (MiDaS role)
    lpips_weights: str = ""        # .npz from tools/convert_lpips.py; when set,
                                   # training_report + evaluate include
                                   # LPIPS-VGG (reference train.py:292)
    dpt_bf16: bool = True          # store/run the depth net in bf16 params
                                   # (f32 in/out). Measured 17.8 vs 21.4 ms
                                   # fwd+input-grad on v5e (scripts/
                                   # perf_dpt.py); the output feeds only
                                   # scale-invariant Pearson terms. MXU pass
                                   # count is governed separately by
                                   # dpt_matmul_precision below.
    dpt_resize: str = "bicubic"    # depth-net in/out resize: "bicubic" =
                                   # torch parity with the reference's
                                   # F.interpolate (depth_utils.py:33-44),
                                   # run as MXU matmuls; "bilinear" = pre-r3
                                   # behavior.
    dpt_matmul_precision: str = "default"
                                   # MXU precision for the depth net only.
                                   # The package-wide default is "highest"
                                   # (6-pass f32 — geometry needs it); the
                                   # frozen depth net feeding scale-
                                   # invariant Pearson losses does not, and
                                   # single-pass bf16 runs ~6x faster.
                                   # ("BF16_BF16_F32_X3" is the middle ground.)


@dataclass
class PipelineConfig:
    """reference/arguments/__init__.py:66-72."""

    convert_SHs_python: bool = True
    compute_cov3D_python: bool = False
    debug: bool = False
    use_confidence: bool = False


@dataclass
class OptimizationConfig:
    """reference/arguments/__init__.py:74-124 (same names and defaults)."""

    iterations: int = 6_000
    position_lr_init: float = 0.016
    position_lr_final: float = 0.00016
    position_lr_delay_mult: float = 0.01
    position_lr_start: int = 500
    position_lr_max_steps: int = 5500
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.003
    rotation_lr: float = 0.001
    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    densification_interval: int = 100
    opacity_reset_interval: int = 3000
    densify_from_iter: int = 500
    prune_from_iter: int = 500
    densify_until_iter: int = 6000
    densify_grad_threshold: float = 0.0013
    random_background: bool = False
    include_feature: bool = True
    language_feature_lr: float = 0.013
    soft_depth_start: int = 1000
    hard_depth_start: int = 0
    error_tolerance: float = 0.2
    depth_weight: float = 0.05
    depth_weight_late: float = 0.001   # depth_weight after end_sample_pseudo (train.py:134)
    depth_pseudo_weight: float = 0.5
    shape_pena: float = 0.001
    scale_pena: float = 0.001
    opa_pena: float = 0.01
    pseudo_seg_from_train_view: bool = False
                                   # True = reference-exact segment labels for
                                   # the pseudo seg-pearson: index the pseudo
                                   # depth with the TRAIN view's feature
                                   # render (reference train.py:156), which is
                                   # geometrically misaligned with the pseudo
                                   # depth map. False (default) = the aligned
                                   # reading (pseudo view's own features).
                                   # See docs/PARITY.md "deliberate deviations".
    start_sample_pseudo: int = 2000
    end_sample_pseudo: int = 5500
    sample_pseudo_interval: int = 1
    known_fl1: float = 1.0
    known_fce: float = 0.01
    known_fsm: float = 0.000001
    novel_rgb_l1: float = 0.1
    reproj_rgb: float = 0.01
    prune_threshold: float = 0.01
    dist_thres: float = 10.0
    proximity_until_iter: int = 2000   # gaussian_model.py:598-599
    test_iterations: Tuple[int, ...] = (1000, 2000, 3000, 5000, 10000)
    save_iterations: Tuple[int, ...] = (5000, 10000)
    checkpoint_iterations: Tuple[int, ...] = (5000, 10000)


@dataclass
class TrainConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    pipeline: PipelineConfig = field(default_factory=PipelineConfig)
    optim: OptimizationConfig = field(default_factory=OptimizationConfig)
    raster: RasterizeConfig = field(default_factory=RasterizeConfig)
    seed: int = 0                   # reference seeds all RNGs to 0 (general_utils.py:140-142)
    views_per_batch: int = 1        # TPU data-parallel view batch (reference: 1)
    # Device mesh for the training driver (SURVEY §2.3; no reference
    # counterpart — the reference is single-GPU). data shards the view batch
    # (views_per_batch must be a multiple of mesh_data), gauss shards the
    # Adam moments + densify stats (ZeRO-1), tile shards the rasterized tile
    # grid (shard_map; zero forward collectives, one backward psum). The
    # product must divide len(jax.devices()); 1x1x1 = single chip.
    mesh_data: int = 1              # device-mesh data (view) axis size
    mesh_gauss: int = 1             # device-mesh Gaussian-shard axis size
    mesh_tile: int = 1              # device-mesh rasterizer tile axis size


def _to_dict(obj):
    if dataclasses.is_dataclass(obj):
        return {f.name: _to_dict(getattr(obj, f.name)) for f in dataclasses.fields(obj)}
    if isinstance(obj, (list, tuple)):
        return [_to_dict(v) for v in obj]
    return obj


def _from_dict(cls, data):
    import typing

    hints = typing.get_type_hints(cls)
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in data:
            continue
        v = data[f.name]
        ftype = hints.get(f.name, f.type)
        if isinstance(ftype, type) and dataclasses.is_dataclass(ftype):
            kwargs[f.name] = _from_dict(ftype, v)
        elif isinstance(v, list):
            kwargs[f.name] = tuple(v)
        else:
            kwargs[f.name] = v
    return cls(**kwargs)


def save_config(cfg: TrainConfig, path: str | Path) -> None:
    Path(path).write_text(json.dumps(_to_dict(cfg), indent=2))


def load_config(path: str | Path) -> TrainConfig:
    return _from_dict(TrainConfig, json.loads(Path(path).read_text()))
