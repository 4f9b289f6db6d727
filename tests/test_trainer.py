"""Trainer smoke test on an in-memory synthetic scene: exercises the main
loop, SH warmup, densification, opacity reset, pseudo branch, eval."""

import numpy as np
import jax.numpy as jnp
import pytest

from sdpgs_tpu.config import RasterizeConfig, TrainConfig
from sdpgs_tpu.core.camera import Camera
from sdpgs_tpu.core.gaussians import create_from_points
from sdpgs_tpu.data.camera_utils import LoadedCamera
from sdpgs_tpu.render import render
from sdpgs_tpu.train.loop import Trainer


class FakeScene:
    """Scene-shaped object built fully in memory."""

    def __init__(self, rng, n=64, capacity=128, width=48, height=32):
        self.model_path = ""
        cams = []
        pts = rng.normal(size=(n, 3)).astype(np.float32) * 0.4 + np.array(
            [0, 0, 3.0], np.float32
        )
        cols = rng.uniform(size=(n, 3)).astype(np.float32)
        gt = create_from_points(pts, cols, n, init_scale=np.full(n, 0.01),
                                initial_opacity=0.9)
        cfg = RasterizeConfig(tile=16, max_per_tile=128, max_tiles_per_gaussian=8,
                              chunk=32, use_pallas=False)
        for i, dx in enumerate((-0.2, 0.0, 0.2)):
            R = np.eye(3)
            T = np.array([dx, 0.0, 0.0])
            cam = Camera.create(R=R, T=T, fovx=0.9, fovy=0.7, width=width,
                                height=height)
            out = render(cam, gt, cfg, jnp.zeros(3), 0)
            cams.append(
                LoadedCamera(
                    camera=cam, R=R, T=T, fovx=0.9, fovy=0.7,
                    image=np.asarray(out.color).transpose(2, 0, 1),
                    depth_mono=np.asarray(out.depth),
                    point_feature=np.zeros((3, height, width), np.float32),
                    seg_map=np.zeros((height, width), np.int32),
                    feature_dict=np.ones((2, 3), np.float32),
                    bounds=np.array([1.0, 10.0]),
                    image_name=f"train{i}",
                )
            )
        self.train_cameras = cams
        self.test_cameras = [cams[0]]
        self.prototypes = np.ones((2, 3), np.float32)
        self.cameras_extent = 1.0
        init = pts + rng.normal(size=pts.shape).astype(np.float32) * 0.05
        self.gaussians = create_from_points(
            init, np.full((n, 3), 0.5, np.float32), capacity,
            init_scale=np.full(n, 0.01),
        )
        # pseudo poses: small jitters of view 0 (W2C 4x4)
        poses = []
        for i in range(4):
            p = np.eye(4)
            p[:3, 3] = np.array([0.05 * i, 0.02, 0.0])
            poses.append(p)
        self.pseudo_poses = np.stack(poses)
        self.pseudo_fovx, self.pseudo_fovy = 0.9, 0.7
        self.pseudo_width, self.pseudo_height = width, height

    def pseudo_camera(self, idx):
        pose = self.pseudo_poses[idx]
        R = pose[:3, :3].T
        T = pose[:3, 3]
        cam = Camera.create(R=R, T=T, fovx=self.pseudo_fovx, fovy=self.pseudo_fovy,
                            width=self.pseudo_width, height=self.pseudo_height)
        return cam, R, T

    def save(self, iteration, gaussians):
        pass


@pytest.mark.slow
def test_trainer_end_to_end(rng):
    cfg = TrainConfig()
    cfg.raster = RasterizeConfig(tile=16, max_per_tile=128, max_tiles_per_gaussian=8,
                                 chunk=32, use_pallas=False)
    cfg.optim.densify_from_iter = 10
    cfg.optim.densification_interval = 20
    cfg.optim.densify_until_iter = 100
    cfg.optim.proximity_until_iter = 30
    cfg.optim.start_sample_pseudo = 40
    cfg.optim.end_sample_pseudo = 80
    cfg.optim.opacity_reset_interval = 50
    cfg.optim.test_iterations = ()
    cfg.optim.save_iterations = ()
    cfg.optim.checkpoint_iterations = ()
    scene = FakeScene(rng)
    trainer = Trainer(cfg, scene=scene)
    hist = trainer.train(iterations=90, log_every=10)
    assert len(hist) >= 9
    assert np.isfinite(hist[-1]["loss"])
    # image fit improves until the scheduled opacity reset at
    # start_sample_pseudo+1 (reference train.py:234-236 clamps all opacities
    # to <= 0.01 there by design; recovery takes thousands of iters).
    pre_reset = [h for h in hist if h["iter"] <= cfg.optim.start_sample_pseudo]
    assert pre_reset[-1]["psnr"] > pre_reset[0]["psnr"]
    assert hist[-1]["alive"] > 0
    res = trainer.evaluate(sh_degree=0)
    assert res["n_views"] == 1 and np.isfinite(res["psnr"])


def test_block_slot_escalation_policy():
    """Overflow telemetry flips the binning kernel to the uncompacted path
    at a recompile boundary (only meaningful on TPU; policy logic tested
    here by forcing the backend check)."""
    import dataclasses
    from unittest import mock

    import jax

    from sdpgs_tpu.train.loop import Trainer

    t = Trainer.__new__(Trainer)  # policy unit: no scene needed
    from sdpgs_tpu.config import TrainConfig

    t.cfg = TrainConfig()
    t._steps = {"dummy": object()}
    with mock.patch.object(jax, "default_backend", return_value="tpu"):
        t._maybe_grow_block_slots(73)
    # every grouped drop is a pooled-tail drop at S >= 512: the tail rung
    # grows FIRST (S//4 -> S//2), keeping the grouped readout
    assert t.cfg.raster.rank_block_grouped
    assert t.cfg.raster.rank_block_tail == 256
    assert t.cfg.raster.rank_block_slots == 512
    assert not t._steps  # step cache cleared -> recompile with new config
    t._steps = {"dummy": object()}
    with mock.patch.object(jax, "default_backend", return_value="tpu"):
        t._maybe_grow_block_slots(50)
    assert t.cfg.raster.rank_block_tail == 512      # tail -> S
    assert t.cfg.raster.rank_block_grouped
    t._steps = {"dummy": object()}
    with mock.patch.object(jax, "default_backend", return_value="tpu"):
        t._maybe_grow_block_slots(70)
    assert t.cfg.raster.rank_block_tail == 1024     # tail -> 2S ceiling
    assert t.cfg.raster.rank_block_grouped
    t._steps = {"dummy": object()}
    with mock.patch.object(jax, "default_backend", return_value="tpu"):
        t._maybe_grow_block_slots(90)
    # tail at ceiling (2.5S total rows): jump straight to flat 2S
    assert not t.cfg.raster.rank_block_grouped
    assert t.cfg.raster.rank_block_tail == 0
    assert t.cfg.raster.rank_block_slots == 1024
    assert not t._steps
    t._steps = {"dummy": object()}
    with mock.patch.object(jax, "default_backend", return_value="tpu"):
        t._maybe_grow_block_slots(40)
    assert t.cfg.raster.rank_block_slots == 2048    # flat S=1024 -> 2048
    t._steps = {"dummy": object()}
    with mock.patch.object(jax, "default_backend", return_value="tpu"):
        t._maybe_grow_block_slots(15)
    assert t.cfg.raster.rank_block_slots == 0       # flat S=2048 -> off
    assert not t._steps
    # compaction exhausted: further overflow doubles the per-tile cap K
    t._steps = {"dummy": object()}
    with mock.patch.object(jax, "default_backend", return_value="tpu"):
        t._maybe_grow_block_slots(5)
    assert t.cfg.raster.max_per_tile == 2048
    assert not t._steps
    # at the K ceiling the ladder is exhausted (no-op)
    t.cfg.raster = dataclasses.replace(
        t.cfg.raster, max_per_tile=Trainer.MAX_PER_TILE_CEILING
    )
    t._steps = {"dummy": object()}
    with mock.patch.object(jax, "default_backend", return_value="tpu"):
        t._maybe_grow_block_slots(5)
    assert t._steps  # unchanged

    # D-cap (clipped) adaptation: doubles up to its own ceiling
    t.cfg.raster = dataclasses.replace(t.cfg.raster, max_tiles_per_gaussian=8)
    t._steps = {"dummy": object()}
    t._maybe_grow_tiles_per_gaussian(12)
    assert t.cfg.raster.max_tiles_per_gaussian == 16
    assert not t._steps
    t.cfg.raster = dataclasses.replace(
        t.cfg.raster,
        max_tiles_per_gaussian=Trainer.MAX_TILES_PER_GAUSSIAN_CEILING,
    )
    t._steps = {"dummy": object()}
    t._maybe_grow_tiles_per_gaussian(3)
    assert t._steps  # unchanged


def test_running_max_telemetry_never_misses_a_drop(rng):
    """Drops between log points must not evaporate: the train step folds
    every step's overflow/clip into TrainState's device-side running max,
    and a later non-overflowing step does not erase it (VERDICT r1 weak #6).
    """
    import dataclasses

    import jax

    from sdpgs_tpu.train.state import TrainState
    from sdpgs_tpu.train.step import ViewBatch, make_train_step

    scene = FakeScene(rng)
    cfg = TrainConfig()
    # K=32, D=2 on a dense 64-splat scene: guaranteed overflow + clipping
    cfg.raster = RasterizeConfig(tile=16, max_per_tile=32,
                                 max_tiles_per_gaussian=2, chunk=32,
                                 use_pallas=False)
    from sdpgs_tpu.train.loop import build_view_batch

    batch = build_view_batch(scene.train_cameras, [0])
    protos, bg, lr = jnp.ones((2, 3)), jnp.zeros(3), jnp.float32(1.0)

    state = TrainState.create(scene.gaussians)
    step = make_train_step(cfg, sh_degree=0)
    state, m1 = step(state, batch, protos, bg, lr)
    assert int(m1.overflow) > 0 or int(m1.clipped) > 0, "scene must overflow"
    mo_after_drop = int(state.max_overflow)
    mc_after_drop = int(state.max_clipped)
    assert mo_after_drop == int(m1.overflow)
    assert mc_after_drop == int(m1.clipped)

    # now run a step where nothing drops (huge capacities) — the running max
    # must survive even though this step's metrics report zero
    cfg2 = TrainConfig()
    cfg2.raster = RasterizeConfig(tile=16, max_per_tile=128,
                                  max_tiles_per_gaussian=16, chunk=32,
                                  use_pallas=False)
    step2 = make_train_step(cfg2, sh_degree=0)
    state, m2 = step2(state, batch, protos, bg, lr)
    assert int(m2.overflow) == 0 and int(m2.clipped) == 0
    assert int(state.max_overflow) == mo_after_drop
    assert int(state.max_clipped) == mc_after_drop


def test_trainer_ladder_reacts_to_interim_drop(rng):
    """The Trainer's telemetry ladder must react to the RUNNING max (any
    step's drop), not just the sampled metric at the log step."""
    cfg = TrainConfig()
    cfg.raster = RasterizeConfig(tile=16, max_per_tile=128,
                                 max_tiles_per_gaussian=8, chunk=32,
                                 use_pallas=False)
    cfg.optim.densify_from_iter = 10_000   # no densify interference
    cfg.optim.densify_until_iter = 0
    cfg.optim.start_sample_pseudo = 10_000
    cfg.optim.test_iterations = ()
    cfg.optim.save_iterations = ()
    cfg.optim.checkpoint_iterations = ()
    scene = FakeScene(rng)
    trainer = Trainer(cfg, scene=scene)
    # simulate a drop that happened on a non-logged step (e.g. iteration 3):
    # inject it into the accumulator, then run to the next log boundary with
    # a config that never drops
    trainer.state = trainer.state.replace(max_clipped=jnp.int32(9))
    d_before = trainer.cfg.raster.max_tiles_per_gaussian
    trainer.train(iterations=5, log_every=5)
    assert trainer.cfg.raster.max_tiles_per_gaussian == d_before * 2
    # accumulator reset after the ladder reacted
    assert int(trainer.state.max_clipped) == 0


def test_training_report_persisted(rng, tmp_path):
    """training_report parity (reference train.py:263-307): per-
    test_iterations eval on train+test cams is printed AND persisted to the
    model dir, along with the training history."""
    import json

    cfg = TrainConfig()
    cfg.raster = RasterizeConfig(tile=16, max_per_tile=128,
                                 max_tiles_per_gaussian=8, chunk=32,
                                 use_pallas=False)
    cfg.optim.densify_from_iter = 10_000
    cfg.optim.densify_until_iter = 0
    cfg.optim.start_sample_pseudo = 10_000
    cfg.optim.test_iterations = (4,)
    cfg.optim.save_iterations = ()
    cfg.optim.checkpoint_iterations = ()
    scene = FakeScene(rng)
    scene.model_path = str(tmp_path / "model")
    trainer = Trainer(cfg, scene=scene)
    trainer.train(iterations=6, log_every=3)

    res = json.loads((tmp_path / "model" / "eval_results.json").read_text())
    assert len(res) == 1 and res[0]["iteration"] == 4
    for split in ("test", "train"):
        assert {"l1", "psnr", "ssim"} <= set(res[0][split])
        assert np.isfinite(res[0][split]["psnr"])
    assert res[0]["total_points"] > 0

    hist = json.loads((tmp_path / "model" / "training_history.json").read_text())
    assert hist and hist[-1]["iter"] == 6


def test_slab_drops_grow_slack_alone():
    """Grad-window slab drops are gradient-only capacity losses tracked on
    their own telemetry channel (ADVICE r4): a slab event grows
    grad_window_slack geometrically (bounded at 2.0) WITHOUT moving the
    S/K ladder, and a table overflow event grows S/K WITHOUT touching the
    slack."""
    from types import SimpleNamespace
    from unittest import mock

    import jax

    from sdpgs_tpu.config import TrainConfig
    from sdpgs_tpu.train.loop import Trainer

    t = Trainer.__new__(Trainer)
    t.cfg = TrainConfig()
    t._steps = {"dummy": object()}
    s0 = t.cfg.raster.grad_window_slack
    t._maybe_grow_slab(50)
    assert t.cfg.raster.grad_window_slack == min(2.0, s0 * 1.3)
    assert t.cfg.raster.rank_block_grouped        # S/K ladder untouched
    assert t.cfg.raster.rank_block_slots == 512
    assert not t._steps                           # recompile requested

    # repeated slab events converge to the ceiling and stop recompiling
    for _ in range(10):
        t._steps = {"dummy": object()}
        t._maybe_grow_slab(50)
    assert t.cfg.raster.grad_window_slack == 2.0
    t._steps = {"dummy": object()}
    t._maybe_grow_slab(50)                        # at ceiling: no recompile
    assert t._steps

    # table overflow: the S/K ladder moves, the slack does NOT
    t2 = Trainer.__new__(Trainer)
    t2.cfg = TrainConfig()
    t2._steps = {"dummy": object()}
    s0 = t2.cfg.raster.grad_window_slack
    with mock.patch.object(jax, "default_backend", return_value="tpu"):
        t2._maybe_grow_block_slots(50)
    assert t2.cfg.raster.grad_window_slack == s0
    assert t2.cfg.raster.rank_block_tail == 256   # the tail rung moved
