"""Checkpoint round trip (orbax) + config JSON round trip."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sdpgs_tpu.config import TrainConfig, load_config, save_config
from sdpgs_tpu.core.gaussians import create_from_points
from sdpgs_tpu.train.state import TrainState, restore_checkpoint, save_checkpoint


def test_checkpoint_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(16, 3)).astype(np.float32)
    g = create_from_points(pts, np.full((16, 3), 0.5, np.float32), 32,
                           init_scale=np.full(16, 0.01))
    state = TrainState.create(g)
    state = state.replace(step=jnp.int32(123))
    save_checkpoint(tmp_path, state, 123)

    template = TrainState.create(g)
    restored = restore_checkpoint(tmp_path, 123, template)
    assert int(restored.step) == 123
    np.testing.assert_allclose(np.asarray(restored.gaussians.xyz),
                               np.asarray(state.gaussians.xyz))
    np.testing.assert_allclose(np.asarray(restored.opt_state.mu["xyz"]),
                               np.asarray(state.opt_state.mu["xyz"]))


def test_config_roundtrip(tmp_path):
    cfg = TrainConfig()
    cfg.optim.iterations = 4321
    cfg.model.nviews = 5
    cfg.raster = dataclasses.replace(cfg.raster, max_per_tile=256)
    save_config(cfg, tmp_path / "cfg.json")
    cfg2 = load_config(tmp_path / "cfg.json")
    assert cfg2.optim.iterations == 4321
    assert cfg2.model.nviews == 5
    assert cfg2.raster.max_per_tile == 256
    assert cfg2.optim.test_iterations == cfg.optim.test_iterations
