"""Adam parity with torch.optim.Adam (the reference optimizer,
gaussian_model.py:267: Adam(lr per group, eps=1e-15)) and LR-schedule parity
with the Plenoxels expon helper."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from sdpgs_tpu.config import OptimizationConfig
from sdpgs_tpu.core.gaussians import create_from_points
from sdpgs_tpu.opt.adam import adam_init, adam_update, expon_lr, learning_rates, trainable_params


def test_adam_matches_torch(rng):
    pts = rng.normal(size=(8, 3)).astype(np.float32)
    g = create_from_points(pts, np.full((8, 3), 0.5, np.float32), 8,
                           init_scale=np.full(8, 0.01))
    state = adam_init(g)

    t_param = torch.nn.Parameter(torch.from_numpy(np.asarray(g.xyz)).clone())
    t_opt = torch.optim.Adam([t_param], lr=0.02, eps=1e-15)

    lrs = {k: jnp.float32(0.02) for k in trainable_params(g)}
    for step in range(5):
        grad = rng.normal(size=(8, 3)).astype(np.float32)
        grads = {k: jnp.zeros_like(v) for k, v in trainable_params(g).items()}
        grads["xyz"] = jnp.asarray(grad)
        g, state = adam_update(g, grads, state, lrs)

        t_opt.zero_grad()
        t_param.grad = torch.from_numpy(grad)
        t_opt.step()

    np.testing.assert_allclose(
        np.asarray(g.xyz), t_param.detach().numpy(), rtol=1e-5, atol=1e-6
    )


def test_expon_lr_matches_reference():
    """reference utils/general_utils.py:39-72 formula."""
    def ref(step, lr_init, lr_final, max_steps, delay_steps=0, delay_mult=1.0):
        if delay_steps > 0:
            delay = delay_mult + (1 - delay_mult) * np.sin(
                0.5 * np.pi * np.clip(step / delay_steps, 0, 1))
        else:
            delay = 1.0
        t = np.clip(step / max_steps, 0, 1)
        return delay * np.exp(np.log(lr_init) * (1 - t) + np.log(lr_final) * t)

    for step in [0, 100, 2750, 5500, 9000]:
        ours = float(expon_lr(jnp.int32(step), 0.016, 0.00016, max_steps=5500))
        assert ours == pytest.approx(ref(step, 0.016, 0.00016, 5500), rel=1e-5)


def test_learning_rates_groups():
    cfg = OptimizationConfig()
    lrs = learning_rates(cfg, jnp.int32(0), 2.0)
    assert float(lrs["xyz"]) == pytest.approx(0.016 * 2.0, rel=1e-5)
    assert float(lrs["features_rest"]) == pytest.approx(0.0025 / 20.0, rel=1e-6)
    assert float(lrs["language_feature"]) == pytest.approx(0.013)
    assert float(lrs["opacity"]) == pytest.approx(0.05)
