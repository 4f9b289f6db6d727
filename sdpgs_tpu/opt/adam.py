"""Per-group Adam for the Gaussian parameter pytree.

Parity with the reference's torch.optim.Adam setup
(reference/scene/gaussian_model.py:217-271): per-parameter-group learning
rates (xyz LR additionally log-lerp scheduled and scaled by the scene
extent), eps=1e-15, betas (0.9, 0.999). Implemented as an explicit pytree of
moments so densification can zero individual slot rows (the analogue of the
reference's optimizer-state surgery at gaussian_model.py:400-476) without
ever reallocating.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from flax import struct

from sdpgs_tpu.core.gaussians import Gaussians

TRAINABLE = (
    "xyz",
    "features_dc",
    "features_rest",
    "scaling",
    "rotation",
    "opacity",
    "language_feature",
)


def trainable_params(g: Gaussians) -> Dict[str, jnp.ndarray]:
    return {k: getattr(g, k) for k in TRAINABLE}


@struct.dataclass
class GaussianAdamState:
    mu: Dict[str, jnp.ndarray]
    nu: Dict[str, jnp.ndarray]
    step: jnp.ndarray  # scalar int32


def adam_init(g: Gaussians) -> GaussianAdamState:
    params = trainable_params(g)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    return GaussianAdamState(
        mu=zeros,
        nu=jax.tree_util.tree_map(jnp.zeros_like, params),
        step=jnp.int32(0),
    )


def expon_lr(
    step: jnp.ndarray,
    lr_init: float,
    lr_final: float,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
    max_steps: int = 1_000_000,
) -> jnp.ndarray:
    """Log-linear interpolated decay with optional sine-eased delay
    (reference/utils/general_utils.py:39-72; Plenoxels lineage)."""
    lr_init = jnp.asarray(lr_init, jnp.float32)
    lr_final = jnp.asarray(lr_final, jnp.float32)
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    safe_init = jnp.maximum(lr_init, 1e-30)
    safe_final = jnp.maximum(lr_final, 1e-30)
    log_lerp = jnp.exp(jnp.log(safe_init) * (1.0 - t) + jnp.log(safe_final) * t)
    log_lerp = jnp.where((lr_init == 0.0) & (lr_final == 0.0), 0.0, log_lerp)
    if lr_delay_steps > 0:
        delay = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0)
        )
    else:
        delay = 1.0
    return jnp.where(step < 0, 0.0, delay * log_lerp)


def learning_rates(opt_cfg, step: jnp.ndarray, spatial_lr_scale: float) -> Dict[str, jnp.ndarray]:
    """Per-group LRs at a given step (reference gaussian_model.py:228-238,
    277-284: f_rest = feature_lr / 20, xyz scheduled)."""
    xyz_lr = expon_lr(
        step,
        opt_cfg.position_lr_init * spatial_lr_scale,
        opt_cfg.position_lr_final * spatial_lr_scale,
        lr_delay_mult=opt_cfg.position_lr_delay_mult,
        max_steps=opt_cfg.position_lr_max_steps,
    )
    f = jnp.float32
    return {
        "xyz": xyz_lr,
        "features_dc": f(opt_cfg.feature_lr),
        "features_rest": f(opt_cfg.feature_lr / 20.0),
        "scaling": f(opt_cfg.scaling_lr),
        "rotation": f(opt_cfg.rotation_lr),
        "opacity": f(opt_cfg.opacity_lr),
        "language_feature": f(opt_cfg.language_feature_lr),
    }


def adam_update(
    g: Gaussians,
    grads: Dict[str, jnp.ndarray],
    state: GaussianAdamState,
    lrs: Dict[str, jnp.ndarray],
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-15,
) -> tuple[Gaussians, GaussianAdamState]:
    step = state.step + 1
    bc1 = 1.0 - b1 ** step.astype(jnp.float32)
    bc2 = 1.0 - b2 ** step.astype(jnp.float32)

    new_params, new_mu, new_nu = {}, {}, {}
    for k in TRAINABLE:
        p = getattr(g, k)
        grad = grads[k]
        mu = b1 * state.mu[k] + (1 - b1) * grad
        nu = b2 * state.nu[k] + (1 - b2) * grad * grad
        update = (mu / bc1) / (jnp.sqrt(nu / bc2) + eps)
        new_params[k] = p - lrs[k] * update
        new_mu[k] = mu
        new_nu[k] = nu

    return g.replace(**new_params), GaussianAdamState(mu=new_mu, nu=new_nu, step=step)


def zero_state_rows(state: GaussianAdamState, rows: jnp.ndarray,
                    keys: tuple = TRAINABLE) -> GaussianAdamState:
    """Zero moment rows where ``rows`` (float/bool [P]) is set — the
    replacement for the reference's cat/prune/replace optimizer surgery."""
    keep = 1.0 - rows.astype(jnp.float32)

    def zero(d):
        out = dict(d)
        for k in keys:
            v = d[k]
            shape = (-1,) + (1,) * (v.ndim - 1)
            out[k] = v * keep.reshape(shape)
        return out

    return state.replace(mu=zero(state.mu), nu=zero(state.nu))
