"""Segment/language-feature losses.

Parity: reference utils/loss_utils.py:212-307 (``loss_feature_metric``,
``penalty_loss``) and the pseudo-view cluster assignment at
reference train.py:155-183 (max_pool3d argmax trick -> re-derived as
per-segment spatial max-pool + argmax over segments).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sdpgs_tpu.losses.basic import l1_loss


def _smooth_normalize(x: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """L2-normalize with a smooth norm: grad is 0 (not NaN) at x == 0, which
    happens at every background pixel of a rendered feature image."""
    return x / jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True) + eps * eps)


def _cosine_to_prototypes(feat: jnp.ndarray, protos: jnp.ndarray) -> jnp.ndarray:
    """[N, C] x [S, C] -> [N, S] cosine similarity."""
    return _smooth_normalize(feat) @ _smooth_normalize(protos).T


def penalty_loss(pred: jnp.ndarray, penalty: str = "l2") -> jnp.ndarray:
    """Spatial smoothness of a [H, W, C] map: mean of squared (or abs)
    first differences along H and W, each divided by ndims=2
    (reference loss_utils.py:212-248)."""
    dh = pred[1:, :, :] - pred[:-1, :, :]
    dw = pred[:, 1:, :] - pred[:, :-1, :]
    if penalty == "l1":
        return (jnp.mean(jnp.abs(dh)) + jnp.mean(jnp.abs(dw))) / 2.0
    return (jnp.mean(dh**2) + jnp.mean(dw**2)) / 2.0


def loss_feature_metric(
    language_feature: jnp.ndarray,      # [3, H, W] rendered feature image
    gt_language_feature: jnp.ndarray,   # [3, H, W] per-pixel GT feature
    prototypes: jnp.ndarray,            # [S, 3] global segment prototypes
    seg_map: jnp.ndarray,               # [H, W] int segment ids (into S)
    known_fce: float = 0.01,
    known_fl1: float = 1.0,
    known_fsm: float = 1e-6,
    label_smoothing: float = 1e-3,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Label-smoothed CE of softmax(cosine-sim to prototypes) + L1 + spatial
    smoothness (reference loss_utils.py:251-307). Returns
    (loss_feature, loss_smooth) like the reference."""
    S = prototypes.shape[0]
    pred = language_feature.transpose(1, 2, 0).reshape(-1, 3)    # [N, 3]
    gt = gt_language_feature.transpose(1, 2, 0).reshape(-1, 3)

    z_pred = _cosine_to_prototypes(pred, prototypes)             # [N, S]
    p_k = jax.nn.softmax(z_pred, axis=-1)

    seg = jnp.clip(seg_map.reshape(-1), 0, S - 1)
    one_hot = jax.nn.one_hot(seg, S)
    q_k = (1.0 - label_smoothing) * one_hot + label_smoothing / S

    ce = -jnp.sum(q_k * jnp.log(p_k + 1e-8), axis=1).mean()
    loss_feature = known_fce * ce + known_fl1 * l1_loss(pred, gt)
    loss_smooth = known_fsm * penalty_loss(language_feature.transpose(1, 2, 0))
    return loss_feature, loss_smooth


def segment_cluster_assign(
    feature_img: jnp.ndarray,   # [3, H, W] rendered feature image
    prototypes: jnp.ndarray,    # [S, 3]
    window: int = 7,
) -> jnp.ndarray:
    """Assign each pixel the segment whose softmax probability is maximal in
    a (S, window, window) neighborhood — de-noised cluster labels for the
    per-segment pseudo depth loss (reference train.py:161-171's
    ``max_pool3d`` + index-arithmetic trick, re-derived as spatial max-pool
    per segment followed by argmax over segments). Returns [H, W] int32."""
    _, H, W = feature_img.shape
    feat = feature_img.transpose(1, 2, 0).reshape(-1, 3)
    p_k = jax.nn.softmax(_cosine_to_prototypes(feat, prototypes), axis=-1)  # [N, S]
    p_img = p_k.reshape(H, W, -1)

    # separable max-pool: max over a (w, w) window == max over (w, 1) then
    # (1, w) — bit-identical, 2w instead of w^2 compares per pixel
    pooled = jax.lax.reduce_window(
        p_img,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(window, 1, 1),
        window_strides=(1, 1, 1),
        padding="SAME",
    )
    pooled = jax.lax.reduce_window(
        pooled,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, window, 1),
        window_strides=(1, 1, 1),
        padding="SAME",
    )
    return jnp.argmax(pooled, axis=-1).astype(jnp.int32)
