"""Jitted training steps.

Loss assembly parity with reference/train.py:93-194 — one combined loss,
one backward, one Adam step per iteration:
- photometric (1-lambda)*L1 + lambda*(1-SSIM)          (train.py:99-100)
- language-feature CE + L1 + smoothness                 (train.py:102-109)
- mono-depth Pearson with disparity fallback            (train.py:126-131),
  weight dropping to 0.001 after end_sample_pseudo      (train.py:133-134)
- pseudo-view branch (train.py:138-188): rendered-depth-vs-mono Pearson
  (differentiable through the depth net), per-segment Pearson after iter
  4000, multi-view reprojection consistency.

TPU-first: the step is one jitted function over a *batch* of views (the
reference samples a single random camera per iteration, train.py:89-92);
screen-space densification gradients come from differentiating w.r.t. an
all-zeros mean2d offset instead of the reference's retain_grad trick.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from sdpgs_tpu.config import TrainConfig
from sdpgs_tpu.core.camera import Camera
from sdpgs_tpu.losses import (
    depth_pearson_loss,
    l1_loss_mask,
    loss_feature_metric,
    loss_reproject_depth,
    pearson_corrcoef,
    psnr,
    segment_pearson_loss,
    ssim,
)
from sdpgs_tpu.losses.feature import segment_cluster_assign
from sdpgs_tpu.opt.adam import adam_update, learning_rates, trainable_params
from sdpgs_tpu.opt.densify import add_densification_stats_batched
from sdpgs_tpu.render import render
from sdpgs_tpu.train.state import TrainState


class StepMetrics(NamedTuple):
    loss: jnp.ndarray
    l1: jnp.ndarray
    psnr: jnp.ndarray
    overflow: jnp.ndarray   # entries dropped by the per-tile K cap / S slots
    clipped: jnp.ndarray    # tile slots dropped by the per-Gaussian D cap
    num_alive: jnp.ndarray
    slab: jnp.ndarray       # payload-grad rows dropped by the windowed
                            # backward's slab cap (gradient-only loss)


class ViewBatch(NamedTuple):
    """One batch of training views (leading axis = view)."""

    camera: Camera                 # batched pytree (same H/W across views)
    image: jnp.ndarray             # [V, 3, H, W] ground truth
    depth_mono: jnp.ndarray        # [V, H, W] aligned mono depth prior
    feature: jnp.ndarray           # [V, 3, H, W] per-pixel gt language feature
    seg_map: jnp.ndarray           # [V, H, W] int32 segment ids


class PseudoInputs(NamedTuple):
    """Inputs for the pseudo-view regularization branch."""

    camera: Camera                 # single pseudo camera
    train_depths: jnp.ndarray      # [V, H, W] aligned mono depths (train views)
    K: jnp.ndarray                 # [3, 3]
    R_train: jnp.ndarray           # [V, 3, 3] world->cam
    t_train: jnp.ndarray           # [V, 3]
    R_pseudo: jnp.ndarray          # [3, 3]
    t_pseudo: jnp.ndarray          # [3]
    # Depth-net params pytree, passed as a jit ARGUMENT (a closure-captured
    # DPT-Hybrid would bake ~470MB of constants into the HLO).
    mono_params: object = ()
    # Precomputed reprojection z-buffer (losses.reproject_fused_depth):
    # parameter-independent, so the trainer computes it ONCE per pseudo
    # camera instead of re-warping every step (~3.8 ms/step on v5e). When
    # None the warp runs inside the step (reference-faithful fallback).
    reproj_fused: Optional[jnp.ndarray] = None    # [H, W]
    reproj_weight: Optional[jnp.ndarray] = None   # [H, W] 0/1
    # Which view of the batch plays "the sampled train view" for the
    # reference-exact pseudo-label path (train.py:156 indexes the pseudo
    # depth with the train view's feature render). The reference samples ONE
    # view per iteration, so with V == 1 this is always 0; with V > 1 the
    # trainer samples it (VERDICT r3 weak #6).
    train_view_idx: jnp.ndarray | int = 0


def _render_view(g, cam, offset, cfg: TrainConfig, sh_degree: int, bg,
                 tile_mesh=None):
    """One differentiable render — vmapped over the train-view batch; the
    pseudo view renders through the same function but UNVMAPPED (see
    make_train_step)."""
    # per-Gaussian confidence scales the feature compositing when enabled
    # (reference gaussian_renderer/__init__.py:227: pipe.use_confidence) —
    # the reference's pseudo-view render goes through the same path
    # (train.py:143), so confidence applies there too.
    conf = g.confidence if cfg.pipeline.use_confidence else None
    if tile_mesh is not None:
        from sdpgs_tpu.parallel.tile_shard import render_tile_sharded

        return render_tile_sharded(
            cam, g, cfg.raster, bg, sh_degree, tile_mesh,
            means2d_offset=offset, confidence=conf,
        )
    return render(cam, g, cfg.raster, bg, sh_degree, means2d_offset=offset,
                  confidence=conf)


def _view_losses_from_out(out, gt_img, mono, gt_feat, seg, protos,
                          cfg: TrainConfig, step):
    opt = cfg.optim
    image = out.color.transpose(2, 0, 1)                 # [3, H, W]
    ll1 = l1_loss_mask(image, gt_img)
    loss = (1.0 - opt.lambda_dssim) * ll1 + opt.lambda_dssim * (1.0 - ssim(image, gt_img))

    if opt.include_feature:
        feat_img = out.feature.transpose(2, 0, 1)
        lf, lsm = loss_feature_metric(
            feat_img, gt_feat, protos, seg,
            known_fce=opt.known_fce, known_fl1=opt.known_fl1, known_fsm=opt.known_fsm,
        )
        loss = loss + lf + lsm

    depth_w = jnp.where(
        step > opt.end_sample_pseudo, opt.depth_weight_late, opt.depth_weight
    )
    loss = loss + depth_w * depth_pearson_loss(out.depth, mono, disparity_const=200.0)
    return loss, (ll1, image)


def _pseudo_losses(out, pseudo: PseudoInputs, protos, cfg: TrainConfig,
                   step, mono_depth_fn: Optional[Callable],
                   train_feature=None):
    """Pseudo-view regularization terms (train.py:138-188), computed from an
    already-rendered pseudo view (rendered through the same ``_render_view``
    path as the train views but UNVMAPPED — see make_train_step).

    Segment labels come from the pseudo view's own rendered features by
    default; the reference indexes the pseudo depth with labels from the
    *train* view's feature render (train.py:156 ``render_pkg["feature"]``,
    not ``render_pkg_pseudo``) — geometrically misaligned, but available for
    real-data A/B via ``cfg.optim.pseudo_seg_from_train_view`` (pass the
    train view's [3, H, W] feature image as ``train_feature``)."""
    opt = cfg.optim
    it = step.astype(jnp.float32)
    loss_scale = jnp.clip((it - opt.start_sample_pseudo) / 500.0, 0.0, 1.0)

    depth = out.depth
    total = jnp.float32(0.0)

    if mono_depth_fn is not None:
        mono = mono_depth_fn(
            pseudo.mono_params, out.color.transpose(2, 0, 1)
        )                                                            # [H, W]
        pl = 1.0 - pearson_corrcoef(depth, -mono)
        total = total + loss_scale * opt.depth_pseudo_weight * jnp.nan_to_num(pl)

        if cfg.optim.pseudo_seg_from_train_view and train_feature is not None:
            label_feat = train_feature                     # reference train.py:156
        else:
            label_feat = out.feature.transpose(2, 0, 1)    # aligned reading
        labels = segment_cluster_assign(
            jax.lax.stop_gradient(label_feat), protos
        )
        seg_loss = segment_pearson_loss(depth, mono, labels, protos.shape[0])
        seg_scale = jnp.clip((it - opt.start_sample_pseudo) / 8000.0, 0.0, 1.0)
        total = total + jnp.where(
            it > 4000.0,
            0.25 * seg_scale * opt.depth_pseudo_weight * jnp.nan_to_num(seg_loss),
            0.0,
        )

    if pseudo.reproj_fused is not None:
        from sdpgs_tpu.losses import loss_reproject_from_fused

        reproj = loss_reproject_from_fused(
            depth, pseudo.reproj_fused, pseudo.reproj_weight
        )
    else:
        reproj = loss_reproject_depth(
            depth, pseudo.train_depths, pseudo.K, pseudo.R_train,
            pseudo.t_train, pseudo.R_pseudo, pseudo.t_pseudo,
        )
    total = total + 0.5 * loss_scale * opt.depth_pseudo_weight * jnp.nan_to_num(reproj)
    return total


def make_train_step(
    cfg: TrainConfig,
    sh_degree: int,
    with_pseudo: bool = False,
    mono_depth_fn: Optional[Callable] = None,  # (params, [3,H,W]) -> [H,W]
    tile_mesh=None,
    out_shardings=None,  # (TrainState shardings, StepMetrics shardings)
    unroll_views: bool = False,
) -> Callable:
    """Build the jitted train step for a given active SH degree (the degree
    warmup every 500 iters, train.py:85-86, selects among compiled steps).
    When ``with_pseudo`` the pseudo-view terms join the same loss/backward
    (the reference adds them to ``loss`` before the single backward).

    ``tile_mesh``: a Mesh with a ``tile`` axis switches rendering to the
    tile-partitioned rasterizer (SURVEY §2.3 item 3) — each view's tile grid
    sharded over devices under the same vmapped view batch, composing DP
    (views over ``data``) x ZeRO (moments over ``gauss``) x tile parallelism
    in one jitted step."""

    def step_fn(state: TrainState, batch: ViewBatch, prototypes: jnp.ndarray,
                bg: jnp.ndarray, spatial_lr_scale: jnp.ndarray,
                pseudo: Optional[PseudoInputs] = None):
        g = state.gaussians
        params = trainable_params(g)
        V = batch.image.shape[0]
        offsets = jnp.zeros((V, g.capacity, 2), jnp.float32)

        def total_loss(params, offsets):
            gg = g.replace(**params)

            if unroll_views and V <= 8 and tile_mesh is None:
                # Single-chip V>1: the vmap-batched render lowers worse
                # than V unbatched renders despite flat per-section vmap
                # scaling (the r2/r3 "+30%/view composed-step regression";
                # same effect as the unvmapped pseudo render note below).
                # Do NOT unroll under a mesh: data-parallel sharding needs
                # the batched form so GSPMD partitions views over `data`.
                outs_l = [
                    _render_view(
                        gg,
                        jax.tree_util.tree_map(lambda x: x[v], batch.camera),
                        offsets[v], cfg, sh_degree, bg, tile_mesh=None,
                    )
                    for v in range(V)
                ]
                outs = jax.tree_util.tree_map(
                    lambda *xs: jnp.stack(xs), *outs_l
                )
            else:
                outs = jax.vmap(
                    lambda cam, off: _render_view(
                        gg, cam, off, cfg, sh_degree, bg, tile_mesh=tile_mesh
                    )
                )(batch.camera, offsets)

            losses, (ll1, images) = jax.vmap(
                lambda out, img, mono, feat, seg: _view_losses_from_out(
                    out, img, mono, feat, seg, prototypes, cfg, state.step
                )
            )(outs, batch.image, batch.depth_mono, batch.feature, batch.seg_map)
            loss = jnp.mean(losses)
            if with_pseudo:
                # separate UNVMAPPED render: folding the pseudo view into the
                # train-view vmap as a V+1 batch measured ~6 ms SLOWER on v5e
                # (67.8 vs 62.0 ms pseudo step) despite the sublinear
                # per-section vmap scaling — the unbatched composite/binning
                # lower better than their vmap-batched forms. No densify
                # offset (the reference uses only the train render's
                # screen-space grads, train.py:218-221).
                out_ps = _render_view(
                    gg, pseudo.camera, None, cfg, sh_degree, bg,
                    tile_mesh=tile_mesh,
                )
                train_feat = jnp.take(
                    outs.feature, jnp.asarray(pseudo.train_view_idx), axis=0
                )
                loss = loss + _pseudo_losses(
                    out_ps, pseudo, prototypes, cfg, state.step, mono_depth_fn,
                    train_feature=train_feat.transpose(2, 0, 1),
                )
            return loss, (ll1, images, outs)

        (loss, (ll1, images, outs)), grads = jax.value_and_grad(
            total_loss, argnums=(0, 1), has_aux=True
        )(params, offsets)
        param_grads, offset_grads = grads

        lrs = learning_rates(cfg.optim, state.step, spatial_lr_scale)
        g_new, opt_state = adam_update(g, param_grads, state.opt_state, lrs)

        # Densification stats: accumulate every view's screen-space grads
        # (train.py:218-221), visibility = radii > 0 per view; one batched
        # [V, P] reduction instead of V sequential passes.
        H, W = batch.image.shape[-2:]
        stats = add_densification_stats_batched(
            state.stats, offset_grads, outs.visibility, outs.radii, W, H
        )

        metrics = StepMetrics(
            loss=loss,
            l1=jnp.mean(ll1),
            psnr=jnp.mean(
                jax.vmap(lambda a, b: psnr(jnp.clip(a, 0, 1), jnp.clip(b, 0, 1)))(
                    images, batch.image
                )
            ),
            overflow=jnp.max(outs.overflow),
            clipped=jnp.max(outs.clipped),
            num_alive=g_new.num_alive(),
            slab=jnp.max(outs.slab),
        )
        new_state = state.replace(
            gaussians=g_new,
            opt_state=opt_state,
            stats=stats,
            step=state.step + 1,
            # continuous telemetry: fold this step's drops into the running
            # max so no drop is ever missed between host-side log points
            max_overflow=jnp.maximum(state.max_overflow, metrics.overflow),
            max_clipped=jnp.maximum(state.max_clipped, metrics.clipped),
            max_slab=jnp.maximum(state.max_slab, metrics.slab),
        )
        return new_state, metrics

    # Donating the state buffers lets XLA update the ~100MB of params/moments
    # in place instead of copying them every step. Under a mesh the output
    # state is PINNED to the canonical shardings (params replicated, moments/
    # stats over 'gauss') — without the pin GSPMD may shard the updated
    # params over 'gauss', silently turning every subsequent render into an
    # all-gather and breaking the driver's sharding contract.
    return jax.jit(step_fn, donate_argnums=(0,), out_shardings=out_shardings)
