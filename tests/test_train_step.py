"""End-to-end slice: a few train steps on a synthetic scene must decrease
loss / increase PSNR (SURVEY.md §4 item 4), and the pseudo-view branch must
produce finite updates."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdpgs_tpu.config import TrainConfig, RasterizeConfig
from sdpgs_tpu.core.camera import Camera
from sdpgs_tpu.core.gaussians import create_from_points
from sdpgs_tpu.render import render
from sdpgs_tpu.train.state import TrainState
from sdpgs_tpu.train.step import PseudoInputs, ViewBatch, make_train_step


def small_cfg():
    cfg = TrainConfig()
    cfg.raster = RasterizeConfig(
        tile=16, max_per_tile=128, max_tiles_per_gaussian=16, chunk=32,
        use_pallas=False,
    )
    return cfg


def synthetic_batch(rng, capacity=64, n=48, width=48, height=32):
    cams = [
        Camera.create(R=np.eye(3), T=np.array([dx, 0.0, 0.0]), fovx=0.9, fovy=0.7,
                      width=width, height=height)
        for dx in (-0.2, 0.0, 0.2)
    ]
    # "ground truth" scene rendered from a random gaussian cloud
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 0.4 + np.array([0, 0, 3.0], np.float32)
    cols = rng.uniform(size=(n, 3)).astype(np.float32)
    gt_g = create_from_points(pts, cols, n, init_scale=np.full(n, 0.01),
                              initial_opacity=0.9)
    cfg = small_cfg()
    bg = jnp.zeros(3)
    images, depths = [], []
    for cam in cams:
        out = render(cam, gt_g, cfg.raster, bg, 0)
        images.append(np.asarray(out.color).transpose(2, 0, 1))
        depths.append(np.asarray(out.depth))
    batch_cam = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cams)
    batch = ViewBatch(
        camera=batch_cam,
        image=jnp.asarray(np.stack(images)),
        depth_mono=jnp.asarray(np.stack(depths)),
        feature=jnp.zeros((3, 3, height, width)),
        seg_map=jnp.zeros((3, height, width), jnp.int32),
    )
    # trainee: perturbed init
    init_pts = pts + rng.normal(size=pts.shape).astype(np.float32) * 0.05
    g = create_from_points(init_pts, np.full((n, 3), 0.5, np.float32), capacity,
                           init_scale=np.full(n, 0.01))
    return g, batch, cams, cfg


def test_loss_decreases(rng):
    g, batch, cams, cfg = synthetic_batch(rng)
    state = TrainState.create(g)
    step = make_train_step(cfg, sh_degree=0)
    protos = jnp.ones((4, 3))
    bg = jnp.zeros(3)
    first_l1, first_psnr = None, None
    for i in range(30):
        state, m = step(state, batch, protos, bg, jnp.float32(1.0))
        if first_l1 is None:
            first_l1, first_psnr = float(m.l1), float(m.psnr)
    assert np.isfinite(float(m.loss))
    # photometric fit must improve (the feature-CE floor keeps total loss > 0)
    assert float(m.l1) < first_l1 * 0.8, (first_l1, float(m.l1))
    assert float(m.psnr) > first_psnr + 1.0, (first_psnr, float(m.psnr))


def test_pseudo_step_finite(rng):
    g, batch, cams, cfg = synthetic_batch(rng)
    state = TrainState.create(g)
    state = state.replace(step=jnp.int32(2500))  # inside pseudo window
    step = make_train_step(cfg, sh_degree=0, with_pseudo=True)
    protos = jnp.ones((4, 3))
    bg = jnp.zeros(3)

    pseudo_cam = Camera.create(R=np.eye(3), T=np.array([0.1, 0.05, 0.0]),
                               fovx=0.9, fovy=0.7, width=48, height=32)
    K = np.asarray(pseudo_cam.intrinsics_matrix())
    R_train = np.stack([np.asarray(c.view)[:3, :3] for c in cams])
    t_train = np.stack([np.asarray(c.view)[:3, 3] for c in cams])
    pseudo = PseudoInputs(
        camera=pseudo_cam,
        train_depths=batch.depth_mono,
        K=jnp.asarray(K),
        R_train=jnp.asarray(R_train),
        t_train=jnp.asarray(t_train),
        R_pseudo=pseudo_cam.view[:3, :3],
        t_pseudo=pseudo_cam.view[:3, 3],
    )
    before = np.asarray(state.gaussians.xyz).copy()  # state is donated
    state, m = step(state, batch, protos, bg, jnp.float32(1.0), pseudo)
    assert np.isfinite(float(m.loss))
    assert np.all(np.isfinite(np.asarray(state.gaussians.xyz)))
    assert float(np.abs(np.asarray(state.gaussians.xyz) - before).sum()) > 0.0


def test_pseudo_step_with_mono_params(rng):
    """The depth net rides through the step as a jit ARGUMENT
    (PseudoInputs.mono_params), not a closure constant."""
    g, batch, cams, cfg = synthetic_batch(rng)
    state = TrainState.create(g)
    state = state.replace(step=jnp.int32(2500))

    def mono_apply(params, image):         # fake depth net with real params
        w = params["w"]
        return jnp.mean(image, axis=0) * w + params["b"]

    step = make_train_step(cfg, sh_degree=0, with_pseudo=True,
                           mono_depth_fn=mono_apply)
    protos = jnp.ones((4, 3))
    bg = jnp.zeros(3)
    pseudo_cam = Camera.create(R=np.eye(3), T=np.array([0.1, 0.05, 0.0]),
                               fovx=0.9, fovy=0.7, width=48, height=32)
    K = np.asarray(pseudo_cam.intrinsics_matrix())
    R_train = np.stack([np.asarray(c.view)[:3, :3] for c in cams])
    t_train = np.stack([np.asarray(c.view)[:3, 3] for c in cams])
    pseudo = PseudoInputs(
        camera=pseudo_cam,
        train_depths=batch.depth_mono,
        K=jnp.asarray(K),
        R_train=jnp.asarray(R_train),
        t_train=jnp.asarray(t_train),
        R_pseudo=pseudo_cam.view[:3, :3],
        t_pseudo=pseudo_cam.view[:3, 3],
        mono_params={"w": jnp.float32(2.0), "b": jnp.float32(0.1)},
    )
    state, m = step(state, batch, protos, bg, jnp.float32(1.0), pseudo)
    assert np.isfinite(float(m.loss))


@pytest.mark.parametrize("from_train_view", [False, True])
def test_pseudo_seg_label_source_flag(rng, from_train_view):
    """Both segment-label sources run: the aligned default (pseudo view's own
    feature render) and the reference-exact train-view labels
    (cfg.optim.pseudo_seg_from_train_view, reference train.py:156)."""
    g, batch, cams, cfg = synthetic_batch(rng)
    cfg.optim.pseudo_seg_from_train_view = from_train_view
    state = TrainState.create(g)
    state = state.replace(step=jnp.int32(4500))  # seg-pearson active (>4000)

    def mono_apply(params, image):
        return jnp.mean(image, axis=0) * params["w"] + params["b"]

    step = make_train_step(cfg, sh_degree=0, with_pseudo=True,
                           mono_depth_fn=mono_apply)
    protos = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
    bg = jnp.zeros(3)
    pseudo_cam = Camera.create(R=np.eye(3), T=np.array([0.1, 0.05, 0.0]),
                               fovx=0.9, fovy=0.7, width=48, height=32)
    pseudo = PseudoInputs(
        camera=pseudo_cam,
        train_depths=batch.depth_mono,
        K=pseudo_cam.intrinsics_matrix(),
        R_train=jnp.stack([c.view[:3, :3] for c in cams]),
        t_train=jnp.stack([c.view[:3, 3] for c in cams]),
        R_pseudo=pseudo_cam.view[:3, :3],
        t_pseudo=pseudo_cam.view[:3, 3],
        mono_params={"w": jnp.float32(2.0), "b": jnp.float32(0.1)},
    )
    state, m = step(state, batch, protos, bg, jnp.float32(1.0), pseudo)
    assert np.isfinite(float(m.loss))
    assert np.all(np.isfinite(np.asarray(state.gaussians.xyz)))
