"""DPT architecture equivalence vs the torch reference implementation with
random weights — validates the port and the weight converter without any
pretrained download."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from sdpgs_tpu.models.dpt import DPTArch, dpt_forward


def build_torch_tiny():
    from transformers import DPTConfig, DPTForDepthEstimation

    cfg = DPTConfig(
        hidden_size=32, num_hidden_layers=4, num_attention_heads=2,
        intermediate_size=64, image_size=96, patch_size=16,
        fusion_hidden_size=16, neck_hidden_sizes=[8, 12, 24, 32],
        backbone_out_indices=[0, 1, 2, 3], is_hybrid=False,
        reassemble_factors=[4, 2, 1, 0.5],
    )
    torch.manual_seed(0)
    return DPTForDepthEstimation(cfg).eval()


def test_dpt_matches_torch_random_weights():
    model = build_torch_tiny()
    params = {k: jnp.asarray(v.detach().numpy())
              for k, v in model.state_dict().items()}
    arch = DPTArch.tiny()

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 3, 96, 96)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).predicted_depth.numpy()
    out = np.asarray(dpt_forward(params, jnp.asarray(x), arch))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-3)


@pytest.mark.slow
def test_dpt_nonsquare_pos_interp():
    """Non-square input exercises position-embedding interpolation (the
    torch reference cannot reshape non-square grids in this path, so this
    checks shape/finiteness/differentiability of our port only)."""
    import jax

    model = build_torch_tiny()
    params = {k: jnp.asarray(v.detach().numpy())
              for k, v in model.state_dict().items()}
    arch = DPTArch.tiny()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 3, 96, 128)).astype(np.float32))
    out = dpt_forward(params, x, arch)
    assert out.shape == (1, 96, 128)
    assert np.all(np.isfinite(np.asarray(out)))
    # gradients flow back to the image (the reference keeps MiDaS
    # differentiable w.r.t. the rendered pseudo view, depth_utils.py:38-44)
    g = jax.grad(lambda im: jnp.sum(dpt_forward(params, im, arch)))(x)
    assert float(jnp.abs(g).sum()) > 0.0


def build_torch_tiny_hybrid():
    from transformers import BitConfig, DPTConfig, DPTForDepthEstimation

    bit_cfg = BitConfig(
        embedding_size=16, hidden_sizes=[16, 32, 32], depths=[1, 1, 1],
        layer_type="bottleneck", stem_type="same",
        out_features=["stage1", "stage2", "stage3"], num_groups=8,
        embedding_dynamic_padding=True, global_padding="SAME",
    )
    cfg = DPTConfig(
        hidden_size=32, num_hidden_layers=4, num_attention_heads=2,
        intermediate_size=64, image_size=96, patch_size=16,
        fusion_hidden_size=16, neck_hidden_sizes=[16, 32, 32, 32],
        backbone_out_indices=[0, 1, 2, 3], is_hybrid=True,
        reassemble_factors=[1, 1, 1, 0.5],
        backbone_config=bit_cfg,
        backbone_featmap_shape=[1, 32, 6, 6],
        neck_ignore_stages=[0, 1],
    )
    torch.manual_seed(0)
    return DPTForDepthEstimation(cfg).eval()


def test_dpt_hybrid_matches_torch_random_weights():
    from sdpgs_tpu.models.dpt import DPTArch as A

    model = build_torch_tiny_hybrid()
    params = {k: jnp.asarray(v.detach().numpy())
              for k, v in model.state_dict().items()}
    arch = A.tiny_hybrid()

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 3, 96, 96)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).predicted_depth.numpy()
    from sdpgs_tpu.models.dpt import dpt_forward

    out = np.asarray(dpt_forward(params, jnp.asarray(x), arch))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=5e-3)


def test_dpt_bf16_close_to_f32():
    """bf16 inference (models.depth_estimator dpt_bf16 path) tracks the f32
    output within ~2% relative of the output range on the tiny arch."""
    from sdpgs_tpu.models.dpt import DPTArch as A
    from sdpgs_tpu.models.dpt import dpt_forward

    model = build_torch_tiny()
    params = {k: jnp.asarray(v.detach().numpy())
              for k, v in model.state_dict().items()}
    params_bf = {k: (v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v)
                 for k, v in params.items()}
    arch = A.tiny()
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 3, 96, 96)).astype(np.float32))
    f32 = np.asarray(dpt_forward(params, x, arch))
    bf = np.asarray(dpt_forward(params_bf, x.astype(jnp.bfloat16), arch)
                    .astype(jnp.float32))
    scale = max(float(np.abs(f32).max()), 1e-6)
    assert np.abs(bf - f32).max() / scale < 0.02


def _assert_params_match_torch(gen, model):
    sd = {k: tuple(v.shape) for k, v in model.state_dict().items()}
    for k, v in gen.items():
        assert k in sd, f"generated key not in torch state dict: {k}"
        assert tuple(v.shape) == sd[k], (k, tuple(v.shape), sd[k])


def test_random_params_shapes_match_torch_tiny():
    """random_params must generate exactly the (name, shape) subset the torch
    state dict carries — so full-size random nets (bench pseudo flavor,
    acceptance rig) are architecture-faithful without torch at runtime."""
    from sdpgs_tpu.models.dpt import DPTArch as A
    from sdpgs_tpu.models.dpt import dpt_forward, random_params

    model = build_torch_tiny()
    gen = random_params(A.tiny(), seed=0, image_size=96)
    _assert_params_match_torch(gen, model)

    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 3, 96, 96)).astype(np.float32))
    out = dpt_forward({k: jnp.asarray(v) for k, v in gen.items()}, x, A.tiny())
    assert out.shape == (1, 96, 96)
    assert np.all(np.isfinite(np.asarray(out)))


def test_random_params_shapes_match_torch_tiny_hybrid():
    from sdpgs_tpu.models.dpt import DPTArch as A
    from sdpgs_tpu.models.dpt import dpt_forward, random_params

    model = build_torch_tiny_hybrid()
    gen = random_params(A.tiny_hybrid(), seed=0, image_size=96)
    _assert_params_match_torch(gen, model)

    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 3, 96, 96)).astype(np.float32))
    out = dpt_forward({k: jnp.asarray(v) for k, v in gen.items()}, x, A.tiny_hybrid())
    assert out.shape == (1, 96, 96)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.slow
def test_mono_depth_from_random_params_runs():
    """mono_depth_from_params on random weights: the full estimate_depth
    path (resize 384x512, normalize, forward, resize back) runs and is
    differentiable w.r.t. the input image."""
    import jax

    from sdpgs_tpu.models.depth_estimator import mono_depth_from_params
    from sdpgs_tpu.models.dpt import DPTArch as A
    from sdpgs_tpu.models.dpt import random_params

    mono = mono_depth_from_params(
        random_params(A.tiny_hybrid(), seed=1), arch=A.tiny_hybrid()
    )
    img = jnp.asarray(
        np.random.default_rng(2).uniform(size=(3, 48, 64)).astype(np.float32)
    )
    d = mono.apply(mono.params, img)
    assert d.shape == (48, 64)
    g = jax.grad(lambda im: jnp.sum(mono.apply(mono.params, im)))(img)
    assert float(jnp.abs(g).sum()) > 0.0
