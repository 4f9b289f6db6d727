"""Phase-split BiT stem == the strided 7x7/2 conv on the resized image.

The fused resize+space-to-depth path (ops/resize.resize2d_stem_phases +
models/bit.stem_phase_conv) must reproduce the reference pipeline
(bicubic resize -> normalize -> TF-SAME 7x7/2 WS conv) to float tolerance,
including through the full DPT-Hybrid forward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdpgs_tpu.models.bit import _same_pad, _ws_conv, stem_phase_conv
from sdpgs_tpu.ops.resize import resize2d, resize2d_stem_phases


def test_stem_phase_conv_matches_strided(rng):
    H, W = 94, 126                    # odd-ish source, even resize target
    OH, OW = 96, 128
    img = rng.normal(size=(1, 3, H, W)).astype(np.float32)
    w = rng.normal(size=(8, 3, 7, 7)).astype(np.float32) * 0.1
    p = {"bit.embedder.convolution.weight": jnp.asarray(w)}

    norm = (jnp.asarray(img) - 0.5) / 0.5
    # reference order: resize -> normalize -> strided SAME conv
    x = (resize2d(jnp.asarray(img), OH, OW, "bicubic", False) - 0.5) / 0.5
    ref = _ws_conv(p, "bit.embedder.convolution", x, 7, 2)

    phases = resize2d_stem_phases(norm, OH, OW, "bicubic", False)
    out = stem_phase_conv(p, phases, prefix="bit")

    assert out.shape == ref.shape == (1, 8, OH // 2, OW // 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_depth_estimator_phase_stem_matches(rng):
    """mono_depth_from_params with phase_stem on/off agree through a tiny
    DPT-Hybrid (same weights, same bicubic resize)."""
    from sdpgs_tpu.models.depth_estimator import mono_depth_from_params
    from sdpgs_tpu.models.dpt import DPTArch, random_params

    arch = DPTArch.tiny_hybrid()
    raw = random_params(arch, seed=0)
    img = jnp.asarray(rng.uniform(size=(3, 47, 63)).astype(np.float32))

    base = mono_depth_from_params(raw, arch=arch, phase_stem=False)
    fast = mono_depth_from_params(raw, arch=arch, phase_stem=True)
    d0 = np.asarray(base.apply(base.params, img))
    d1 = np.asarray(fast.apply(fast.params, img))
    np.testing.assert_allclose(d1, d0, rtol=2e-3, atol=2e-3)

    # gradients w.r.t. the input image flow through the phase path
    gfn = jax.grad(lambda im: jnp.sum(fast.apply(fast.params, im) ** 2))
    gr = np.asarray(gfn(img))
    assert np.all(np.isfinite(gr)) and np.abs(gr).sum() > 0
