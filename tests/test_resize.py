"""Torch-parity of the matmul resize (reference utils/depth_utils.py:33-44
uses F.interpolate bicubic align_corners=False for the depth-net in/out)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from sdpgs_tpu.ops.resize import resize2d, resize2d_phases


CASES = [
    # (in_h, in_w, out_h, out_w) — the depth-net pair plus up/down shapes
    (378, 504, 384, 512),
    (384, 512, 378, 504),
    (32, 48, 64, 96),
    (64, 96, 32, 48),
]


@pytest.mark.parametrize("shape", CASES)
@pytest.mark.parametrize("method", ["bicubic", "bilinear"])
@pytest.mark.parametrize("align_corners", [False, True])
def test_resize_matches_torch(rng, shape, method, align_corners):
    ih, iw, oh, ow = shape
    x = rng.normal(size=(1, 3, ih, iw)).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x).double(), size=(oh, ow),
                        mode=method, align_corners=align_corners).numpy()
    out = np.asarray(resize2d(jnp.asarray(x), oh, ow, method, align_corners))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_resize_phases_match_strided_view(rng):
    x = rng.normal(size=(2, 3, 378, 504)).astype(np.float32)
    full = np.asarray(resize2d(jnp.asarray(x), 384, 512, "bicubic", False))
    ph = np.asarray(resize2d_phases(jnp.asarray(x), 384, 512, 2, "bicubic", False))
    for py in range(2):
        for px in range(2):
            np.testing.assert_allclose(
                ph[:, :, py, px], full[:, :, py::2, px::2], rtol=1e-6, atol=1e-6)


def test_matmul_bilinear_matches_gather_formulation(rng):
    """dpt._resize_bilinear now routes through the matmul resize; it must
    match the original gather-based formulation on both align_corners
    conventions (the formulation the torch-parity tests were built on)."""
    from sdpgs_tpu.models.dpt import _resize_bilinear, _resize_bilinear_gather

    x = jnp.asarray(rng.normal(size=(2, 3, 24, 32)).astype(np.float32))
    for ac in (False, True):
        for oh, ow in ((48, 64), (12, 16), (17, 23)):
            a = np.asarray(_resize_bilinear(x, oh, ow, ac))
            b = np.asarray(_resize_bilinear_gather(x, oh, ow, ac))
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5,
                                       err_msg=f"ac={ac} {oh}x{ow}")
