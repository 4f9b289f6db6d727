"""LPIPS-VGG port equivalence vs a direct torch mirror with random weights
(no pretrained download; validates conv/pool/normalize/head wiring and the
tools/convert_lpips.py weight layout)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from sdpgs_tpu.models.lpips import _SCALE, _SHIFT, VGG16_STAGES, LPIPS


def random_lpips_params(rng, stages=VGG16_STAGES):
    params = {}
    in_ch = 3
    for s, (ch, n_convs) in enumerate(stages):
        for i in range(n_convs):
            params[f"conv{s}_{i}_w"] = rng.normal(
                0, 0.05, size=(ch, in_ch, 3, 3)).astype(np.float32)
            params[f"conv{s}_{i}_b"] = rng.normal(0, 0.01, size=(ch,)).astype(np.float32)
            in_ch = ch
        params[f"lin{s}_w"] = rng.uniform(
            0, 0.1, size=(1, ch, 1, 1)).astype(np.float32)
    return params


def torch_lpips(params, img1, img2, stages=VGG16_STAGES):
    import torch.nn.functional as F

    def feats(x):
        x = torch.from_numpy(x)[None] * 2.0 - 1.0
        shift = torch.from_numpy(_SHIFT)[None, :, None, None]
        scale = torch.from_numpy(_SCALE)[None, :, None, None]
        h = (x - shift) / scale
        out = []
        for s, (ch, n_convs) in enumerate(stages):
            for i in range(n_convs):
                h = F.conv2d(h, torch.from_numpy(params[f"conv{s}_{i}_w"]),
                             torch.from_numpy(params[f"conv{s}_{i}_b"]), padding=1)
                h = F.relu(h)
            out.append(h)
            if s < len(stages) - 1:
                h = F.max_pool2d(h, 2)
        return out

    total = 0.0
    for s, (a, b) in enumerate(zip(feats(img1), feats(img2))):
        a = a / torch.sqrt((a * a).sum(1, keepdim=True) + 1e-10)
        b = b / torch.sqrt((b * b).sum(1, keepdim=True) + 1e-10)
        diff = (a - b) ** 2
        w = torch.from_numpy(params[f"lin{s}_w"])
        total = total + (diff * w).sum(1).mean()
    return float(total)


def test_lpips_matches_torch_mirror():
    # tiny VGG (same shape family) keeps the CPU test fast
    stages = [(8, 2), (16, 2), (16, 3)]
    rng = np.random.default_rng(0)
    params = random_lpips_params(rng, stages)
    img1 = rng.uniform(size=(3, 32, 32)).astype(np.float32)
    img2 = rng.uniform(size=(3, 32, 32)).astype(np.float32)

    import sdpgs_tpu.models.lpips as L

    model = LPIPS(params)
    # run the jax side with the tiny stage layout
    orig = L.VGG16_STAGES
    L.VGG16_STAGES = stages
    try:
        ours = float(model(img1, img2))
        zero = float(model(img1, img1))
    finally:
        L.VGG16_STAGES = orig
    ref = torch_lpips(params, img1, img2, stages)
    assert ours == pytest.approx(ref, rel=1e-4), (ours, ref)
    assert zero == pytest.approx(0.0, abs=1e-6)
