"""Separable image resize as banded matmuls (TPU-first).

The reference resizes the depth-net input/output with torch's bicubic
interpolation (reference utils/depth_utils.py:33-44, ``F.interpolate(...,
mode="bicubic", align_corners=False)``). Gather-based resampling lowers
poorly on TPU; a fixed-size resize is a *linear* map per axis, so we build
the [n_out, n_in] interpolation matrix once at trace time (numpy, static
shapes) and run the resize as two dense matmuls that ride the MXU:

    out = A_y @ img @ A_x^T

Weight conventions match torch exactly (upsampling.h / UpSampleBicubic2d):
- bicubic: Keys kernel with a = -0.75, 4 taps, access indices clamped to the
  border (no antialias — torch applies none for these calls either);
- bilinear: 2 taps, source coordinate clamped to >= 0 for
  align_corners=False (area_pixel_compute_source_index);
- align_corners True/False both supported.

``phase`` slicing of the output rows (``A[off::stride]``) gives the
phase-split resize used to feed space-to-depth convolutions without any
strided data movement (the strided reads/writes were measured as the entire
cost of every stem-conv reformulation — docs/ROADMAP.md "Stem-conv").
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


def _cubic_weight(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys cubic convolution kernel, torch's a=-0.75 convention."""
    t = np.abs(t)
    w = np.where(
        t <= 1.0,
        (a + 2.0) * t**3 - (a + 3.0) * t**2 + 1.0,
        np.where(t < 2.0, a * (t**3 - 5.0 * t**2 + 8.0 * t - 4.0), 0.0),
    )
    return w


@functools.lru_cache(maxsize=None)
def resize_matrix(
    n_in: int, n_out: int, method: str = "bicubic", align_corners: bool = False
) -> np.ndarray:
    """[n_out, n_in] interpolation matrix matching
    ``torch.nn.functional.interpolate`` along one axis (f32)."""
    if n_in == n_out:
        return np.eye(n_out, dtype=np.float32)
    i = np.arange(n_out, dtype=np.float64)
    if align_corners and n_out > 1:
        src = i * (n_in - 1) / (n_out - 1)
    else:
        src = (i + 0.5) * (n_in / n_out) - 0.5
        if method == "bilinear":
            # torch's area_pixel_compute_source_index clamps to >= 0 for
            # half-pixel centers (bicubic keeps the raw coordinate and
            # relies on index clamping instead).
            src = np.maximum(src, 0.0)

    A = np.zeros((n_out, n_in), dtype=np.float64)
    x0 = np.floor(src).astype(np.int64)
    frac = src - x0
    if method == "bicubic":
        taps = [(-1, _cubic_weight(1.0 + frac)), (0, _cubic_weight(frac)),
                (1, _cubic_weight(1.0 - frac)), (2, _cubic_weight(2.0 - frac))]
    elif method == "bilinear":
        taps = [(0, 1.0 - frac), (1, frac)]
    else:
        raise ValueError(f"unknown resize method {method!r}")
    rows = np.arange(n_out)
    for off, w in taps:
        cols = np.clip(x0 + off, 0, n_in - 1)
        np.add.at(A, (rows, cols), w)
    return A.astype(np.float32)


def resize2d(
    x: jnp.ndarray,
    out_h: int,
    out_w: int,
    method: str = "bicubic",
    align_corners: bool = False,
) -> jnp.ndarray:
    """Resize the trailing two axes of ``x`` ([..., H, W]) with torch-parity
    weights. Linear (matmul) -> exact gradients for free; runs on the MXU."""
    H, W = x.shape[-2], x.shape[-1]
    Ay = jnp.asarray(resize_matrix(H, out_h, method, align_corners), x.dtype)
    Ax = jnp.asarray(resize_matrix(W, out_w, method, align_corners), x.dtype)
    lead = x.shape[:-2]
    xf = x.reshape((-1, H, W))
    out = jnp.einsum("oh,bhw,pw->bop", Ay, xf, Ax,
                     preferred_element_type=x.dtype)
    return out.reshape(lead + (out_h, out_w))


def resize2d_stem_phases(
    x: jnp.ndarray,
    out_h: int,
    out_w: int,
    method: str = "bicubic",
    align_corners: bool = False,
) -> jnp.ndarray:
    """Phase tensors feeding a 7x7 stride-2 TF-SAME conv applied to the
    *resized* image, with the resize and the space-to-depth fused into the
    interpolation matrices (zero strided data movement).

    Returns ``[..., 2, 2, out_h//2 + 3, out_w//2 + 3]`` where phase
    ``(py, px)`` row ``j`` equals resized-image row ``2*j + py - 2`` (rows
    outside ``[0, out_h)`` are zeros — exactly the conv's TF-SAME zero
    padding of (2, 3) for even sizes). A 4x4 stride-1 VALID conv over the
    ``4*C``-channel phase tensor with the kernel from
    :func:`sdpgs_tpu.models.bit.stem_phase_kernel` reproduces the original
    strided conv bit-for-bit in exact arithmetic.

    Motivation: every direct reformulation of the 7x7/2 C_in=3 stem conv
    (space-to-depth via reshape-transpose, strided-slice im2col) pays ~3-4 ms
    in strided reads on v5e (docs/ROADMAP.md "Stem-conv"); row-selecting the
    resize matrices moves the same data for free."""
    assert out_h % 2 == 0 and out_w % 2 == 0, (out_h, out_w)
    H, W = x.shape[-2], x.shape[-1]
    Ay = resize_matrix(H, out_h, method, align_corners)
    Ax = resize_matrix(W, out_w, method, align_corners)
    hp, wp = out_h // 2 + 3, out_w // 2 + 3

    def phase_rows(A, n_out, n_ph, p):
        out = np.zeros((n_ph, A.shape[1]), np.float32)
        pos = 2 * np.arange(n_ph) + p - 2
        ok = (pos >= 0) & (pos < n_out)
        out[ok] = A[pos[ok]]
        return out

    lead = x.shape[:-2]
    xf = x.reshape((-1, H, W))
    rows = []
    for py in range(2):
        Ayp = jnp.asarray(phase_rows(Ay, out_h, hp, py), x.dtype)
        col = []
        for px in range(2):
            Axp = jnp.asarray(phase_rows(Ax, out_w, wp, px), x.dtype)
            col.append(jnp.einsum("oh,bhw,pw->bop", Ayp, xf, Axp,
                                  preferred_element_type=x.dtype))
        rows.append(jnp.stack(col, axis=1))
    out = jnp.stack(rows, axis=1)
    return out.reshape(lead + (2, 2, hp, wp))


def resize2d_phases(
    x: jnp.ndarray,
    out_h: int,
    out_w: int,
    stride: int,
    method: str = "bicubic",
    align_corners: bool = False,
) -> jnp.ndarray:
    """Resize and space-to-depth in one step: returns
    ``[..., stride, stride, out_h // stride, out_w // stride]`` where
    ``[..., py, px, :, :]`` equals ``resize2d(x)[..., py::stride, px::stride]``.

    The phase split happens by *row selection of the resize matrices*, so no
    strided reads/writes ever materialize — each phase is its own dense
    matmul pair. Feeding a stride-s convolution with these phases turns it
    into a dense stride-1 conv over ``stride**2 * C`` channels."""
    assert out_h % stride == 0 and out_w % stride == 0, (out_h, out_w, stride)
    H, W = x.shape[-2], x.shape[-1]
    Ay = resize_matrix(H, out_h, method, align_corners)
    Ax = resize_matrix(W, out_w, method, align_corners)
    lead = x.shape[:-2]
    xf = x.reshape((-1, H, W))
    phases = []
    for py in range(stride):
        row = []
        for px in range(stride):
            Ayp = jnp.asarray(Ay[py::stride], x.dtype)
            Axp = jnp.asarray(Ax[px::stride], x.dtype)
            row.append(jnp.einsum("oh,bhw,pw->bop", Ayp, xf, Axp,
                                  preferred_element_type=x.dtype))
        phases.append(jnp.stack(row, axis=1))
    out = jnp.stack(phases, axis=1)  # [B, sy, sx, oh/s, ow/s]
    return out.reshape(lead + (stride, stride, out_h // stride, out_w // stride))
