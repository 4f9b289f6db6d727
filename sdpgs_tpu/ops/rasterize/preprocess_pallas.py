"""Fused Pallas preprocess + SH color (forward AND backward kernels).

The XLA preprocess (preprocess.py:preprocess_fused + core/sh.eval_sh) is
~100 elementwise [P] passes; XLA schedules them as many short VPU loops with
materialized intermediates — measured 1.24 ms forward at 131k capacity
(~30x its ~0.04 ms bandwidth floor, docs/SOL.md) and it runs TWICE per
pseudo step (train + pseudo render). Here the whole chain — world->view,
projection, quaternion->cov3D->EWA->conic->radius, culling, SH degree 0..3
with the +0.5 clamp — runs as ONE VMEM-resident pass per 32k-Gaussian
block, rows reshaped [rows, 8, P/8] so every op covers the full 8x128 VPU
footprint (a 1-D [N] vector occupies one sublane = 1/8 throughput).

The backward is a SECOND Pallas kernel whose body simply calls
``jax.vjp(_row_math, ...)`` on the VMEM-resident rows: JAX traces the exact
cotangent chain into the same fused kernel (no hand-derived gradients —
the reference hand-writes ~250 lines of this in backward.cu:144-396), so
the backward is as fused as the forward and needs no saved residuals
beyond the primal inputs.

Math parity: identical formulas to preprocess_fused (forward.cu:74-256)
and eval_sh; `_row_math` is shared verbatim between the kernels, the XLA
fallback, and the tests' golden path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sdpgs_tpu.core import sh as sh_lib
from sdpgs_tpu.ops.rasterize.preprocess import Preprocessed, ndc_to_pixel

NGEO = 11    # x y z sx sy sz qw qx qy qz alive
NOUT = 11    # validf mx my depth conic_a conic_b conic_c radius r g b
CAMN = 39    # view(16) full_proj(16) focal_x focal_y tan_fovx tan_fovy pos(3)


def _row_math(geo, sh, cam, *, deg: int, width: int, height: int,
              near: float, low_pass: float):
    """The full preprocess+SH chain on [.., N]-lane rows.

    geo: [NGEO, N]; sh: [3*(deg+1)^2, N]; cam: [CAMN] (or a list of
    scalars). Returns a tuple of NOUT [N] rows. Pure jnp — runs identically
    inside the Pallas kernels (on VMEM blocks), in the XLA fallback, and
    under jax.vjp for the backward kernel."""
    x, y, z = geo[0], geo[1], geo[2]
    s0, s1, s2 = geo[3], geo[4], geo[5]
    r, qx, qy, qz = geo[6], geo[7], geo[8], geo[9]
    alive = geo[10]
    V = [cam[i] for i in range(16)]           # row-major view
    FP = [cam[16 + i] for i in range(16)]
    fx, fy = cam[32], cam[33]
    tan_fovx, tan_fovy = cam[34], cam[35]
    cpx, cpy, cpz = cam[36], cam[37], cam[38]

    tx = V[0] * x + V[1] * y + V[2] * z + V[3]
    ty = V[4] * x + V[5] * y + V[6] * z + V[7]
    tz = V[8] * x + V[9] * y + V[10] * z + V[11]
    depth = tz

    hx = FP[0] * x + FP[1] * y + FP[2] * z + FP[3]
    hy = FP[4] * x + FP[5] * y + FP[6] * z + FP[7]
    hw = FP[12] * x + FP[13] * y + FP[14] * z + FP[15]
    inv_w = 1.0 / (hw + 1e-7)
    mx = ndc_to_pixel(hx * inv_w, width)
    my = ndc_to_pixel(hy * inv_w, height)

    R00 = 1 - 2 * (qy * qy + qz * qz)
    R01 = 2 * (qx * qy - r * qz)
    R02 = 2 * (qx * qz + r * qy)
    R10 = 2 * (qx * qy + r * qz)
    R11 = 1 - 2 * (qx * qx + qz * qz)
    R12 = 2 * (qy * qz - r * qx)
    R20 = 2 * (qx * qz - r * qy)
    R21 = 2 * (qy * qz + r * qx)
    R22 = 1 - 2 * (qx * qx + qy * qy)

    def wrow(i):
        return (
            V[4 * i + 0] * R00 + V[4 * i + 1] * R10 + V[4 * i + 2] * R20,
            V[4 * i + 0] * R01 + V[4 * i + 1] * R11 + V[4 * i + 2] * R21,
            V[4 * i + 0] * R02 + V[4 * i + 1] * R12 + V[4 * i + 2] * R22,
        )

    A00, A01, A02 = wrow(0)
    A10, A11, A12 = wrow(1)
    A20, A21, A22 = wrow(2)
    A00, A01, A02 = A00 * s0, A01 * s1, A02 * s2
    A10, A11, A12 = A10 * s0, A11 * s1, A12 * s2
    A20, A21, A22 = A20 * s0, A21 * s1, A22 * s2

    lim_x = 1.3 * tan_fovx
    lim_y = 1.3 * tan_fovy
    tz_safe = jnp.where(jnp.abs(tz) < 1e-6, 1e-6, tz)
    cx = jnp.clip(tx / tz_safe, -lim_x, lim_x) * tz_safe
    cy = jnp.clip(ty / tz_safe, -lim_y, lim_y) * tz_safe
    j00 = fx / tz_safe
    j02 = -(fx * cx) / (tz_safe * tz_safe)
    j11 = fy / tz_safe
    j12 = -(fy * cy) / (tz_safe * tz_safe)
    m00 = j00 * A00 + j02 * A20
    m01 = j00 * A01 + j02 * A21
    m02 = j00 * A02 + j02 * A22
    m10 = j11 * A10 + j12 * A20
    m11 = j11 * A11 + j12 * A21
    m12 = j11 * A12 + j12 * A22

    a = m00 * m00 + m01 * m01 + m02 * m02 + low_pass
    b = m00 * m10 + m01 * m11 + m02 * m12
    c = m10 * m10 + m11 * m11 + m12 * m12 + low_pass

    det = a * c - b * b
    det_safe = jnp.where(det == 0.0, 1.0, det)
    inv_det = 1.0 / det_safe
    ca, cb, cc = c * inv_det, -b * inv_det, a * inv_det

    mid = 0.5 * (a + c)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(mid + disc, 0.0)))

    validf = jnp.where(
        (depth > near) & (det != 0.0) & (radius > 0.0) & (alive > 0.0)
        & jnp.isfinite(depth),
        1.0, 0.0,
    )
    radius = radius * validf

    # SH color at the normalized view direction (colors_from_sh,
    # reference gaussian_renderer/__init__.py:269-274)
    dx, dy_, dz = x - cpx, y - cpy, z - cpz
    inv_n = jax.lax.rsqrt(dx * dx + dy_ * dy_ + dz * dz + 1e-24)
    dx, dy_, dz = dx * inv_n, dy_ * inv_n, dz * inv_n

    def coef(k, ch):
        return sh[3 * k + ch]

    rgb = []
    for ch in range(3):
        res = sh_lib.C0 * coef(0, ch)
        if deg > 0:
            res = (
                res - sh_lib.C1 * dy_ * coef(1, ch)
                + sh_lib.C1 * dz * coef(2, ch)
                - sh_lib.C1 * dx * coef(3, ch)
            )
            if deg > 1:
                xx, yy, zz = dx * dx, dy_ * dy_, dz * dz
                xy, yz2, xz = dx * dy_, dy_ * dz, dx * dz
                C2 = sh_lib.C2
                res = (
                    res
                    + C2[0] * xy * coef(4, ch)
                    + C2[1] * yz2 * coef(5, ch)
                    + C2[2] * (2.0 * zz - xx - yy) * coef(6, ch)
                    + C2[3] * xz * coef(7, ch)
                    + C2[4] * (xx - yy) * coef(8, ch)
                )
                if deg > 2:
                    C3 = sh_lib.C3
                    res = (
                        res
                        + C3[0] * dy_ * (3.0 * xx - yy) * coef(9, ch)
                        + C3[1] * xy * dz * coef(10, ch)
                        + C3[2] * dy_ * (4.0 * zz - xx - yy) * coef(11, ch)
                        + C3[3] * dz * (2.0 * zz - 3.0 * xx - 3.0 * yy) * coef(12, ch)
                        + C3[4] * dx * (4.0 * zz - xx - yy) * coef(13, ch)
                        + C3[5] * dz * (xx - yy) * coef(14, ch)
                        + C3[6] * dx * (xx - 3.0 * yy) * coef(15, ch)
                    )
        rgb.append(jnp.maximum(res + 0.5, 0.0))

    return (validf, mx, my, depth, ca, cb, cc, radius,
            rgb[0], rgb[1], rgb[2])


def _fwd_kernel(cam_ref, geo_ref, sh_ref, out_ref, **kw):
    cam = [cam_ref[i] for i in range(CAMN)]
    rows = _row_math(geo_ref[...], sh_ref[...], cam, **kw)
    for i, row in enumerate(rows):
        out_ref[i, :] = row


def _bwd_kernel(cam_ref, geo_ref, sh_ref, ct_ref, dgeo_ref, dsh_ref, **kw):
    cam = [cam_ref[i] for i in range(CAMN)]
    _, vjp = jax.vjp(
        lambda g, s: _row_math(g, s, cam, **kw), geo_ref[...], sh_ref[...]
    )
    ct = tuple(ct_ref[i, :] for i in range(NOUT))
    dg, ds = vjp(ct)
    dgeo_ref[...] = dg
    dsh_ref[...] = ds


def _block(P: int) -> int:
    # lane-block of the [*, 8, P//8] layout (see _make_calls): 8 * _block
    # Gaussians per grid step. Mosaic stack-allocates a fraction of the
    # long unrolled elementwise chain's temporaries at once (measured
    # 26.5M scoped at 16k-Gaussian blocks), hence the raised vmem limit.
    return min(P // 8, 4096)


@functools.lru_cache(maxsize=None)
def _make_calls(P: int, nsh: int, deg: int, width: int, height: int,
                near: float, low_pass: float, interpret: bool):
    """Rows ride as [rows, 8, P//8]: a 1-D [Pb] lane vector occupies ONE
    sublane (1/8 VPU throughput — measured 1.46 ms vs XLA 1.17); the free
    row-major reshape spreads every row over the full 8x128 VPU footprint
    (grid blocks [rows, 8, L])."""
    P8 = P // 8
    L = _block(P)
    kw = dict(deg=deg, width=width, height=height, near=near,
              low_pass=low_pass)
    grid = (P8 // L,)
    cam_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    geo_spec = pl.BlockSpec((NGEO, 8, L), lambda b: (0, 0, b),
                            memory_space=pltpu.VMEM)
    sh_spec = pl.BlockSpec((nsh, 8, L), lambda b: (0, 0, b),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((NOUT, 8, L), lambda b: (0, 0, b),
                            memory_space=pltpu.VMEM)
    cp = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    fwd = pl.pallas_call(
        functools.partial(_fwd_kernel, **kw),
        grid=grid,
        in_specs=[cam_spec, geo_spec, sh_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((NOUT, 8, P8), jnp.float32),
        interpret=interpret,
        compiler_params=cp,
    )
    bwd = pl.pallas_call(
        functools.partial(_bwd_kernel, **kw),
        grid=grid,
        in_specs=[cam_spec, geo_spec, sh_spec, out_spec],
        out_specs=[geo_spec, sh_spec],
        out_shape=[
            jax.ShapeDtypeStruct((NGEO, 8, P8), jnp.float32),
            jax.ShapeDtypeStruct((nsh, 8, P8), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=cp,
    )
    return fwd, bwd


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _pp_rows(geoT, shT, cam_vec, deg, width, height, near_lp, interpret):
    P = geoT.shape[1]
    fwd, _ = _make_calls(P, shT.shape[0], deg, width, height,
                         near_lp[0], near_lp[1], interpret)
    out = fwd(cam_vec, geoT.reshape(NGEO, 8, P // 8),
              shT.reshape(shT.shape[0], 8, P // 8))
    return out.reshape(NOUT, P)


def _pp_rows_fwd(geoT, shT, cam_vec, deg, width, height, near_lp, interpret):
    out = _pp_rows(geoT, shT, cam_vec, deg, width, height, near_lp, interpret)
    return out, (geoT, shT, cam_vec)


def _pp_rows_bwd(deg, width, height, near_lp, interpret, res, ct):
    geoT, shT, cam_vec = res
    P = geoT.shape[1]
    nsh = shT.shape[0]
    _, bwd = _make_calls(P, nsh, deg, width, height,
                         near_lp[0], near_lp[1], interpret)
    dgeo, dsh = bwd(cam_vec, geoT.reshape(NGEO, 8, P // 8),
                    shT.reshape(nsh, 8, P // 8),
                    ct.reshape(NOUT, 8, P // 8))
    dgeo = dgeo.reshape(NGEO, P)
    dsh = dsh.reshape(nsh, P)
    # camera is not a training variable; its cotangent is structurally unused
    return dgeo, dsh, jnp.zeros_like(cam_vec)


_pp_rows.defvjp(_pp_rows_fwd, _pp_rows_bwd)


def _cam_vec(cam) -> jnp.ndarray:
    return jnp.concatenate([
        jnp.asarray(cam.view, jnp.float32).reshape(-1),
        jnp.asarray(cam.full_proj, jnp.float32).reshape(-1),
        jnp.stack([
            jnp.asarray(cam.focal_x, jnp.float32),
            jnp.asarray(cam.focal_y, jnp.float32),
            jnp.asarray(cam.tan_fovx, jnp.float32),
            jnp.asarray(cam.tan_fovy, jnp.float32),
        ]),
        jnp.asarray(cam.cam_pos, jnp.float32).reshape(3),
    ])


def preprocess_color_applicable(P: int, cfg) -> bool:
    return (
        cfg.use_pallas
        and (jax.default_backend() == "tpu" or cfg.interpret_kernels)
        and P % 128 == 0
        and (P // 8) % _block(P) == 0
    )


def preprocess_color_pallas(
    xyz: jnp.ndarray,          # [P, 3]
    scale: jnp.ndarray,        # [P, 3] activated
    quat: jnp.ndarray,         # [P, 4] normalized
    features: jnp.ndarray,     # [P, K>=
                               #  (deg+1)^2, 3] SH coefficients
    alive: jnp.ndarray,        # [P] float mask
    cam,
    sh_degree: int,
    near: float = 0.2,
    low_pass: float = 0.3,
    interpret: bool = False,
) -> tuple[Preprocessed, jnp.ndarray]:
    """Fused preprocess + SH color; gradient-exact via the paired backward
    kernel (jax.vjp of the same row math). Returns (Preprocessed,
    color [P, 3])."""
    P = xyz.shape[0]
    K = (sh_degree + 1) ** 2
    geoT = jnp.concatenate([
        xyz.T, scale.T, quat.T,
        alive.astype(jnp.float32).reshape(1, P),
    ], axis=0)                                         # [NGEO, P]
    shT = (
        features[:, :K, :].reshape(P, K * 3).T
    )                                                  # [3K, P]
    out = _pp_rows(
        geoT, shT, _cam_vec(cam), sh_degree, int(cam.width),
        int(cam.height), (float(near), float(low_pass)), interpret,
    )
    prep = Preprocessed(
        valid=out[0] > 0.0,
        mean2d=jnp.stack([out[1], out[2]], axis=-1),
        depth=out[3],
        conic=jnp.stack([out[4], out[5], out[6]], axis=-1),
        radius=out[7],
    )
    color = jnp.stack([out[8], out[9], out[10]], axis=-1)
    return prep, color
