"""DPT-Hybrid stem op-level split: 7x7/2 WS-conv, GroupNorm, maxpool —
fwd+input-grad each, plus both maxpool VJP variants (select_and_scatter
vs equality-mask) and a channels-padded conv variant.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_stem.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

N = 10


def timed(name, body, *args):
    def loop(eps, *a):
        def it(i, eps):
            return body(eps, *a) * 0.0 + eps
        return jax.lax.fori_loop(0, N, it, eps)

    fn = jax.jit(loop)
    out = fn(jnp.float32(0.0), *args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(out, *args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / N
    print(f"{name:46s} {dt*1000:7.2f} ms", flush=True)
    return dt


def main():
    from sdpgs_tpu.models.bit import (
        _gn, _maxpool_valid, _same_pad, _ws_conv,
    )
    from sdpgs_tpu.models.dpt import DPTArch, random_params

    arch = DPTArch.hybrid()
    pre = "dpt.embeddings.backbone.bit"
    raw = random_params(arch, seed=0)
    p = {k: jnp.asarray(v) for k, v in raw.items() if k.startswith(pre)}
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 3, 384, 512)).astype(np.float32))
    # stem conv output for the GN/pool pieces
    y0 = jax.block_until_ready(
        _ws_conv(p, f"{pre}.embedder.convolution", x, 7, 2))
    y1 = jax.block_until_ready(jax.nn.relu(y0))

    def conv_fg(eps, p):
        def f(xx):
            with jax.default_matmul_precision("default"):
                return jnp.sum(_ws_conv(p, f"{pre}.embedder.convolution", xx, 7, 2))
        return jnp.sum(jax.grad(f)(x + eps))

    def gn_fg(eps, p):
        def f(yy):
            return jnp.sum(_gn(p, f"{pre}.embedder.norm", yy, 32))
        return jnp.sum(jax.grad(f)(y0 + eps))

    def pool_eq_fg(eps):
        def f(yy):
            return jnp.sum(_maxpool_valid(_same_pad(yy, 3, 2, value=-jnp.inf), 3, 2))
        return jnp.sum(jax.grad(f)(y1 + eps))

    def pool_sas_fg(eps):
        def f(yy):
            yp = _same_pad(yy, 3, 2, value=0.0)
            return jnp.sum(jax.lax.reduce_window(
                yp, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2), "VALID"))
        return jnp.sum(jax.grad(f)(y1 + eps))

    timed("stem conv 7x7/2 f/g", conv_fg, p)
    timed("stem GN f/g", gn_fg, p)
    timed("maxpool f/g (equality-mask vjp)", pool_eq_fg)
    timed("maxpool f/g (select_and_scatter)", pool_sas_fg)

    # conv fwd only
    def conv_f(eps, p):
        with jax.default_matmul_precision("default"):
            return jnp.sum(_ws_conv(p, f"{pre}.embedder.convolution", x + eps, 7, 2))

    timed("stem conv 7x7/2 fwd", conv_f, p)

    # space-to-depth conv variant: pad 3->4 channels? instead reformulate the
    # input grad explicitly as one [3, 3136] x [3136, HW] matmul
    w = p[f"{pre}.embedder.convolution.weight"]  # [64, 3, 7, 7]

    def conv_fg_manual(eps, p):
        # fwd: standard conv; bwd for x: einsum with output-major layout
        w0 = p[f"{pre}.embedder.convolution.weight"]
        from sdpgs_tpu.models.bit import _ws_weight
        ww = _ws_weight(w0)

        @jax.custom_vjp
        def conv(xx):
            xp = _same_pad(xx, 7, 2)
            return jax.lax.conv_general_dilated(
                xp, ww, (2, 2), "VALID",
                dimension_numbers=("NCHW", "OIHW", "NCHW"))

        def fwd(xx):
            return conv(xx), xx

        def bwd(xx, g):
            # d_x = conv_transpose(g, w): express as [Cin, Cout*k*k] x
            # [Cout*k*k, Hp*Wp] so the huge dim rides the MXU lanes
            xp_shape = _same_pad(xx, 7, 2).shape
            Hp, Wp = xp_shape[-2:]
            B = xx.shape[0]
            # scatter g into the strided grid via conv_transpose with
            # identity? use lax.conv_transpose on NCHW directly:
            gx = jax.lax.conv_transpose(
                g, ww, (2, 2), "VALID",
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                transpose_kernel=True,
            )
            # crop the SAME padding
            ph = Hp - 384
            pw = Wp - 512
            gx = gx[:, :, ph // 2: ph // 2 + 384, pw // 2: pw // 2 + 512]
            return (gx,)

        conv.defvjp(fwd, bwd)
        with jax.default_matmul_precision("default"):
            return jnp.sum(jax.grad(lambda xx: jnp.sum(conv(xx)))(x + eps))

    timed("stem conv f/g (explicit conv_transpose)", conv_fg_manual, p)


if __name__ == "__main__":
    main()
