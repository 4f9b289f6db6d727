"""Stem conv variants round 2: avoid the 6-D s2d transpose.
(a) phase split via 4 strided slices; (b) 49-tap strided patches + matmul;
(c) isolate the s2d transpose cost. Honest non-foldable losses.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_stem4.py
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
    from sdpgs_tpu.models.bit import _same_pad, _ws_conv, _ws_weight
    from sdpgs_tpu.models.dpt import DPTArch, random_params

    arch = DPTArch.hybrid()
    pre = "dpt.embeddings.backbone.bit"
    raw = random_params(arch, seed=0)
    p = {k: jnp.asarray(v) for k, v in raw.items()
         if k == f"{pre}.embedder.convolution.weight"}
    name = f"{pre}.embedder.convolution"
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 3, 384, 512)).astype(np.float32))
    Ho, Wo = 192, 256

    def baseline(xx, p):
        return _ws_conv(p, name, xx, 7, 2)

    def tap_patches(xx, p):
        """49 strided-read taps -> [1,147,Ho,Wo] -> [64,147] matmul."""
        w = _ws_weight(p[f"{name}.weight"])                      # [64,3,7,7]
        wf = w.transpose(0, 2, 3, 1).reshape(64, 147)            # (kh,kw,c)
        xpad = _same_pad(xx, 7, 2)                               # [1,3,389,517]
        taps = jnp.concatenate(
            [
                jax.lax.slice(
                    xpad, (0, 0, kh, kw),
                    (1, 3, kh + 2 * (Ho - 1) + 1, kw + 2 * (Wo - 1) + 1),
                    (1, 1, 2, 2),
                )
                for kh in range(7) for kw in range(7)
            ],
            axis=1,
        )                                                        # [1,147,Ho,Wo]
        with jax.default_matmul_precision("default"):
            return jnp.einsum("bkhw,ok->bohw", taps, wf)

    def phase_s2d(xx, p):
        """4 strided slices -> [1,12,.,.] -> XLA conv 4x4/1."""
        w0 = _ws_weight(p[f"{name}.weight"])
        wp = jnp.pad(w0, ((0, 0), (0, 0), (0, 1), (0, 1)))
        w6 = wp.reshape(64, 3, 4, 2, 4, 2)
        w = w6.transpose(0, 1, 3, 5, 2, 4).reshape(64, 12, 4, 4)
        xpad = _same_pad(xx, 7, 2)
        xpad = jnp.pad(xpad, ((0, 0), (0, 0), (0, 1), (0, 1)))   # 390x518
        phases = jnp.concatenate(
            [xpad[:, :, rh::2, rw::2] for rh in range(2) for rw in range(2)],
            axis=1,
        )
        # channel order here is (rh,rw,c) x4 blocks of 3; w expects (c,rh,rw)
        # -> reorder w instead (cheap, [64,12,4,4])
        wr = w.reshape(64, 3, 4, 4, 4)[:, :, :, :, :]            # (c,(rh,rw)) pairs
        wr = w.reshape(64, 3, 2, 2, 4, 4).transpose(0, 2, 3, 1, 4, 5).reshape(64, 12, 4, 4)
        with jax.default_matmul_precision("default"):
            return jax.lax.conv_general_dilated(
                phases, wr, (1, 1), "VALID",
                dimension_numbers=("NCHW", "OIHW", "NCHW"))

    with jax.default_matmul_precision("highest"):
        y0 = baseline(x, p)
        y1 = tap_patches(x, p)
        y2 = phase_s2d(x, p)
    print("tap-patches parity:", float(jnp.max(jnp.abs(y1 - y0))), flush=True)
    print("phase-s2d parity:", float(jnp.max(jnp.abs(y2 - y0))), flush=True)

    def fwd(form):
        def body(eps, p):
            with jax.default_matmul_precision("default"):
                return jnp.sum(jnp.sin(form(x + eps, p)))
        return body

    def fg(form):
        def body(eps, p):
            def loss(xx):
                with jax.default_matmul_precision("default"):
                    return jnp.sum(jnp.sin(form(xx, p)))
            return jnp.sum(jax.grad(loss)(x + eps))
        return body

    timed("fwd baseline", fwd(baseline), p)
    timed("fwd tap-patches matmul", fwd(tap_patches), p)
    timed("fwd phase-s2d conv", fwd(phase_s2d), p)
    timed("f/g baseline", fg(baseline), p)
    timed("f/g tap-patches matmul", fg(tap_patches), p)
    timed("f/g phase-s2d conv", fg(phase_s2d), p)


if __name__ == "__main__":
    main()
