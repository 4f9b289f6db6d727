"""Space-to-depth reformulation of the DPT-Hybrid 7x7/2 stem conv
(C_in=3 convs run the MXU at ~0.3% — 2.7 ms fwd measured): exact
12-channel 4x4 stride-1 equivalent, as (a) an XLA conv and (b) an explicit
16-slice im2col matmul. Non-foldable losses (sum of sin) so the input-grad
is honest.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_stem2.py
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


def s2d_input(xpad):
    """[B,3,Hp,Wp] (Hp,Wp even) -> [B,12,Hp/2,Wp/2], channel=(c,rh,rw)."""
    B, C, Hp, Wp = xpad.shape
    x6 = xpad.reshape(B, C, Hp // 2, 2, Wp // 2, 2)
    return x6.transpose(0, 1, 3, 5, 2, 4).reshape(B, C * 4, Hp // 2, Wp // 2)


def s2d_weight(w):
    """[O,3,7,7] -> [O,12,4,4] exact stride-2 phase decomposition."""
    O, C, _, _ = w.shape
    wp = jnp.pad(w, ((0, 0), (0, 0), (0, 1), (0, 1)))          # 7 -> 8 taps
    w6 = wp.reshape(O, C, 4, 2, 4, 2)                           # (dqh,rh,dqw,rw)
    return w6.transpose(0, 1, 3, 5, 2, 4).reshape(O, C * 4, 4, 4)


def main():
    from sdpgs_tpu.models.bit import _same_pad, _ws_conv, _ws_weight
    from sdpgs_tpu.models.dpt import DPTArch, random_params

    arch = DPTArch.hybrid()
    pre = "dpt.embeddings.backbone.bit"
    raw = random_params(arch, seed=0)
    p = {k: jnp.asarray(v) for k, v in raw.items() if k.startswith(pre)}
    name = f"{pre}.embedder.convolution"
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 3, 384, 512)).astype(np.float32))

    def baseline(xx, p):
        return _ws_conv(p, name, xx, 7, 2)

    def s2d_conv(xx, p):
        w = s2d_weight(_ws_weight(p[f"{name}.weight"]))
        xpad = _same_pad(xx, 7, 2)
        xpad = jnp.pad(xpad, ((0, 0), (0, 0), (0, 1), (0, 1)))  # 389,517->390,518
        xs = s2d_input(xpad)                                     # [1,12,195,259]
        return jax.lax.conv_general_dilated(
            xs, w, (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))

    def s2d_matmul(xx, p):
        w = s2d_weight(_ws_weight(p[f"{name}.weight"]))          # [64,12,4,4]
        O = w.shape[0]
        wf = w.transpose(0, 2, 3, 1).reshape(O, 192)             # (dqh,dqw,c12)
        xpad = _same_pad(xx, 7, 2)
        xpad = jnp.pad(xpad, ((0, 0), (0, 0), (0, 1), (0, 1)))
        xs = s2d_input(xpad)
        Ho, Wo = 192, 256
        patches = jnp.concatenate(
            [xs[:, :, dh:dh + Ho, dw:dw + Wo] for dh in range(4) for dw in range(4)],
            axis=1,
        )                                                        # [1,192,Ho,Wo] (dh,dw,c12)
        return jnp.einsum("bkhw,ok->bohw", patches, wf)

    # parity
    with jax.default_matmul_precision("highest"):
        y0 = baseline(x, p)
        y1 = s2d_conv(x, p)
        y2 = s2d_matmul(x, p)
    print("s2d conv parity:", float(jnp.max(jnp.abs(y1 - y0))), flush=True)
    print("s2d matmul parity:", float(jnp.max(jnp.abs(y2 - y0))), flush=True)

    def fg(form):
        def body(eps, p):
            def loss(xx):
                with jax.default_matmul_precision("default"):
                    return jnp.sum(jnp.sin(form(xx, p)))
            return jnp.sum(jax.grad(loss)(x + eps))
        return body

    def fwd(form):
        def body(eps, p):
            with jax.default_matmul_precision("default"):
                return jnp.sum(jnp.sin(form(x + eps, p)))
        return body

    timed("stem conv fwd (baseline 7x7/2)", fwd(baseline), p)
    timed("stem conv fwd (s2d conv 12ch 4x4)", fwd(s2d_conv), p)
    timed("stem conv fwd (s2d im2col matmul)", fwd(s2d_matmul), p)
    timed("stem conv f/g (baseline 7x7/2)", fg(baseline), p)
    timed("stem conv f/g (s2d conv 12ch 4x4)", fg(s2d_conv), p)
    timed("stem conv f/g (s2d im2col matmul)", fg(s2d_matmul), p)


if __name__ == "__main__":
    main()
