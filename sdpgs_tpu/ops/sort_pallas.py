"""Pallas TPU bitonic sort for the binning depth sort — EXPERIMENTAL, not
wired into production (see status below).

STATUS (r4): correctness is proven — bit-exact vs stable ``lax.sort``
including ties and inf keys (tests/test_sort_pallas.py, interpret mode) —
but the kernel is impractical on hardware TODAY: the 153-pass network
makes Mosaic's compiler take 15-30+ minutes (one run OOM-killed the
compile helper), and its worst pass materializes ~25M of select
temporaries (needs vmem_limit_bytes raised above the 16M default).
A multi-pallas_call variant (one small kernel per pass family) compiles
fast but pays ~66 kernel dispatches x 4.5MB HBM round trips ~ 1-2 ms,
which does not beat the 1.55 ms ``lax.sort`` it targets. Kept as a
documented, tested starting point; revisit if Mosaic gains a fori-able
exchange primitive or kernel-level compile caching lands.

Replaces ``jax.lax.sort((depth, packed, gid), num_keys=1, is_stable=True)``
(binning stage 1 — the only sort in the pipeline; the CUDA reference radix-
sorts duplicated 64-bit keys instead, rasterizer_impl.cu:231-240). XLA's
variadic sort costs ~1.55 ms at the 131k bench capacity and runs once per
render (twice per pseudo step); the whole working set is 1.5 MB — a
VMEM-resident bitonic network is bandwidth-free and VPU-bound.

Layout: the [N] arrays live as [R, 128] (row-major flat index
``i = r*128 + l``). A bitonic stage ``k`` (block 2^k) runs passes with
partner distance d = 2^j, j = k-1..0:

- d >= 128: partners differ in ROW -> reshape [A, 2, dr, 128] sublane
  slices, compare top/bot, select (no data movement beyond the selects);
- d < 128: partners differ within LANES -> transpose 128x128 tiles so the
  lane coordinate sits on sublanes, run the same sublane-form passes, and
  transpose back. Stages 1..7 are entirely lane-local and share ONE
  transposed region; stages k >= 8 pay one transpose pair each (~11 pairs
  total, MXU-cheap).

Exactness: the comparator key is the composite (key, gid) — strict order
with gid tie-break. When the caller passes ``gid = arange(N)`` (the binning
call site does), this reproduces ``lax.sort``'s STABLE tie order
bit-exactly, inf keys included (dead slots: key=inf, ordered by gid).

Gating: N a power of two with N >= 2^14 (the transpose tiles need
R >= 128) and N <= 2^19 (three live [R, 128] arrays plus select temps must
fit the 16 MB scoped-VMEM budget); larger capacities keep lax.sort.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L = 128


def _comparator(kt, kb, gt, gb):
    """True where top sorts strictly before bottom ((key, gid) composite)."""
    return (kt < kb) | ((kt == kb) & (gt < gb))


def _exchange(kt, kb, pt, pb, gt, gb, asc):
    lt = _comparator(kt, kb, gt, gb)
    # keep(top) = lt if ascending else !lt == (lt XNOR asc); select-on-i1
    # vectors is unsupported by Mosaic ("Unsupported target bitwidth for
    # truncation"), the xor form never materializes a bool select
    keep = jnp.logical_not(jnp.logical_xor(lt, asc))
    sel = lambda a, b: (jnp.where(keep, a, b), jnp.where(keep, b, a))
    (kt, kb), (pt, pb), (gt, gb) = sel(kt, kb), sel(pt, pb), sel(gt, gb)
    return kt, kb, pt, pb, gt, gb


def _row_pass(k, p, g, R, kk, j):
    """Partner distance 2^j >= 128: rows r and r ^ 2^(j-7)."""
    dr = 1 << (j - 7)
    A = R // (2 * dr)

    def split(x):
        x4 = x.reshape(A, 2, dr, L)
        return x4[:, 0], x4[:, 1]

    kt, kb = split(k)
    pt, pb = split(p)
    gt, gb = split(g)
    # ascending iff bit kk of the flat index is 0; kk >= 8 here so the bit
    # lives in the row: top rows are r = a*2*dr + b
    a_io = jax.lax.broadcasted_iota(jnp.int32, (A, dr, 1), 0)
    b_io = jax.lax.broadcasted_iota(jnp.int32, (A, dr, 1), 1)
    r_top = a_io * (2 * dr) + b_io
    asc = ((r_top >> (kk - 7)) & 1) == 0
    kt, kb, pt, pb, gt, gb = _exchange(kt, kb, pt, pb, gt, gb, asc)

    def join(t, b):
        return jnp.stack([t, b], axis=1).reshape(R, L)

    return join(kt, kb), join(pt, pb), join(gt, gb)


def _lane_pass_t(k, p, g, R, stage_k, j):
    """One pass with distance < 128, in the transposed layout (arrays are
    [R, 128] holding [T8, lane, row'] flattened — original lane coordinate
    on sublanes, so the exchange is sublane-form)."""
    T8 = R // L
    dr = 1 << j
    A = L // (2 * dr)

    def split(x):
        x5 = x.reshape(T8, A, 2, dr, L)
        return x5[:, :, 0], x5[:, :, 1]

    kt, kb = split(k)
    pt, pb = split(p)
    gt, gb = split(g)
    if stage_k <= 6:
        # direction bit lives in the original lane coordinate (dims 1/2)
        a_io = jax.lax.broadcasted_iota(jnp.int32, (1, A, dr, 1), 1)
        b_io = jax.lax.broadcasted_iota(jnp.int32, (1, A, dr, 1), 2)
        l_top = a_io * (2 * dr) + b_io
        asc = ((l_top >> stage_k) & 1) == 0
    else:
        # direction bit lives in the global row t*128 + r' (last dim)
        t_io = jax.lax.broadcasted_iota(jnp.int32, (T8, 1, 1, L), 0)
        r_io = jax.lax.broadcasted_iota(jnp.int32, (T8, 1, 1, L), 3)
        asc = (((t_io * L + r_io) >> (stage_k - 7)) & 1) == 0
    kt, kb, pt, pb, gt, gb = _exchange(kt, kb, pt, pb, gt, gb, asc)

    def join(t, b):
        return jnp.stack([t, b], axis=2).reshape(R, L)

    return join(kt, kb), join(pt, pb), join(gt, gb)


def _sort_kernel(k_ref, p_ref, g_ref, ko_ref, po_ref, go_ref, *, N, R):
    """The output refs double as working storage, checkpointed at STAGE
    boundaries: the fully-chained network keeps too many passes' temps on
    Mosaic's scoped-VMEM stack (25.1M > 16M at N=2^17), while per-pass ref
    barriers blow up the compiler itself (>30 min -> OOM-killed). Windows
    of one stage (<= ~30 passes incl. the transposes) fit both. During a
    transposed lane region the SAME refs hold the [T8, lane, row'] layout
    flattened to [R, 128]."""
    log_n = N.bit_length() - 1
    T8 = R // L

    def store(k, p, g):
        ko_ref[...] = k
        po_ref[...] = p
        go_ref[...] = g

    def load():
        return ko_ref[...], po_ref[...], go_ref[...]

    def tr3(x):
        return x.reshape(T8, L, L).transpose(0, 2, 1).reshape(R, L)

    def lane_chain(k, p, g, stage_js):
        k, p, g = tr3(k), tr3(p), tr3(g)
        for stage_k, j in stage_js:
            k, p, g = _lane_pass_t(k, p, g, R, stage_k, j)
        return tr3(k), tr3(p), tr3(g)

    # stages 1..7: lane-local throughout — one shared transposed region
    k, p, g = lane_chain(
        k_ref[...], p_ref[...], g_ref[...],
        [(kk, j) for kk in range(1, 8) for j in range(kk - 1, -1, -1)],
    )
    store(k, p, g)
    for kk in range(8, log_n + 1):
        k, p, g = load()
        for j in range(kk - 1, 6, -1):
            k, p, g = _row_pass(k, p, g, R, kk, j)
        k, p, g = lane_chain(k, p, g, [(kk, j) for j in range(6, -1, -1)])
        store(k, p, g)


@functools.lru_cache(maxsize=None)
def _make_sort_call(N: int, interpret: bool):
    R = N // L
    return pl.pallas_call(
        functools.partial(_sort_kernel, N=N, R=R),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_shape=[
            jax.ShapeDtypeStruct((R, L), jnp.float32),
            jax.ShapeDtypeStruct((R, L), jnp.int32),
            jax.ShapeDtypeStruct((R, L), jnp.int32),
        ],
        # the network's worst pass materializes ~25M of select temporaries
        # at N=2^17 — above Mosaic's 16M default scoped budget but well
        # within the chip's 128M VMEM (this kernel runs alone: the whole
        # array is resident, there is no pipeline to share with)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )


def sort_supported(N: int) -> bool:
    return (N & (N - 1)) == 0 and (1 << 14) <= N <= (1 << 19)


def sort_by_key_pallas(
    key: jnp.ndarray, val1: jnp.ndarray, val2_arange_gid: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Drop-in for ``lax.sort((key, val1, gid), num_keys=1, is_stable=True)``
    under the documented gating; ``val2_arange_gid`` MUST be ``arange(N)``
    (it doubles as the stability tie-break)."""
    N = key.shape[0]
    assert sort_supported(N), N
    call = _make_sort_call(N, jax.default_backend() != "tpu")
    R = N // L
    ks, ps, gs = call(
        key.reshape(R, L),
        val1.reshape(R, L),
        val2_arange_gid.reshape(R, L),
    )
    return ks.reshape(N), ps.reshape(N), gs.reshape(N)
