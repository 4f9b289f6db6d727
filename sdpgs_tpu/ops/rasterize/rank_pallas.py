"""Pallas kernel for within-tile rank computation (binning stage 3).

Computes, for every (Gaussian, rect-slot) entry, the number of earlier
depth-sorted Gaussians covering the entry's tile — the entry's within-tile
rank. The XLA formulation materializes a [P, D, Tc] one-hot against a
chunked cumsum (~21ms at 131k Gaussians from ~3GB of HBM traffic); here
everything stays in VMEM:

  grid = (gaussian_blocks, tile_chunks)   # tile chunks iterate fastest so
                                          # each rank block stays VMEM-resident
                                          # across its revisits
  per (b, c):
    unpack the block's packed rects       (VPU, [Pb])
    membership mask [Pb, Tc]              (VPU compares)
    block-local inclusive cumsum          (triangular matmul -> MXU)
    exclusive rank base = carry[c] + within - mask
    per rect-slot d: one-hot readout      (D x [Pb, Tc] select+reduce)
    carry[c] += block tile-counts         (full-tile-table scratch, ~3KB)

HBM traffic: packed rects + tids + ranks (~10MB total) instead of 3GB.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


SB = 256  # sub-block width: the cumsum granularity (triangular-matmul size)

# Unroll-vs-fori thresholds for the per-rect-slot (d) loops, in ELEMENTS of
# live per-iteration temporaries. Mosaic stack-allocates a fraction of every
# unrolled iteration's [Tc, SB] / [Sg, SB] temps simultaneously in the 16MB
# scoped-VMEM budget; calibrated endpoints on v5e at 131k capacity:
# D=8 / S=1536-flat compiles unrolled, D=16 / S=1024-flat OOMs by ~0.3MB.
_RANK_UNROLL_ELEMS = 600_000        # D * Tc * SB
_COMPACT_UNROLL_ELEMS = 3_400_000   # len(ds) * Sg * SB


def _rank_kernel(sc_ref, packed_ref, tid_ref, rank_ref, counts_ref, carry_ref,
                 *, Pb: int, Tc: int, D: int, tiles_x: int, nb: int, nc: int):
    # sc_ref: scalar-prefetch [nb_valid (in SB units), shard-first-tile-id].
    # Each grid step processes Pb = nsb*SB Gaussians as nsb serial SB-wide
    # sub-blocks: the cumsum stays an [SB, SB] triangular matmul (total MXU
    # work independent of Pb) while the grid shrinks by nsb — the kernel was
    # grid-overhead bound (512 steps x ~8us >> ~0.3 ms of compute at bench
    # shapes, measured r3).
    b = pl.program_id(0)
    c = pl.program_id(1)
    nb_valid = sc_ref[0]
    t0g = sc_ref[1]
    nsb = Pb // SB

    @pl.when((b == 0) & (c == 0))
    def _():
        carry_ref[...] = jnp.zeros_like(carry_ref)

    # counts blocks are indexed by c: zero each on its first visit so a
    # fully-dead grid (nb_valid == 0) still returns zeros.
    @pl.when(b == 0)
    def _():
        counts_ref[0, :] = jnp.zeros((Tc,), jnp.int32)

    from sdpgs_tpu.ops.rasterize.binning import unpack_rect

    t0 = t0g + c * Tc
    tiles = t0 + jax.lax.broadcasted_iota(jnp.int32, (1, Tc), 1)[0]
    ctx = tiles % tiles_x
    cty = tiles // tiles_x
    row = jax.lax.broadcasted_iota(jnp.int32, (SB, SB), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (SB, SB), 1)
    # bf16 operands are exact here (0/1 inputs, f32 accumulation of
    # counts <= SB) and run the MXU ~6x faster than f32. DEFAULT
    # precision overrides the package-wide "highest" default, which
    # Mosaic rejects for bf16 operands ("Bad lhs type").
    Lt = (row >= col).astype(jnp.bfloat16)

    for sb in range(nsb):
        gb = b * nsb + sb  # global SB-unit sub-block index

        # Dead-block skip: the depth sort puts invalid entries (key=inf)
        # last, so sub-blocks past ceil(n_valid/SB) hold no live entries —
        # skip their compute entirely (at 60k alive / 131k capacity that's
        # >half the grid). Their rank output is garbage but downstream masks
        # it by entry validity; the counts block persists in VMEM across b
        # (same block index), so the last *valid* sub-block's write survives.
        @pl.when(gb < nb_valid)
        def _(sb=sb):
            lo = sb * SB
            packed = packed_ref[0, lo:lo + SB]             # [SB] i32
            xmin, xmax, ymin, ymax = unpack_rect(packed)

            mask = (
                (ctx[None, :] >= xmin[:, None])
                & (ctx[None, :] < xmax[:, None])
                & (cty[None, :] >= ymin[:, None])
                & (cty[None, :] < ymax[:, None])
            )
            mf = mask.astype(jnp.float32)                  # [SB, Tc]

            within = jnp.dot(
                Lt, mf.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )                                              # inclusive

            carry_c = carry_ref[c, :]                      # [Tc]
            excl = carry_c[None, :] + within - mf          # [SB, Tc]

            # one-hot readout per rect slot (D small static)
            for d in range(D):
                td = tid_ref[0, lo:lo + SB, d]             # [SB] i32, -1 = dead
                hit = td[:, None] == tiles[None, :]
                contrib = jnp.sum(jnp.where(hit, excl, 0.0), axis=1)  # [SB]
                prev = jnp.where(c == 0, 0, rank_ref[0, lo:lo + SB, d])
                rank_ref[0, lo:lo + SB, d] = prev + contrib.astype(jnp.int32)

            new_carry = carry_c + within[SB - 1, :]
            carry_ref[c, :] = new_carry
            counts_ref[0, :] = new_carry.astype(jnp.int32)  # last write wins


@functools.lru_cache(maxsize=None)
def _make_rank_call(P: int, D: int, num_tiles_padded: int, Tc: int,
                    tiles_x: int, interpret: bool, Pb: int = 256):
    assert P % Pb == 0 and Pb % SB == 0 and num_tiles_padded % Tc == 0
    nbg = P // Pb  # grid steps (each covers Pb // SB sub-blocks)
    nc = num_tiles_padded // Tc

    return pl.pallas_call(
        functools.partial(
            _rank_kernel, Pb=Pb, Tc=Tc, D=D, tiles_x=tiles_x, nb=nbg, nc=nc
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nbg, nc),
            in_specs=[
                pl.BlockSpec((1, Pb), lambda b, c, *_: (0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Pb, D), lambda b, c, *_: (0, b, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, Pb, D), lambda b, c, *_: (0, b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Tc), lambda b, c, *_: (0, c),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((num_tiles_padded // Tc, Tc), jnp.float32)
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((1, P, D), jnp.int32),
            jax.ShapeDtypeStruct((1, num_tiles_padded), jnp.int32),
        ],
        interpret=interpret,
    )


def _default_tc(num_tiles: int) -> int:
    """One tile chunk when the [Pb, Tc] mask stays modest (<=1024 tiles:
    1MB VMEM, no carry loop); 128-tile chunks beyond."""
    if num_tiles <= 1024:
        return max(128, -(-num_tiles // 128) * 128)
    return 128


def _nb_valid(n_valid, P: int) -> jnp.ndarray:
    """Number of SB-wide sub-blocks of the depth-sorted order holding valid
    entries (grid-block-size independent)."""
    if n_valid is None:
        return jnp.full((1,), P // SB, jnp.int32)
    nv = jnp.asarray(n_valid, jnp.int32)
    return ((nv + SB - 1) // SB).reshape(1)


def compute_ranks_pallas(
    packed_sorted: jnp.ndarray,   # [P] i32 packed rects, depth-sorted
    tid: jnp.ndarray,             # [P, D] i32 entry tiles, -1 = dead slot
    num_tiles: int,
    tiles_x: int,
    Tc: int | None = None,
    n_valid: jnp.ndarray | None = None,
    t0: jnp.ndarray | None = None,
    Pb: int = 256,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """-> (rank [P, D] i32, counts [num_tiles] i32).

    ``n_valid``: traced count of valid (finite-depth-key) Gaussians; blocks
    past it are skipped (their rank rows are garbage but masked downstream by
    entry validity).
    ``t0``: traced scalar first-tile id for tile-partitioned rasterization
    (SURVEY §2.3 item 3; the per-shard analogue of the reference's tile-range
    machinery, rasterizer_impl.cu:116-138) — only the ``num_tiles`` tiles
    from ``t0`` are ranked/counted. Ranks for entries on tiles outside the
    shard stay 0 and are dropped by the table scatter's local-bounds check.
    """
    P, D = tid.shape
    if Tc is None:
        Tc = _default_tc(num_tiles)
    pad_tiles = (-num_tiles) % Tc
    call = _make_rank_call(
        P, D, num_tiles + pad_tiles, Tc, tiles_x,
        jax.default_backend() != "tpu", Pb=Pb,
    )
    t0v = jnp.int32(0) if t0 is None else jnp.asarray(t0, jnp.int32)
    scalars = jnp.stack([_nb_valid(n_valid, P)[0], t0v])
    rank, counts = call(scalars, packed_sorted[None], tid[None])
    return rank[0], counts[0, :num_tiles]


def _rank_compact_body(
    nb_valid, t0g, packed_ref, tid_ref, gin_ref, rank_ref, *rest,
    Pb: int, Tc: int, D: int, tiles_x: int, nb: int, nc: int, K: int,
    n_valid: int, groups: tuple, s_groups: tuple,
):
    """Rank kernel + in-VMEM block compaction: at the final tile chunk each
    SB-wide sub-block emits its <=S valid (slot+1, gid) entries densely
    packed, so the XLA table scatter runs over (P/SB)*S rows instead of P*D
    (the D-scaled scatter was ~20% of the train step). Dynamic VMEM scatter
    is expressed as a one-hot matmul (MXU) — TPU has no in-kernel scatter
    primitive.

    Each grid step batches ``Pb // SB`` sub-blocks (serial, carried): the
    compaction granularity, compute, and output layout are IDENTICAL for
    every Pb — only the grid (and its ~8us/step overhead) shrinks.

    ``t0g``: flat tile id of this shard's first tile (0, or a traced scalar
    under tile-partitioned rasterization); ``n_valid``: true local tile count
    (entries on padding tiles — which may alias the next shard's real tiles —
    are excluded)."""
    ng = len(groups)
    slot_refs = rest[:ng]
    gout_refs = rest[ng:2 * ng]
    counts_ref, dropped_ref, carry_ref = rest[2 * ng:]
    b = pl.program_id(0)
    c = pl.program_id(1)
    nsb = Pb // SB

    @pl.when((b == 0) & (c == 0))
    def _():
        carry_ref[...] = jnp.zeros_like(carry_ref)

    # counts blocks are indexed by c: zero each on its first visit so a
    # fully-dead grid (nb_valid == 0) still returns zeros.
    @pl.when(b == 0)
    def _():
        counts_ref[0, :] = jnp.zeros((Tc,), jnp.int32)

    @pl.when(c == nc - 1)
    def _():
        dropped_ref[0, 0, :] = jnp.zeros((128,), jnp.float32)

    for sb in range(nsb):
        gb = b * nsb + sb

        # Dead-block skip (see _rank_kernel): sub-blocks past nb_valid hold
        # only invalid entries; emit empty compact regions, skip compute.
        @pl.when((gb >= nb_valid) & (c == nc - 1))
        def _skip(sb=sb):
            for gi in range(ng):
                lo = sb * s_groups[gi]
                slot_refs[gi][0, lo:lo + s_groups[gi]] = jnp.zeros(
                    (s_groups[gi],), jnp.float32)
                gout_refs[gi][0, lo:lo + s_groups[gi]] = jnp.zeros(
                    (s_groups[gi],), jnp.float32)

        @pl.when(gb < nb_valid)
        def _main(sb=sb):
            _rank_compact_main(
                sb, c, t0g, packed_ref, tid_ref, gin_ref, rank_ref, slot_refs,
                gout_refs, counts_ref, dropped_ref, carry_ref,
                Tc=Tc, D=D, tiles_x=tiles_x, nc=nc, K=K,
                n_valid=n_valid, groups=groups, s_groups=s_groups,
            )


def _rank_compact_main(
    sb, c, t0g, packed_ref, tid_ref, gin_ref, rank_ref, slot_refs, gout_refs,
    counts_ref, dropped_ref, carry_ref,
    *, Tc, D, tiles_x, nc, K, n_valid, groups, s_groups,
):
    from sdpgs_tpu.ops.rasterize.binning import unpack_rect

    lo = sb * SB
    packed = packed_ref[0, lo:lo + SB]                     # [SB] i32
    xmin, xmax, ymin, ymax = unpack_rect(packed)

    t0 = t0g + c * Tc
    tiles = t0 + jax.lax.broadcasted_iota(jnp.int32, (1, Tc), 1)[0]
    ctx = tiles % tiles_x
    cty = tiles // tiles_x

    mask = (
        (ctx[None, :] >= xmin[:, None])
        & (ctx[None, :] < xmax[:, None])
        & (cty[None, :] >= ymin[:, None])
        & (cty[None, :] < ymax[:, None])
    )
    mf = mask.astype(jnp.float32)                          # [SB, Tc]

    row = jax.lax.broadcasted_iota(jnp.int32, (SB, SB), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (SB, SB), 1)
    # bf16 operands are exact (0/1 inputs, f32 accumulation) and ~6x faster;
    # DEFAULT precision — Mosaic rejects fp32 contract precision on bf16.
    Lt = (row >= col).astype(jnp.bfloat16)
    within = jnp.dot(
        Lt, mf.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )                                                      # inclusive

    carry_c = carry_ref[c, :]                              # [Tc]
    excl = carry_c[None, :] + within - mf                  # [SB, Tc]

    for d in range(D):
        td = tid_ref[0, lo:lo + SB, d]                     # [SB] i32, -1 = dead
        hit = td[:, None] == tiles[None, :]
        contrib = jnp.sum(jnp.where(hit, excl, 0.0), axis=1)  # [SB] f32
        prev = jnp.where(c == 0, 0.0, rank_ref[0, lo:lo + SB, d])
        rank_ref[0, lo:lo + SB, d] = prev + contrib

    new_carry = carry_c + within[SB - 1, :]
    carry_ref[c, :] = new_carry
    counts_ref[0, :] = new_carry.astype(jnp.int32)         # last write wins

    @pl.when(c == nc - 1)
    def _compact():
        gid = gin_ref[0, lo:lo + SB].astype(jnp.float32)   # [SB]
        tid_all = tid_ref[0, lo:lo + SB, :]                # [SB, D]
        local = tid_all - t0g                              # shard-local tile id
        rank_all = rank_ref[0, lo:lo + SB, :]              # [SB, D] f32, final
        vf = (
            (tid_all >= 0) & (local >= 0) & (local < n_valid) & (rank_all < K)
        ).astype(jnp.float32)
        slot1 = (local.astype(jnp.float32) * K + rank_all + 1.0) * vf

        # per-entry position within its group region: within-column
        # exclusive cumsum (strict-lower triangular matmul) + totals of
        # earlier columns in the same group
        strict = (row > col).astype(jnp.bfloat16)          # [SB, SB]
        excl = jnp.dot(strict, vf.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.DEFAULT)
        tot = jnp.sum(vf, axis=0)                          # [D]
        # group id per d = min(d, n_groups-1): singleton groups for d=0,1
        # then the pooled tail (matches _group_layout)
        drow = jax.lax.broadcasted_iota(jnp.int32, (D, D), 0)
        dcol = jax.lax.broadcasted_iota(jnp.int32, (D, D), 1)
        cap = len(groups) - 1
        same = (
            (jnp.minimum(drow, cap) == jnp.minimum(dcol, cap)) & (dcol < drow)
        ).astype(jnp.float32)
        offs = jnp.sum(same * tot[None, :], axis=1)        # [D]
        pos = excl + offs[None, :]                         # [SB, D]

        # clamp/drop against the per-column group capacity on the full
        # [SB, D] array (column slices feed only simple broadcasts below —
        # Mosaic rejects compute on lane-offset vectors)
        diota = jax.lax.broadcasted_iota(jnp.int32, (SB, D), 1)
        sg_of_d = jnp.full((SB, D), float(s_groups[-1]), jnp.float32)
        for gi, ds in enumerate(groups[:-1]):
            sg_of_d = jnp.where(diota == ds[0], float(s_groups[gi]), sg_of_d)
        in_cap = (vf > 0) & (pos < sg_of_d)
        pd_all = jnp.where(in_cap, pos, sg_of_d).astype(jnp.int32)  # [SB, D]
        dropped = jnp.sum(vf * (pos >= sg_of_d))

        # each group region is its own full-width output (Mosaic cannot
        # store at varying lane offsets); the XLA side concatenates the
        # regions — scatter order is irrelevant
        for gi, ds in enumerate(groups):
            Sg = s_groups[gi]
            out_slot = jnp.zeros((Sg,), jnp.float32)
            out_gid = jnp.zeros((Sg,), jnp.float32)
            iota_g = jax.lax.broadcasted_iota(jnp.int32, (Sg, SB), 0)
            for d in ds:
                hit = iota_g == pd_all[:, d][None, :]      # [Sg, SB]
                out_slot = out_slot + jnp.sum(
                    jnp.where(hit, slot1[:, d][None, :], 0.0), axis=1
                )
                out_gid = out_gid + jnp.sum(
                    jnp.where(hit, (gid * vf[:, d])[None, :], 0.0), axis=1
                )
            glo = sb * Sg
            slot_refs[gi][0, glo:glo + Sg] = out_slot
            gout_refs[gi][0, glo:glo + Sg] = out_gid
        dropped_ref[0, 0, :] += jnp.full((128,), dropped, jnp.float32)


def _rank_compact_kernel(sc_ref, packed_ref, tid_ref, gin_ref, *refs,
                         emit_rank=True, **kw):
    # sc_ref: scalar-prefetch [nb_valid, t0]
    if emit_rank:
        _rank_compact_body(
            sc_ref[0], sc_ref[1], packed_ref, tid_ref, gin_ref, *refs, **kw
        )
    else:
        # ranks carried in trailing VMEM scratch (see the lanes factory)
        _rank_compact_body(
            sc_ref[0], sc_ref[1], packed_ref, tid_ref, gin_ref, refs[-1],
            *refs[:-1], **kw
        )


def _group_layout(D: int, S: int, grouped: bool = True,
                  tail: int = 0) -> tuple[tuple, tuple]:
    """The S compact slots split into regions by rect-slot index — d=0
    (every valid Gaussian: up to Pb entries), d=1, and d>=2 pooled — so each
    one-hot readout scans only its region instead of all S: one-hot rows
    shrink from D*S to S/2 + S/4 + S/4 (measured ~2ms/step of VPU work at
    D=8, S=512). Region capacities follow column occupancy; overruns are
    counted in the telemetry.

    ``tail``: pooled-tail (d>=2) capacity override, 0 = S//4. Since d0/d1
    at S//2 = SB can structurally never drop, every grouped-layout drop is
    a tail drop — growing ONLY the tail is the capacity rung between
    "grouped S" and "flat 2S" (r4 large-scene sweep: grouped S=512 drops
    3.4k while flat needs S=1536 for zero; the tail rung recovers the
    grouped readout's ~4.5x smaller emit scan at drop-free capacity)."""
    if D <= 2 or not grouped:
        return (tuple(range(D)),), (S,)
    groups = ((0,), (1,), tuple(range(2, D)))
    # d0 capacity = S/2 (= Pb at S=512: a column can never exceed Pb, so d0
    # never drops); d1 = S/2 (measured: S/4 drops ~650 entries even at
    # fresh bench load); pooled tail S/4. Total 1.25*S scatter rows.
    s_groups = (S // 2, S // 2, tail if tail > 0 else S // 4)
    return groups, s_groups


@functools.lru_cache(maxsize=None)
def _make_rank_compact_call(P: int, D: int, num_tiles_padded: int, Tc: int,
                            tiles_x: int, K: int, S: int, n_valid: int,
                            grouped: bool, interpret: bool, Pb: int = 256,
                            emit_rank: bool = True, tail: int = 0):
    assert P % Pb == 0 and Pb % SB == 0 and num_tiles_padded % Tc == 0
    nb = P // SB   # total SB-wide sub-blocks (fixes output layout for any Pb)
    nbg = P // Pb  # grid steps
    nsb = Pb // SB
    nc = num_tiles_padded // Tc
    groups, s_groups = _group_layout(D, S, grouped, tail)

    # index maps take (*grid, *scalar_prefetch_refs); *_ absorbs the latter
    in_specs = [
        pl.BlockSpec((1, Pb), lambda b, c, *_: (0, b), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Pb, D), lambda b, c, *_: (0, b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Pb), lambda b, c, *_: (0, b), memory_space=pltpu.VMEM),
    ]
    # ranks output only when requested — see the lanes factory for why
    out_specs = (
        ([pl.BlockSpec((1, Pb, D), lambda b, c, *_: (0, b, 0),
                       memory_space=pltpu.VMEM)] if emit_rank else [])
        + [
            pl.BlockSpec((1, nsb * sg), lambda b, c, *_: (0, b),
                         memory_space=pltpu.VMEM)
            for sg in s_groups
        ] * 2
        + [
            pl.BlockSpec((1, Tc), lambda b, c, *_: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda b, c, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    )
    out_shape = (
        ([jax.ShapeDtypeStruct((1, P, D), jnp.float32)] if emit_rank else [])
        + [jax.ShapeDtypeStruct((1, nb * sg), jnp.float32)
           for sg in s_groups] * 2
        + [
            jax.ShapeDtypeStruct((1, num_tiles_padded), jnp.int32),
            jax.ShapeDtypeStruct((nbg, 1, 128), jnp.float32),
        ]
    )
    scratch = [pltpu.VMEM((num_tiles_padded // Tc, Tc), jnp.float32)]
    if not emit_rank:
        scratch.append(pltpu.VMEM((1, Pb, D), jnp.float32))
    kw = dict(Pb=Pb, Tc=Tc, D=D, tiles_x=tiles_x, nb=nbg, nc=nc, K=K,
              n_valid=n_valid, groups=groups, s_groups=s_groups)

    # scalar-prefetch operand: [nb_valid (SB units), shard-first-tile-id]
    return pl.pallas_call(
        functools.partial(_rank_compact_kernel, emit_rank=emit_rank, **kw),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nbg, nc),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=out_shape,
        interpret=interpret,
    )


def compute_compact_entries_pallas(
    packed_sorted: jnp.ndarray,   # [P] i32 packed rects, depth-sorted
    tid: jnp.ndarray,             # [P, D] i32 entry tiles, -1 = dead slot
    gid_sorted: jnp.ndarray,      # [P] i32 original Gaussian ids (sort order)
    num_tiles: int,
    tiles_x: int,
    K: int,
    S: int = 512,
    Tc: int | None = None,
    t0: jnp.ndarray | None = None,
    grouped: bool = True,
    n_valid: jnp.ndarray | None = None,
    Pb: int = 256,
    return_rank: bool = False,
    tail: int = 0,
) -> tuple[jnp.ndarray, ...]:
    """-> (slot [nb*S] i32 with -1 = empty, gid [nb*S] i32,
           counts [num_tiles] i32, dropped scalar i32
           [, rank [P, D] i32 when return_rank]).

    ``slot`` already folds the within-tile rank: ``tile * K + rank`` for
    entries with rank < K (shard-local tile when ``t0`` is given);
    rank-overflow entries are excluded (they are counted via ``counts``).
    ``t0``: traced scalar first-tile id for tile-partitioned rasterization —
    only the ``num_tiles`` tiles from ``t0`` are binned.
    ``n_valid``: traced count of valid depth-sorted Gaussians — blocks past
    it are skipped (dead-block skip, exact)."""
    P, D = tid.shape
    if Tc is None:
        Tc = _default_tc(num_tiles)
    pad_tiles = (-num_tiles) % Tc
    call = _make_rank_compact_call(
        P, D, num_tiles + pad_tiles, Tc, tiles_x, K, S, num_tiles,
        grouped, jax.default_backend() != "tpu", Pb=Pb,
        emit_rank=return_rank, tail=tail,
    )
    t0v = jnp.int32(0) if t0 is None else jnp.asarray(t0, jnp.int32)
    scalars = jnp.stack([_nb_valid(n_valid, P)[0], t0v])
    outs = call(scalars, packed_sorted[None], tid[None], gid_sorted[None])
    o0 = 1 if return_rank else 0
    ng = len(_group_layout(D, S, grouped, tail)[0])
    slot_parts = outs[o0:o0 + ng]
    gid_parts = outs[o0 + ng:o0 + 2 * ng]
    counts, dropped = outs[o0 + 2 * ng], outs[o0 + 1 + 2 * ng]
    slot = jnp.concatenate([p[0] for p in slot_parts]).astype(jnp.int32) - 1
    gid = jnp.concatenate([p[0] for p in gid_parts]).astype(jnp.int32)
    base = (
        slot, gid, counts[0, :num_tiles],
        jnp.sum(dropped[:, 0, 0]).astype(jnp.int32),
    )
    if return_rank:
        return base + (outs[0][0].astype(jnp.int32),)   # [P, D]
    return base


# --------------------------------------------------------------------------
# Lane-major ("lanes") layout variant of the compact rank kernel.
#
# The row-major kernel above keeps per-Gaussian vectors on SUBLANES, so every
# ``x[:, None]`` broadcast and every ``arr[:, d][None, :]`` column slice is a
# Mosaic sublane<->lane relayout (~30+ per block; at 512 grid steps these
# dominate the kernel: 4.89 ms measured vs ~0.3 ms compute floor, r3).
# Here Gaussians live on LANES end to end:
#   - tiles/carry/counts are [Tc, 1] columns (native sublane iota, lane
#     broadcasts are free in both directions),
#   - the membership mask is [Tc, SB], cumsum = mf @ U on the MXU,
#   - rect-slot tile ids are recomputed in-kernel from the packed rects
#     (pure lane-vector arithmetic), so the [P, D] ``tid`` input disappears,
#   - the compact regions are emitted as [Sg, 1] columns (lane reductions).
# --------------------------------------------------------------------------


def _rank_compact_lanes_body(
    nb_valid, t0g, packed_ref, gin_ref, rank_ref, *rest,
    Pb: int, Tc: int, D: int, tiles_x: int, nb: int, nc: int, K: int,
    n_valid: int, groups: tuple, s_groups: tuple,
):
    ng = len(groups)
    slot_refs = rest[:ng]
    gout_refs = rest[ng:2 * ng]
    counts_ref, dropped_ref, carry_ref = rest[2 * ng:]
    b = pl.program_id(0)
    c = pl.program_id(1)
    nsb = Pb // SB

    @pl.when((b == 0) & (c == 0))
    def _():
        carry_ref[...] = jnp.zeros_like(carry_ref)

    @pl.when(b == 0)
    def _():
        counts_ref[...] = jnp.zeros((Tc, 1), jnp.int32)

    @pl.when(c == nc - 1)
    def _():
        dropped_ref[0, 0, :] = jnp.zeros((128,), jnp.float32)

    from sdpgs_tpu.ops.rasterize.binning import unpack_rect

    tiles = t0g + c * Tc + jax.lax.broadcasted_iota(jnp.int32, (Tc, 1), 0)
    ctx = tiles % tiles_x                                   # [Tc, 1]
    cty = tiles // tiles_x
    row = jax.lax.broadcasted_iota(jnp.int32, (SB, SB), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (SB, SB), 1)
    # U[g', g] = g' <= g: inclusive cumsum along lanes as mf @ U (bf16 exact
    # for 0/1 inputs with f32 accumulation; DEFAULT precision for Mosaic)
    Uincl = (row <= col).astype(jnp.bfloat16)
    Ustrict = (row < col).astype(jnp.bfloat16)

    for sb in range(nsb):
        gb = b * nsb + sb

        @pl.when((gb >= nb_valid) & (c == nc - 1))
        def _skip(sb=sb):
            for gi in range(ng):
                glo = sb * s_groups[gi]
                slot_refs[gi][0, glo:glo + s_groups[gi]] = jnp.zeros(
                    (s_groups[gi],), jnp.float32)
                gout_refs[gi][0, glo:glo + s_groups[gi]] = jnp.zeros(
                    (s_groups[gi],), jnp.float32)

        @pl.when(gb < nb_valid)
        def _main(sb=sb):
            lo = sb * SB
            packed = packed_ref[0, lo:lo + SB]              # [SB] lanes
            xmin, xmax, ymin, ymax = unpack_rect(packed)
            rect_w = xmax - xmin
            count = rect_w * (ymax - ymin)                  # [SB]
            rw_f = jnp.maximum(rect_w, 1).astype(jnp.float32)

            mask = (
                (ctx >= xmin[None, :]) & (ctx < xmax[None, :])
                & (cty >= ymin[None, :]) & (cty < ymax[None, :])
            )                                               # [Tc, SB]
            mf = mask.astype(jnp.float32)
            within = jnp.dot(
                mf.astype(jnp.bfloat16), Uincl,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )                                               # [Tc, SB] inclusive
            carry_c = carry_ref[c, :, :]                    # [Tc, 1]
            excl = carry_c + within - mf                    # [Tc, SB]

            def _rank_contrib(df):
                # floor((d + 0.5) / rw) == d // rw exactly for d < 8,
                # rw < 256: the +0.5 keeps exact-integer quotients from
                # rounding down through the f32 divide (same trick below).
                dy = jnp.floor((df + 0.5) / rw_f)
                dx = df - dy * rw_f
                td = (
                    (ymin.astype(jnp.float32) + dy) * tiles_x
                    + xmin.astype(jnp.float32) + dx
                ).astype(jnp.int32)                         # [SB] (garbage on
                                                            # dead entries —
                                                            # masked later)
                hit = tiles == td[None, :]                  # [Tc, SB]
                return jnp.sum(jnp.where(hit, excl, 0.0), axis=0)  # [SB]

            # Unrolled d-loops stack-allocate a fraction of every
            # iteration's [Tc, SB] temporaries at once in Mosaic scoped
            # VMEM; ladder rungs with D >= 16 blow the 16MB budget
            # (measured: D=16/S=1024-flat fails, D=8/S=1536-flat fits),
            # so large D runs as a fori_loop with a bounded live range.
            # Mosaic has no value dynamic_slice, so the fori body selects /
            # merges row d via [D, 1] one-hot masks over the whole slab.
            if D * Tc * SB <= _RANK_UNROLL_ELEMS:
                for d in range(D):
                    contrib = _rank_contrib(jnp.float32(d))
                    prev = jnp.where(c == 0, 0.0, rank_ref[0, d, lo:lo + SB])
                    rank_ref[0, d, lo:lo + SB] = prev + contrib
            else:
                drow = jax.lax.broadcasted_iota(jnp.int32, (D, 1), 0)

                def _rank_body(d, z):
                    contrib = _rank_contrib(d.astype(jnp.float32))
                    cur = rank_ref[0, :, lo:lo + SB]        # [D, SB]
                    # zero the whole slab once (first d of the first chunk);
                    # later iterations keep already-written rows intact
                    base = jnp.where((c == 0) & (d == 0), 0.0, cur)
                    rank_ref[0, :, lo:lo + SB] = jnp.where(
                        drow == d, base + contrib[None, :], base
                    )
                    return z

                jax.lax.fori_loop(0, D, _rank_body, jnp.int32(0))

            new_carry = carry_c + jnp.sum(mf, axis=1, keepdims=True)
            carry_ref[c, :, :] = new_carry
            counts_ref[...] = new_carry.astype(jnp.int32)   # last write wins

            @pl.when(c == nc - 1)
            def _compact():
                gid = gin_ref[0, lo:lo + SB].astype(jnp.float32)  # [SB]
                rank_all = rank_ref[0, :, lo:lo + SB]       # [D, SB]
                diota = jax.lax.broadcasted_iota(jnp.int32, (D, SB), 0)
                dy = jnp.floor((diota.astype(jnp.float32) + 0.5) / rw_f[None, :])
                dx = diota.astype(jnp.float32) - dy * rw_f[None, :]
                td_all = (
                    (ymin.astype(jnp.float32)[None, :] + dy) * tiles_x
                    + xmin.astype(jnp.float32)[None, :] + dx
                ).astype(jnp.int32)                         # [D, SB]
                entry_ok = diota < count[None, :]           # count<=0 -> none
                local = td_all - t0g
                vf = (
                    entry_ok & (local >= 0) & (local < n_valid)
                    & (rank_all < K)
                ).astype(jnp.float32)                       # [D, SB]
                slot1 = (local.astype(jnp.float32) * K + rank_all + 1.0) * vf

                pos = jnp.dot(
                    vf.astype(jnp.bfloat16), Ustrict,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )                                           # [D, SB] exclusive
                tot = jnp.sum(vf, axis=1, keepdims=True)    # [D, 1]
                srow = jax.lax.broadcasted_iota(jnp.int32, (D, D), 0)
                scol = jax.lax.broadcasted_iota(jnp.int32, (D, D), 1)
                cap = len(groups) - 1
                same = (
                    (jnp.minimum(srow, cap) == jnp.minimum(scol, cap))
                    & (scol < srow)
                ).astype(jnp.float32)
                offs = jnp.dot(same, tot,
                               preferred_element_type=jnp.float32)  # [D, 1]
                pos = pos + offs                            # [D, SB]

                dio = jax.lax.broadcasted_iota(jnp.int32, (D, 1), 0)
                sg_col = jnp.full((D, 1), float(s_groups[-1]), jnp.float32)
                for gi, ds in enumerate(groups[:-1]):
                    sg_col = jnp.where(dio == ds[0], float(s_groups[gi]),
                                       sg_col)
                in_cap = (vf > 0) & (pos < sg_col)
                pd_all = jnp.where(in_cap, pos, sg_col).astype(jnp.int32)
                dropped = jnp.sum(vf * (pos >= sg_col))

                for gi, ds in enumerate(groups):
                    Sg = s_groups[gi]
                    siota = jax.lax.broadcasted_iota(jnp.int32, (Sg, SB), 0)
                    out_slot = jnp.zeros((Sg,), jnp.float32)
                    out_gid = jnp.zeros((Sg,), jnp.float32)

                    def _acc(pd_d, sl_d, vf_d, os, og):
                        hit = siota == pd_d                 # [Sg, SB]
                        os = os + jnp.sum(
                            jnp.where(hit, sl_d, 0.0), axis=1)
                        og = og + jnp.sum(
                            jnp.where(hit, gid[None, :] * vf_d, 0.0),
                            axis=1)
                        return os, og

                    # same scoped-VMEM bound as the rank loop above: the
                    # unrolled readout keeps len(ds) [Sg, SB] one-hots live
                    # at once — fori past the limit (ds is contiguous; no
                    # value dynamic_slice in Mosaic, so row d is selected
                    # with a [D, 1] one-hot sum — exact: pd/slot1/vf are
                    # small non-negative floats)
                    if len(ds) * Sg * SB <= _COMPACT_UNROLL_ELEMS:
                        for d in ds:
                            out_slot, out_gid = _acc(
                                pd_all[d][None, :], slot1[d][None, :],
                                vf[d][None, :], out_slot, out_gid)
                    else:
                        drow2 = jax.lax.broadcasted_iota(
                            jnp.int32, (D, 1), 0)
                        pd_f = pd_all.astype(jnp.float32)

                        def _comp_body(j, carry, ds0=ds[0]):
                            d = ds0 + j
                            sel = (drow2 == d).astype(jnp.float32)
                            pd_d = jnp.sum(sel * pd_f, axis=0,
                                           keepdims=True).astype(jnp.int32)
                            sl_d = jnp.sum(sel * slot1, axis=0, keepdims=True)
                            vf_d = jnp.sum(sel * vf, axis=0, keepdims=True)
                            return _acc(pd_d, sl_d, vf_d, *carry)

                        out_slot, out_gid = jax.lax.fori_loop(
                            0, len(ds), _comp_body, (out_slot, out_gid))
                    # one [Sg] column->row relayout per region store; the
                    # [Sg, 1] column form pads lanes 128x in VMEM and HBM
                    glo = sb * Sg
                    slot_refs[gi][0, glo:glo + Sg] = out_slot
                    gout_refs[gi][0, glo:glo + Sg] = out_gid
                dropped_ref[0, 0, :] += jnp.full((128,), dropped, jnp.float32)


def _rank_compact_lanes_kernel(sc_ref, packed_ref, gin_ref, *refs,
                               emit_rank=True, **kw):
    if emit_rank:
        _rank_compact_lanes_body(
            sc_ref[0], sc_ref[1], packed_ref, gin_ref, *refs, **kw
        )
    else:
        # ranks carried in trailing VMEM scratch; body order is unchanged
        _rank_compact_lanes_body(
            sc_ref[0], sc_ref[1], packed_ref, gin_ref, refs[-1], *refs[:-1],
            **kw
        )


@functools.lru_cache(maxsize=None)
def _make_rank_compact_lanes_call(P: int, D: int, num_tiles_padded: int,
                                  Tc: int, tiles_x: int, K: int, S: int,
                                  n_valid: int, grouped: bool,
                                  interpret: bool, Pb: int = 256,
                                  emit_rank: bool = True, tail: int = 0):
    assert P % Pb == 0 and Pb % SB == 0 and num_tiles_padded % Tc == 0
    nb = P // SB
    nbg = P // Pb
    nsb = Pb // SB
    nc = num_tiles_padded // Tc
    groups, s_groups = _group_layout(D, S, grouped, tail)

    in_specs = [
        pl.BlockSpec((1, Pb), lambda b, c, *_: (0, b), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Pb), lambda b, c, *_: (0, b), memory_space=pltpu.VMEM),
    ]
    # The [D, P] per-entry ranks are the kernel's cross-chunk carry; they are
    # ONLY a real output for the (default-off) gather-based payload backward.
    # When not requested they live in a per-block VMEM scratch instead: the
    # full-array output otherwise gets VMEM-stack-placed by XLA and blows the
    # 16MB scoped budget once the trainer ladder escalates D/S (measured:
    # D=16, S=1024 flat at 131k capacity -> 16.37M > 16M compile failure).
    out_specs = (
        ([pl.BlockSpec((1, D, Pb), lambda b, c, *_: (0, 0, b),
                       memory_space=pltpu.VMEM)] if emit_rank else [])
        + [
            pl.BlockSpec((1, nsb * sg), lambda b, c, *_: (0, b),
                         memory_space=pltpu.VMEM)
            for sg in s_groups
        ] * 2
        + [
            pl.BlockSpec((Tc, 1), lambda b, c, *_: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda b, c, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    )
    out_shape = (
        ([jax.ShapeDtypeStruct((1, D, P), jnp.float32)] if emit_rank else [])
        + [jax.ShapeDtypeStruct((1, nb * sg), jnp.float32)
           for sg in s_groups] * 2
        + [
            jax.ShapeDtypeStruct((num_tiles_padded, 1), jnp.int32),
            jax.ShapeDtypeStruct((nbg, 1, 128), jnp.float32),
        ]
    )
    scratch = [pltpu.VMEM((num_tiles_padded // Tc, Tc, 1), jnp.float32)]
    if not emit_rank:
        scratch.append(pltpu.VMEM((1, D, Pb), jnp.float32))
    kw = dict(Pb=Pb, Tc=Tc, D=D, tiles_x=tiles_x, nb=nbg, nc=nc, K=K,
              n_valid=n_valid, groups=groups, s_groups=s_groups)

    return pl.pallas_call(
        functools.partial(_rank_compact_lanes_kernel, emit_rank=emit_rank,
                          **kw),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nbg, nc),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=out_shape,
        interpret=interpret,
    )


def compute_compact_entries_lanes_pallas(
    packed_sorted: jnp.ndarray,   # [P] i32 packed rects, depth-sorted
    gid_sorted: jnp.ndarray,      # [P] i32 original Gaussian ids (sort order)
    num_tiles: int,
    tiles_x: int,
    K: int,
    D: int,
    S: int = 512,
    Tc: int | None = None,
    t0: jnp.ndarray | None = None,
    grouped: bool = True,
    n_valid: jnp.ndarray | None = None,
    Pb: int = 256,
    return_rank: bool = False,
    tail: int = 0,
) -> tuple[jnp.ndarray, ...]:
    """Lane-major variant of :func:`compute_compact_entries_pallas` — same
    contract, but needs no [P, D] tid input (rect-slot tiles are recomputed
    in-kernel from the packed rects). ``return_rank`` appends the [D, P]
    per-entry ranks (int32)."""
    P = packed_sorted.shape[0]
    if Tc is None:
        Tc = _default_tc(num_tiles)
    pad_tiles = (-num_tiles) % Tc
    call = _make_rank_compact_lanes_call(
        P, D, num_tiles + pad_tiles, Tc, tiles_x, K, S, num_tiles,
        grouped, jax.default_backend() != "tpu", Pb=Pb,
        emit_rank=return_rank, tail=tail,
    )
    t0v = jnp.int32(0) if t0 is None else jnp.asarray(t0, jnp.int32)
    scalars = jnp.stack([_nb_valid(n_valid, P)[0], t0v])
    outs = call(scalars, packed_sorted[None], gid_sorted[None])
    o0 = 1 if return_rank else 0
    ng = len(_group_layout(D, S, grouped, tail)[0])
    slot_parts = outs[o0:o0 + ng]
    gid_parts = outs[o0 + ng:o0 + 2 * ng]
    counts, dropped = outs[o0 + 2 * ng], outs[o0 + 1 + 2 * ng]
    slot = jnp.concatenate([p[0] for p in slot_parts]).astype(jnp.int32) - 1
    gid = jnp.concatenate([p[0] for p in gid_parts]).astype(jnp.int32)
    base = (
        slot, gid, counts[:num_tiles, 0],
        jnp.sum(dropped[:, 0, 0]).astype(jnp.int32),
    )
    if return_rank:
        return base + (outs[0][0].astype(jnp.int32),)   # [D, P]
    return base
