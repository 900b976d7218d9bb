"""Pallas segment-expand: replicate record columns by per-record counts.

The TPU-native engine of tile binning's two-level expansion
(ops/binning.py). The reference allocates pair slots with warp-aggregated
atomics (/root/reference/cuda/culling.cu:221-244); the XLA formulation we
replace (scatter marks + cummax for segment ids, then one row gather per
level) pays per-index gather costs that dominate the step at scale
(~135 ms of a 446 ms step at 6.5M pairs on v5e).

This kernel exploits the structure instead: records are compacted so every
record in the active region has count >= 1, hence a block of S output slots
touches a CONTIGUOUS source range of at most S records. Each grid program
DMAs one 128-aligned source window (double-buffered across grid steps: the
sequential TPU grid lets program b prefetch b+1's window) and extracts the
expanded records with one-hot membership matmuls on the MXU:

    acc (ROWS, S) += window_tile (ROWS, 128) @ onehot_tile (128, S)

where onehot[r, j] = offsets[r] <= slot_j < offsets[r+1] — counts are
offset DIFFERENCES, so no counts column rides the records.

ONE FUSED bf16 MATMUL per window tile: the MXU streams the (128, S) one-hot
through the systolic array at the same cost whether the stationary operand
has 8 rows or 128, so splitting the work into a 3-pass bf16x3 f32 matmul
plus a separate bf16 matmul (the round-2 design) paid ~4x the MXU
invocations for the same selection. Instead every record row is stored
PRE-SPLIT as bf16 rows in one combined matrix:

- each f32 row becomes THREE bf16 rows (Dekker split: hi = bf16(x),
  mid = bf16(x - hi), lo = the remainder, exactly bf16) laid out as
  [hi-block | mid-block | lo-block]; the one-hot selects exactly one
  record per output column, so f32 accumulation returns each term exactly
  and hi + mid + lo reconstructs all 24 significand bits — integers
  < 2^24 and f32 geometry are exact;
- bf16-exact rows (pre-rounded colors/conic, small integer counts) ride as
  single rows appended after the lo-block.

One (3*C + C2, 128) @ (128, S) pass per window tile replaces the previous
four; the offsets row is reconstructed in-kernel from its hi/mid/lo rows
(two adds on a (1, WINDOW) strip). One DMA chain instead of two.

Block sizing: grid-step overhead on v5e is ~1.5-2 us/program, so the slot
block is large (S_BLOCK = 4096). The block's slot axis is processed in
SUB-WINDOWS of SUB = 256 lanes: for each sub-window, a dynamic fori_loop
visits only the 1-3 window tiles whose records own any of its slots (an
in-kernel two-pointer scan over the prefetched per-tile slot offsets
``toff`` bounds each sub-window's tile range — a host-side searchsorted at
SUB granularity measured ~10 ms), and the one-hot is built at (SUB, 128) —
membership compares and
MXU work scale with TRUE (record x owned-slot) coverage instead of
window_tiles x S_BLOCK (the full-width formulation measured ~16 ms of
pure VPU compares at 6.8M slots; sub-windowing removes ~90% of it). The
one-hot is built TRANSPOSED — slots along sublanes (a free broadcasted
iota), records along lanes (the offsets strip's native layout) — so no
(1,128)->(128,1) lane->sublane transposes exist anywhere; the matmul
contracts both operands' minor dims, which the MXU stages natively.

Layout: record INPUT uses the TILED stream layout (N/128, ROWS, 128) — a
128-record window tile is one CONTIGUOUS block in HBM (the flat layout's
per-row window segments measured 12+ ms of pure DMA at 6.8M slots). The
OUTPUT is plain flat (C, s_cap): each program's block write is C strided
~16KB row segments, coarse enough for the DMA engine, which spares the
(C, s_cap)-sized XLA transpose a tiled output needed. The bf16 output
stays bf16 (values are bf16-exact), halving its bytes.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S_BLOCK = 8192  # output slots per grid program (amortizes grid overhead;
#                 8192 measured ~7% faster than 4096 at 6.8M slots — the
#                 out-block DMA turnaround is the per-program fixed cost)
SUB = int(os.environ.get("GSPLAT_EXPAND_SUB", "256"))  # sub-window lanes (one-hot/matmul granularity)
LANE = 128
WINDOW = S_BLOCK + LANE  # max source records per window (span + alignment)


def _expand_kernel(
    # scalar prefetch
    total_ref,  # (1,) int32: number of valid output slots
    gstart_ref,  # (nblocks + 1,) int32: record index at block boundaries
    toff_ref,  # (t_cap + 1,) int32: slot offset at each 128-record tile
    #            boundary (offsets_ext[::128], sentinel-padded) — the
    #            sub-window loop derives per-sub tile ranges from these
    #            scalars with a two-pointer scan instead of a host-side
    #            searchsorted at SUB granularity (26K queries over the
    #            offsets measured ~10 ms; the strided slice is free)
    # inputs
    # records_ref  (T, ROWS, 128) ANY/HBM bf16, tiled combined layout
    #   rows [0:C) f32-hi | [C:2C) f32-mid | [2C:3C) f32-lo | [3C:3C+C2) b16
    # outputs
    # out_ref (C, S_BLOCK) f32 VMEM block of the flat (C, s_cap) output
    # [out_b16_ref] (C2, S_BLOCK) bf16 VMEM block (if c_b16 > 0)
    # scratch
    # win_vmem (2, W_TILES, ROWS, 128), off_s/offn_s (W_TILES, 1, 128),
    # dma_sem (2,)
    *refs,
    c_f32: int, c_b16: int, off_row: int, s_block: int, sub: int,
    off_rows: int = 1,
):
    if c_b16:
        (records_ref, out_ref, out_b16_ref,
         win_vmem, off_s, offn_s, dma_sem) = refs
    else:
        records_ref, out_ref, win_vmem, off_s, offn_s, dma_sem = refs
    rows = win_vmem.shape[2]
    w_tiles = s_block // LANE + 1
    n_subs = s_block // sub
    b = pl.program_id(0)
    nblocks = pl.num_programs(0)
    total = total_ref[0]
    t_cap = records_ref.shape[0]
    s0 = b * s_block

    def win_t0(blk):
        return jnp.clip(gstart_ref[blk] // LANE, 0, t_cap - w_tiles)

    def win_dma(blk):
        slot = jax.lax.rem(blk, 2)
        return pltpu.make_async_copy(
            records_ref.at[pl.ds(win_t0(blk), w_tiles)],
            win_vmem.at[slot],
            dma_sem.at[slot],
        )

    # Cross-program double buffering: program b waits for its own window
    # (started by b-1) and prefetches b+1's. Start/wait conditions mirror
    # each other so inactive blocks never join the DMA chain.
    @pl.when((b == 0) & (s0 < total))
    def _first():
        win_dma(0).start()

    @pl.when((b + 1 < nblocks) & ((b + 1) * s_block < total))
    def _prefetch():
        win_dma(b + 1).start()

    @pl.when(s0 < total)
    def _active():
        win_dma(b).wait()
        slot = jax.lax.rem(b, 2)
        t0 = win_t0(b)
        # Reconstruct the exact-f32 offsets strips from the hi/mid/lo bf16
        # rows (w_tiles static register moves + two adds per tile) into
        # per-tile scratch rows so the sub-window loop can index them by a
        # DYNAMIC tile number. Record r owns slots [off_r, off_{r+1}); the
        # next offset is a 1-lane roll of the flat strip. The circular wrap
        # puts off_0 into the last lane of tile w_tiles-1, but rows at or
        # beyond each sub-window's record range never pass the membership
        # test, so that lane is never a needed record (span <= S_BLOCK).
        def dekker_row(r):
            return [
                (
                    win_vmem[slot, t, r : r + 1, :].astype(jnp.float32)
                    + win_vmem[slot, t, c_f32 + r : c_f32 + r + 1, :]
                    .astype(jnp.float32)
                    + win_vmem[slot, t, 2 * c_f32 + r : 2 * c_f32 + r + 1, :]
                    .astype(jnp.float32)
                )
                for t in range(w_tiles)
            ]

        if off_rows == 2:
            # WIDE-OFFSET mode (pair caps >= 2^24, the f32-exact integer
            # ceiling): offsets ride as TWO f32 record rows
            # [hi = off >> 11 | lo = off & 2047] and the strips are
            # reconstructed in int32 (exact to 2^31); membership compares
            # run in int32 below.
            strips = [
                h.astype(jnp.int32) * 2048 + l.astype(jnp.int32)
                for h, l in zip(dekker_row(off_row), dekker_row(off_row + 1))
            ]
        else:
            strips = dekker_row(off_row)
        for t in range(w_tiles):
            off_s[t] = strips[t]
        off_flat = jnp.concatenate(strips, axis=1)
        offn_flat = pltpu.roll(off_flat, (w_tiles * LANE) - 1, 1)
        for t in range(w_tiles):
            offn_s[t] = offn_flat[:, t * LANE : (t + 1) * LANE]

        # Slots along SUBLANES (free iota); records along LANES (the
        # strips' native layout) — the one-hot is built transposed and the
        # matmul contracts both minor dims, so nothing is ever transposed.
        #
        # Per-sub tile ranges from toff scalars: window tile t's records
        # own slots [toff[t0+t], toff[t0+t+1]), so the tiles touching
        # sub-window [sub_lo, sub_hi) are
        #   t_lo = min t with toff[t0+t+1] > sub_lo
        #   t_hi = max t with toff[t0+t]   < sub_hi
        # and both are nondecreasing in si — a two-pointer scan costs
        # <= w_tiles + n_subs scalar steps per block in total.
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (sub, 1), 0)
        tl = jnp.int32(0)
        th = jnp.int32(0)
        for si in range(n_subs):
            sub_lo = s0 + si * sub
            sub_hi = sub_lo + sub
            tl = jax.lax.while_loop(
                lambda t: (t < w_tiles - 1)
                & (toff_ref[t0 + t + 1] <= sub_lo),
                lambda t: t + 1,
                tl,
            )
            th = jax.lax.while_loop(
                lambda t: (t < w_tiles - 1)
                & (toff_ref[t0 + t + 1] < sub_hi),
                lambda t: t + 1,
                jnp.maximum(th, tl),
            )
            t_lo, t_hi = tl, th
            # Global slot index of each sub-window sublane: f32 (exact
            # below the 2^24 caller check) or int32 in wide-offset mode.
            s_col = sub_iota + (s0 + si * sub)
            if off_rows != 2:
                s_col = s_col.astype(jnp.float32)

            def t_body(t, acc, s_col=s_col):
                onehot = jnp.where(
                    (off_s[t] <= s_col) & (s_col < offn_s[t]), 1.0, 0.0
                ).astype(jnp.bfloat16)  # (sub, LANE): slot-major, transposed
                # ONE bf16 x bf16 -> f32 pass: 0/1 weights select exactly
                # one record per slot; every stored row is bf16, so each
                # term is reproduced exactly in the f32 accumulator.
                return acc + jax.lax.dot_general(
                    win_vmem[slot, t], onehot, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            acc = jax.lax.fori_loop(
                t_lo, t_hi + 1, t_body,
                jnp.zeros((rows, sub), jnp.float32),
            )
            sl = slice(si * sub, (si + 1) * sub)
            # Recombine the f32 rows: hi + mid + lo (exact Dekker sum).
            out_ref[:, sl] = (
                acc[0:c_f32]
                + acc[c_f32 : 2 * c_f32]
                + acc[2 * c_f32 : 3 * c_f32]
            )
            if c_b16:
                out_b16_ref[:, sl] = acc[
                    3 * c_f32 : 3 * c_f32 + c_b16
                ].astype(jnp.bfloat16)

    @pl.when(s0 >= total)
    def _tail():
        out_ref[...] = jnp.zeros((c_f32, s_block), jnp.float32)
        if c_b16:
            out_b16_ref[...] = jnp.zeros((c_b16, s_block), jnp.bfloat16)


def _split3(x: jnp.ndarray):
    """f32 -> (hi, mid, lo) bf16 terms with hi + mid + lo == x exactly.

    Exact for normal f32 and for integers |x| < 2^24. f32 SUBNORMALS below
    bf16's subnormal range are NOT reconstructed (the final bf16 casts lose
    them entirely, e.g. x = 1e-38 comes back as 0); expansion records are
    offsets/geometry and never subnormal, so no caller depends on that case.

    The split is done by INTEGER mantissa masking (truncate the low 16
    mantissa bits), NOT by ``x - x.astype(bf16).astype(f32)``: under jit,
    XLA's excess-precision simplification folds the f32->bf16->f32 convert
    pair away, turning the residual into exactly 0 and silently rounding
    every expanded f32 row to bf16 (reproduced on v5e; op-by-op execution
    was exact, so only jitted pipelines were corrupted). Bitcast/mask ops
    have no such rewrite. The masked values have zero low mantissa bits,
    so the final bf16 casts are value-exact however XLA schedules them.
    """
    mask16 = jnp.int32(-65536)  # 0xFFFF0000

    def trunc(v):
        vi = jax.lax.bitcast_convert_type(v, jnp.int32)
        return jax.lax.bitcast_convert_type(vi & mask16, jnp.float32)

    hi_f = trunc(x)
    r1 = x - hi_f  # exact: low-bit tail of x
    mid_f = trunc(r1)
    lo = r1 - mid_f  # exact, <= 8 significant bits -> bf16-exact
    return (
        hi_f.astype(jnp.bfloat16),
        mid_f.astype(jnp.bfloat16),
        lo.astype(jnp.bfloat16),
    )


def _tile_records(records: jnp.ndarray, sentinel_rows, window: int):
    """Pad records (bf16) with sentinel columns and reshape to the tiled
    (T, ROWS, 128) layout. ``sentinel_rows`` is a list of (row_index,
    value) pairs written into the pad region — the 3-split of ``total``
    in the offset rows (both hi and lo row groups in wide-offset mode) so
    rows past the active range never match any slot."""
    c, r = records.shape
    pad_r = max(window - r, 128)
    pad_r += (-(r + pad_r)) % LANE
    tail = jnp.zeros((c, pad_r), records.dtype)
    for row, val in sentinel_rows:
        tail = tail.at[row].set(jnp.broadcast_to(val, (pad_r,)))
    records = jnp.concatenate([records, tail], axis=1)
    r_pad = r + pad_r
    return records.reshape(c, r_pad // LANE, LANE).transpose(1, 0, 2)


def segment_expand(
    records: jnp.ndarray,  # (C, R) f32; row off_row = exclusive offsets
    #                        (as exact f32 ints; counts are offset diffs)
    offsets_ext: jnp.ndarray,  # (R + 1,) int32 exclusive offsets + total
    total: jnp.ndarray,  # () int32 — valid output slots (== offsets_ext[-1])
    s_cap: int,  # static output slot capacity
    *,
    off_row: int,
    records_b16: jnp.ndarray | None = None,  # (C2, R) bf16-exact rows
    interpret: bool = False,
    off_rows: int = 1,  # 2 = wide-offset mode: rows [off_row, off_row+1]
    #                     carry [off >> 11 | off & 2047] and membership
    #                     runs in int32 — lifts the slot-index ceiling
    #                     from 2^24 (f32-exact integers) to 2^31
    s_block_max: int = 0,  # 0 = S_BLOCK; larger blocks amortize the
    #                        per-program overhead (out-block DMA turnaround
    #                        dominates at 4096: measured ~11 us/program on
    #                        v5e vs ~2.7 ms of actual work at 6.8M slots)
):
    """Expand records by counts into (C, s_cap) slot-major layout.

    Slot s holds records[:, g] for the unique g with offsets_ext[g] <= s <
    offsets_ext[g+1]; the offsets row of ``records`` must equal
    offsets_ext[:-1] (counts are consecutive-offset differences). Slots >=
    total are zero. REQUIREMENT: every record with a slot below ``total``
    has count >= 1 up to the last active record (compacted input) — this
    bounds each block's source span to the block size.

    With ``records_b16`` (rows whose f32 values are bf16-exact; any dtype,
    cast internally), returns (out (C, s_cap) f32, out_b16 (C2, s_cap)
    bf16) expanded by the same memberships; otherwise returns out alone.

    Input/output are logically flat (C, N); the tiled HBM layout is an
    internal detail (XLA fuses the reshapes into producers/consumers).
    """
    c, r = records.shape
    # Largest block size that divides s_cap (callers align caps to S_BLOCK
    # when they can; small/test caps fall back to smaller blocks).
    s_block = s_block_max or S_BLOCK
    while s_cap % s_block != 0:
        s_block //= 2
    if s_block < LANE:
        raise ValueError(f"s_cap={s_cap} must be a multiple of {LANE}")
    window = s_block + LANE

    # Mosaic block/slice sublane alignment: pad the f32 rows to a multiple
    # of 8 and the bf16 rows to 8 BEFORE the split/concat, so the output
    # blocks are aligned; the combined window matrix is padded to the bf16
    # tiling (16). Padded rows are zeros — they ride the matmuls for free
    # (the MXU pads the stationary operand to 8 sublanes regardless).
    def _pad_rows(m, mult):
        cm = m.shape[0]
        pad = (-cm) % mult
        if pad:
            m = jnp.concatenate(
                [m, jnp.zeros((pad, m.shape[1]), m.dtype)], axis=0
            )
        return m

    records = _pad_rows(records, 8)
    c_pad = records.shape[0]
    c2 = 0
    c2_pad = 0
    # A zero-row records_b16 degrades to the single-matrix path.
    if records_b16 is not None and records_b16.shape[0] > 0:
        c2 = records_b16.shape[0]
        records_b16 = _pad_rows(records_b16.astype(jnp.bfloat16), 8)
        c2_pad = records_b16.shape[0]

    # Combined pre-split bf16 matrix: [hi | mid | lo | b16 rows].
    hi, mid, lo = _split3(records)
    parts = [hi, mid, lo]
    if c2:
        parts.append(records_b16)
    combined = _pad_rows(jnp.concatenate(parts, axis=0), 16)
    rows_pad = combined.shape[0]
    def split_rows(base_row, value):
        return list(zip(
            (base_row, c_pad + base_row, 2 * c_pad + base_row),
            _split3(value.astype(jnp.float32)),
        ))

    if off_rows == 2:
        # Wide-offset sentinels: both hi and lo row groups carry total's
        # split so tail rows reconstruct off == total exactly.
        sentinel_rows = (split_rows(off_row, total >> 11)
                         + split_rows(off_row + 1, total & 2047))
    else:
        sentinel_rows = split_rows(off_row, total)
    tiled = _tile_records(combined, sentinel_rows, window)

    nblocks = s_cap // s_block
    # Sub-window width must divide s_block (the si loop covers exactly
    # n_subs * sub slots); s_block is always a power of two here, so round
    # a non-power-of-two GSPLAT_EXPAND_SUB down to one instead of leaving
    # slots [n_subs * sub, s_block) unwritten.
    sub = min(SUB, s_block)
    if s_block % sub != 0:
        sub = 1 << (sub.bit_length() - 1)
    # Record index containing each block's first slot (clamped into range);
    # entry nblocks bounds the last block's span. Kept at BLOCK granularity
    # (a searchsorted at SUB granularity measured ~10 ms at 6.8M slots);
    # per-sub tile ranges come from the toff scalars inside the kernel.
    b_slots = jnp.arange(nblocks + 1, dtype=jnp.int32) * s_block
    gstart = jnp.clip(
        jnp.searchsorted(offsets_ext, b_slots, side="right").astype(jnp.int32)
        - 1,
        0,
        r - 1,
    )
    # Slot offset at each 128-record tile boundary: pad offsets_ext to the
    # tiled record count (sentinel-extended with ``total``), then stride —
    # both free (vs ~10 ms for a SUB-granular searchsorted).
    t_cap = tiled.shape[0]
    pad_off = t_cap * LANE + 1 - offsets_ext.shape[0]
    toff = jnp.concatenate(
        [offsets_ext,
         jnp.broadcast_to(total.astype(jnp.int32)[None], (pad_off,))]
    )[::LANE]

    kernel = functools.partial(
        _expand_kernel, c_f32=c_pad, c_b16=c2_pad,
        off_row=off_row, s_block=s_block, sub=sub, off_rows=off_rows,
    )
    w_tiles = s_block // LANE + 1
    out_shapes = [jax.ShapeDtypeStruct((c_pad, s_cap), jnp.float32)]
    out_specs = [
        pl.BlockSpec((c_pad, s_block), lambda b, *_: (0, b),
                     memory_space=pltpu.VMEM),
    ]
    if c2:
        out_shapes.append(
            jax.ShapeDtypeStruct((c2_pad, s_cap), jnp.bfloat16)
        )
        out_specs.append(
            pl.BlockSpec((c2_pad, s_block), lambda b, *_: (0, b),
                         memory_space=pltpu.VMEM)
        )
    off_dt = jnp.int32 if off_rows == 2 else jnp.float32
    scratch = [
        pltpu.VMEM((2, w_tiles, rows_pad, LANE), jnp.bfloat16),
        pltpu.VMEM((w_tiles, 1, LANE), off_dt),
        pltpu.VMEM((w_tiles, 1, LANE), off_dt),
        pltpu.SemaphoreType.DMA((2,)),
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nblocks,),
        # HBM (not ANY): the record matrix can be small enough to fit in
        # VMEM (e.g. 100K-Gaussian scenes), where Mosaic would place an ANY
        # operand — but HBM DMA slices have no sublane-alignment constraint
        # and the windows are streamed anyway.
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(s_cap) * 2 * LANE * rows_pad,
            bytes_accessed=int(s_cap) * (c_pad * 4 + c2_pad * 2)
            + nblocks * window * rows_pad * 2,
            transcendentals=0,
        ),
    )(total.reshape(1), gstart, toff, tiled)
    if c2:
        return out[0][:c], out[1][:c2]
    if records_b16 is not None:  # zero-row b16 input: keep the tuple shape
        return out[0][:c], jnp.zeros((0, s_cap), jnp.bfloat16)
    return out[0][:c]
