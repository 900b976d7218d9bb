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

    acc (C, S) += window_tile (C, 128) @ onehot_tile (128, S)

where onehot[r, j] = offsets[r] <= slot_j < offsets[r+1] — counts are
offset DIFFERENCES, so no counts column rides the records — exact in f32
(0/1 weights select exactly one source record per output column).

Records split into TWO dtype-matched matrices, both expanded by the same
one-hot weights:
- ``records`` (f32): geometry/offset rows that must stay bit-exact f32.
  Expanded with the bf16x3 split matmul (kernels/mxu.py) — the 3-way
  Dekker split reconstructs every f32 exactly under 0/1 weights.
- ``records_b16`` (bf16, optional): rows whose values are bf16-exact
  (pre-rounded colors/conic, small integer counts). Expanded with ONE
  bf16 x bf16 -> f32 MXU pass — a third of the matmul work and half the
  window DMA bytes of riding them as f32 rows.

Block sizing: grid-step overhead on v5e is ~1.5-2 us/program, so the slot
block is large (S_BLOCK = 2048 -> ~3.3k programs at 6.8M slots instead of
13k at the original 512). The matmul runs per 128-record window tile,
PREDICATED on the tile actually owning any of this block's slots (the
host-side searchsorted bounds each block's record range), so the wider
window costs no extra MXU/VPU work — typical blocks touch a fraction of
the 17 window tiles.

Layout: record INPUT uses the TILED stream layout (N/128, C, 128) — a
128-record window tile is one CONTIGUOUS (C, 128) block in HBM (the flat
layout's ~2.5KB per-row window segments measured 12+ ms of pure DMA at
6.8M slots). The OUTPUT is plain flat (C, s_cap): each program's block
write is C strided ~8KB row segments, coarse enough for the DMA engine,
which spares the (C, s_cap)-sized XLA transpose a tiled output needed.
The bf16 output stays bf16 (values are bf16-exact), halving its bytes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mxu import dot_f32_bf16x3

S_BLOCK = 2048  # output slots per grid program (amortizes grid overhead)
LANE = 128
WINDOW = S_BLOCK + LANE  # max source records per window (span + alignment)
W_TILES = WINDOW // LANE
S_TILES = S_BLOCK // LANE


def _expand_kernel(
    # scalar prefetch
    total_ref,  # (1,) int32: number of valid output slots
    gstart_ref,  # (nblocks + 1,) int32: record index at block boundaries
    # inputs
    # records_ref  (T, C, 128) ANY/HBM f32, tiled layout
    # [records_b16_ref]  (T, C2, 128) ANY/HBM bf16, tiled (if two_mats)
    # outputs
    # out_ref (C, S_BLOCK) f32 VMEM block of the flat (C, s_cap) output
    # [out_b16_ref] (C2, S_BLOCK) bf16 VMEM block (if two_mats)
    #           (the DMA engine writes C strided ~8KB row segments per
    #           block — coarse enough that no tiled output layout + XLA
    #           transpose is needed; INPUT windows stay tiled because
    #           their per-row segments would be ~16x smaller)
    # scratch
    # win_vmem (2, W_TILES, C, 128), [win_b16 (2, W_TILES, C2, 128)],
    # off_vmem (1, WINDOW), acc_vmem (C, S_BLOCK), [acc_b16 (C2, S_BLOCK)],
    # dma_sem (2,), [dma_sem_b (2,)]
    *refs,
    c_rows: int, c_rows_b16: int, off_row: int, s_block: int,
):
    two = c_rows_b16 > 0
    if two:
        (records_ref, records_b16_ref, out_ref, out_b16_ref,
         win_vmem, win_b16, off_vmem, acc_vmem, acc_b16,
         dma_sem, dma_sem_b) = refs
    else:
        records_ref, out_ref, win_vmem, off_vmem, acc_vmem, dma_sem = refs
    w_tiles = s_block // LANE + 1
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

    def win_dma_b(blk):
        slot = jax.lax.rem(blk, 2)
        return pltpu.make_async_copy(
            records_b16_ref.at[pl.ds(win_t0(blk), w_tiles)],
            win_b16.at[slot],
            dma_sem_b.at[slot],
        )

    # Cross-program double buffering: program b waits for its own window
    # (started by b-1) and prefetches b+1's. Start/wait conditions mirror
    # each other so inactive blocks never join the DMA chain.
    @pl.when((b == 0) & (s0 < total))
    def _first():
        win_dma(0).start()
        if two:
            win_dma_b(0).start()

    @pl.when((b + 1 < nblocks) & ((b + 1) * s_block < total))
    def _prefetch():
        win_dma(b + 1).start()
        if two:
            win_dma_b(b + 1).start()

    @pl.when(s0 < total)
    def _active():
        win_dma(b).wait()
        if two:
            win_dma_b(b).wait()
        slot = jax.lax.rem(b, 2)
        t0 = win_t0(b)
        # This block's slots live in records [gstart[b], gstart[b+1]]
        # (every active record owns >= 1 slot); as window-tile indices:
        t_lo = (gstart_ref[b] - t0 * LANE) // LANE
        t_hi = (jnp.minimum(gstart_ref[b + 1], t_cap * LANE - 1)
                - t0 * LANE) // LANE
        # Flat offsets row (one sublane): w_tiles static register moves.
        for t in range(w_tiles):
            off_vmem[:, t * LANE : (t + 1) * LANE] = (
                win_vmem[slot, t, off_row : off_row + 1, :]
            )
        # Record r owns slots [off_r, off_{r+1}); the next offset is a
        # 1-lane roll. The circular wrap puts off_0 into row W-1, but rows
        # at/after gstart[b+1] (and the caller's sentinel tail) have
        # off >= this block's slot end, so their membership test is always
        # false — row W-1 is never a needed record (span <= S_BLOCK).
        off_flat = off_vmem[...]
        offn_flat = pltpu.roll(off_flat, (w_tiles * LANE) - 1, 1)
        # Global slot index of each output lane (f32 exact: slot indices
        # < 2^24 by the caller's static check).
        s_glob = (
            jax.lax.broadcasted_iota(jnp.int32, (1, s_block), 1) + s0
        ).astype(jnp.float32)
        acc_vmem[...] = jnp.zeros((c_rows, s_block), jnp.float32)
        if two:
            acc_b16[...] = jnp.zeros((c_rows_b16, s_block), jnp.float32)
        for t in range(w_tiles):  # predicated per-tile matmuls
            @pl.when((t >= t_lo) & (t <= t_hi))
            def _tile(t=t):
                off = off_flat[0:1, t * LANE : (t + 1) * LANE].reshape(
                    LANE, 1
                )
                offn = offn_flat[0:1, t * LANE : (t + 1) * LANE].reshape(
                    LANE, 1
                )
                onehot = jnp.where(
                    (off <= s_glob) & (s_glob < offn), 1.0, 0.0
                )  # (LANE, s_block)
                # bf16x3 split matmul (kernels/mxu.py): exact for EVERY f32
                # under 0/1 weights (the Dekker 3-way split reconstructs the
                # full 24-bit significand). DEFAULT precision would demote
                # inputs to bf16 and corrupt offsets/geometry.
                acc_vmem[...] += dot_f32_bf16x3(
                    win_vmem[slot, t], onehot, (((1,), (0,)), ((), ()))
                )
                if two:
                    # bf16-exact rows: ONE bf16 x bf16 -> f32 pass selects
                    # them exactly (0/1 weights, f32 accumulation).
                    acc_b16[...] += jax.lax.dot_general(
                        win_b16[slot, t], onehot.astype(jnp.bfloat16),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
        out_ref[...] = acc_vmem[...]
        if two:
            out_b16_ref[...] = acc_b16[...].astype(jnp.bfloat16)

    @pl.when(s0 >= total)
    def _tail():
        out_ref[...] = jnp.zeros((c_rows, s_block), jnp.float32)
        if two:
            out_b16_ref[...] = jnp.zeros(
                (c_rows_b16, s_block), jnp.bfloat16
            )


def _tile_records(records: jnp.ndarray, off_row: int | None,
                  total, window: int) -> jnp.ndarray:
    """Pad with sentinel records and reshape to the tiled (T, C, 128)
    layout. Sentinels carry offset == total in ``off_row`` (if given) so
    rows past the active range never match any slot."""
    c, r = records.shape
    pad_r = max(window - r, 128)
    pad_r += (-(r + pad_r)) % LANE
    tail = jnp.zeros((c, pad_r), records.dtype)
    if off_row is not None:
        tail = tail.at[off_row].set(
            jnp.broadcast_to(total.astype(records.dtype), (pad_r,))
        )
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
    s_block = S_BLOCK
    while s_cap % s_block != 0:
        s_block //= 2
    if s_block < LANE:
        raise ValueError(f"s_cap={s_cap} must be a multiple of {LANE}")
    window = s_block + LANE

    # Mosaic requires memref slices (the window DMAs) to have sublane
    # extents aligned to the dtype tiling (8): pad the row counts up with
    # zero rows. FREE in practice — the tiled HBM layout already pads the
    # sublane dim to 8 and the MXU pads matmul operands to 8 sublanes, so
    # neither DMA bytes nor MXU work grow; only the padded flat outputs
    # carry extra rows, sliced off (and DCE-fused) here.
    def _pad8(m):
        cm = m.shape[0]
        pad = (-cm) % 8
        if pad:
            m = jnp.concatenate(
                [m, jnp.zeros((pad, m.shape[1]), m.dtype)], axis=0
            )
        return m

    c_pad = c + ((-c) % 8)
    tiled = _tile_records(_pad8(records), off_row, total, window)
    c2 = 0
    c2_pad = 0
    operands = [tiled]
    # A zero-row records_b16 degrades to the single-matrix path (the kernel
    # unpacks refs by two_mats = c_rows_b16 > 0, so the operand must not
    # ride along when c2 == 0).
    if records_b16 is not None and records_b16.shape[0] > 0:
        c2 = records_b16.shape[0]
        c2_pad = c2 + ((-c2) % 8)
        tiled_b = _tile_records(
            _pad8(records_b16.astype(jnp.bfloat16)), None, total, window
        )
        operands.append(tiled_b)

    nblocks = s_cap // s_block
    # Record index containing each block's first slot (clamped into range);
    # entry nblocks bounds the last block's span for tile predication.
    b_slots = jnp.arange(nblocks + 1, dtype=jnp.int32) * s_block
    gstart = jnp.clip(
        jnp.searchsorted(offsets_ext, b_slots, side="right").astype(jnp.int32)
        - 1,
        0,
        r - 1,
    )

    kernel = functools.partial(
        _expand_kernel, c_rows=c_pad, c_rows_b16=c2_pad,
        off_row=off_row, s_block=s_block,
    )
    w_tiles = s_block // LANE + 1
    out_shapes = [jax.ShapeDtypeStruct((c_pad, s_cap), jnp.float32)]
    out_specs = [
        pl.BlockSpec((c_pad, s_block), lambda b, *_: (0, b),
                     memory_space=pltpu.VMEM),
    ]
    scratch = [
        pltpu.VMEM((2, w_tiles, c_pad, LANE), jnp.float32),
    ]
    if c2:
        out_shapes.append(
            jax.ShapeDtypeStruct((c2_pad, s_cap), jnp.bfloat16)
        )
        out_specs.append(
            pl.BlockSpec((c2_pad, s_block), lambda b, *_: (0, b),
                         memory_space=pltpu.VMEM)
        )
        scratch.append(pltpu.VMEM((2, w_tiles, c2_pad, LANE), jnp.bfloat16))
    scratch.append(pltpu.VMEM((1, window), jnp.float32))
    scratch.append(pltpu.VMEM((c_pad, s_block), jnp.float32))
    if c2:
        scratch.append(pltpu.VMEM((c2_pad, s_block), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA((2,)))
    if c2:
        scratch.append(pltpu.SemaphoreType.DMA((2,)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nblocks,),
        # HBM (not ANY): the record matrices can be small enough to fit in
        # VMEM (e.g. 100K-Gaussian scenes), where Mosaic would place an ANY
        # operand — but VMEM memref slices require sublane counts aligned
        # to the dtype tiling (8), and C/C2 are often 7. HBM DMA slices
        # have no such constraint, and the windows are streamed anyway.
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * len(operands),
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(s_cap) * 2 * LANE * (3 * c + c2) * 2,
            bytes_accessed=int(s_cap) * (c * 4 + c2 * 2)
            + nblocks * window * (c * 4 + c2 * 2),
            transcendentals=0,
        ),
    )(total.reshape(1), gstart, *operands)
    if c2:
        return out[0][:c], out[1][:c2]
    if records_b16 is not None:  # zero-row b16 input: keep the tuple shape
        return out[0][:c], jnp.zeros((0, s_cap), jnp.bfloat16)
    return out[0][:c]
