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
expanded records with a one-hot membership matmul on the MXU:

    out (C, S) = window (C, W) @ onehot (W, S)

where onehot[r, j] = offsets[r] <= slot_j < offsets[r] + counts[r] — exact
in f32 (0/1 weights select exactly one source record per output column).

Layout: records are (C, R) f32 with the record index on the lane axis
(clean (8,128) HBM tiling, arbitrary C). Integer columns ride as plain f32
casts (exact below 2^24 — capacities are statically checked by the caller).
The caller provides, per block, the source index of the record containing
the block's first slot (one XLA searchsorted over the offsets — sub-ms),
as a scalar-prefetch table.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mxu import dot_f32_bf16x3

S_BLOCK = 512  # output slots per grid program
WINDOW = S_BLOCK + 128  # source records per window (span <= S + alignment)


def _expand_kernel(
    # scalar prefetch
    total_ref,  # (1,) int32: number of valid output slots
    gstart_ref,  # (nblocks,) int32: record index at each block's first slot
    # inputs
    records_ref,  # (C, R) ANY/HBM
    # outputs
    out_ref,  # (C, S_BLOCK) VMEM block
    # scratch
    win_vmem,  # (2, C, WINDOW)
    dma_sem,  # (2,)
    *, c_rows: int, off_row: int,
):
    b = pl.program_id(0)
    nblocks = pl.num_programs(0)
    total = total_ref[0]
    r_cap = records_ref.shape[1]
    s0 = b * S_BLOCK

    def win_dma(blk):
        g = gstart_ref[blk]
        w0 = jnp.clip(g - jax.lax.rem(g, 128), 0, r_cap - WINDOW)
        slot = jax.lax.rem(blk, 2)
        return pltpu.make_async_copy(
            records_ref.at[:, pl.ds(pl.multiple_of(w0, 128), WINDOW)],
            win_vmem.at[slot],
            dma_sem.at[slot],
        )

    # Cross-program double buffering: program b waits for its own window
    # (started by b-1) and prefetches b+1's. Start/wait conditions mirror
    # each other so inactive blocks never join the DMA chain.
    @pl.when((b == 0) & (s0 < total))
    def _first():
        win_dma(0).start()

    @pl.when((b + 1 < nblocks) & ((b + 1) * S_BLOCK < total))
    def _prefetch():
        win_dma(b + 1).start()

    @pl.when(s0 < total)
    def _active():
        win_dma(b).wait()
        win = win_vmem[jax.lax.rem(b, 2)]
        # Global slot index of each output lane (f32 exact: slot indices
        # < 2^24 by the caller's static check).
        s_glob = (
            jax.lax.broadcasted_iota(jnp.int32, (1, S_BLOCK), 1) + s0
        ).astype(jnp.float32)
        # Record r owns slots [off_r, off_{r+1}) — counts are offset
        # DIFFERENCES (offsets tile the slot space), so no counts column
        # rides the records; the next offset is a 1-lane roll. The circular
        # wrap puts off_0 into row W-1, but the caller's sentinel tail
        # guarantees the last REAL record never sits on row W-1, and the
        # wrapped row's own test (off_{W-1} <= s < off_0) is always false.
        off_vec = win[off_row : off_row + 1, :]  # (1, WINDOW)
        offn_vec = pltpu.roll(off_vec, WINDOW - 1, 1)  # left-roll by 1
        off = off_vec.reshape(WINDOW, 1)
        offn = offn_vec.reshape(WINDOW, 1)
        onehot = jnp.where(
            (off <= s_glob) & (s_glob < offn), 1.0, 0.0
        )  # (WINDOW, S_BLOCK)
        # bf16x3 split matmul (kernels/mxu.py): exact for the integer
        # offset/id columns (< 2^24), f32-grade for the floats, at half the
        # cost of Mosaic's 6-pass HIGHEST precision. DEFAULT precision
        # would demote inputs to bf16 and corrupt the selection.
        out_ref[...] = dot_f32_bf16x3(
            win, onehot, (((1,), (0,)), ((), ()))
        )

    @pl.when(s0 >= total)
    def _tail():
        out_ref[...] = jnp.zeros((c_rows, S_BLOCK), jnp.float32)


def segment_expand(
    records: jnp.ndarray,  # (C, R) f32; row off_row = exclusive offsets
    #                        (as exact f32 ints; counts are offset diffs)
    offsets_ext: jnp.ndarray,  # (R + 1,) int32 exclusive offsets + total
    total: jnp.ndarray,  # () int32 — valid output slots (== offsets_ext[-1])
    s_cap: int,  # static output slot capacity
    *,
    off_row: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Expand records by counts into (C, s_cap) slot-major layout.

    Slot s holds records[:, g] for the unique g with offsets_ext[g] <= s <
    offsets_ext[g+1]; the offsets row of ``records`` must equal
    offsets_ext[:-1] (counts are consecutive-offset differences). Slots >=
    total are zero. REQUIREMENT: every record with a slot below ``total``
    has count >= 1 up to the last active record (compacted input) — this
    bounds each block's source span to S_BLOCK records. R must be >=
    WINDOW.
    """
    c, r = records.shape
    if s_cap % S_BLOCK != 0:
        raise ValueError(f"s_cap={s_cap} must be a multiple of {S_BLOCK}")
    if r < WINDOW:
        raise ValueError(f"R={r} must be >= {WINDOW}")
    c_pad = ((c + 7) // 8) * 8  # Mosaic DMA slices need 8-aligned sublanes
    if c_pad != c:
        records = jnp.pad(records, ((0, c_pad - c), (0, 0)))
    # Append 128 sentinel records with offset == total: guarantees the last
    # REAL record never sits on a window's final row (whose next-offset
    # boundary would wrap), and gives every real record a successor offset.
    tail = jnp.zeros((c_pad, 128), jnp.float32)
    tail = tail.at[off_row].set(
        jnp.broadcast_to(total.astype(jnp.float32), (128,))
    )
    records = jnp.concatenate([records, tail], axis=1)
    nblocks = s_cap // S_BLOCK
    # Record index containing each block's first slot (clamped into range).
    b_slots = jnp.arange(nblocks, dtype=jnp.int32) * S_BLOCK
    gstart = jnp.clip(
        jnp.searchsorted(offsets_ext, b_slots, side="right").astype(jnp.int32)
        - 1,
        0,
        r - 1,
    )

    kernel = functools.partial(
        _expand_kernel, c_rows=c_pad, off_row=off_row
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (c_pad, S_BLOCK), lambda b, *_: (0, b), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, c_pad, WINDOW), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((c_pad, s_cap), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(s_cap) * WINDOW * c_pad * 2,
            bytes_accessed=int(s_cap) * c_pad * 4 + nblocks * WINDOW * c_pad * 4,
            transcendentals=0,
        ),
    )(total.reshape(1), gstart, records)
    return out[:c] if c_pad != c else out
