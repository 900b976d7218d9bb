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

where onehot[r, j] = offsets[r] <= slot_j < offsets[r+1] — counts are
offset DIFFERENCES, so no counts column rides the records — exact in f32
(0/1 weights select exactly one source record per output column).

Layout: records and outputs use the TILED stream layout (N/128, C, 128):
a 128-record window tile is one CONTIGUOUS (C, 128) block in HBM. The flat
(C, N) layout measured 12+ ms of pure DMA at 6.8M slots — every (C, W)
window was C strided ~2.5KB segments; tiling turns each window into one
~40KB contiguous transfer and the copy-out into contiguous block writes
(the in-VMEM tiled<->flat assembly is a handful of register moves).
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
LANE = 128
W_TILES = WINDOW // LANE
S_TILES = S_BLOCK // LANE


def _expand_kernel(
    # scalar prefetch
    total_ref,  # (1,) int32: number of valid output slots
    gstart_ref,  # (nblocks,) int32: record index at each block's first slot
    # inputs
    records_ref,  # (T, C, 128) ANY/HBM, tiled layout
    # outputs
    out_ref,  # (S_TILES, C, 128) VMEM block, tiled layout
    # scratch
    win_vmem,  # (2, W_TILES, C, 128)
    flat_vmem,  # (C, WINDOW)
    dma_sem,  # (2,)
    *, c_rows: int, off_row: int,
):
    b = pl.program_id(0)
    nblocks = pl.num_programs(0)
    total = total_ref[0]
    t_cap = records_ref.shape[0]
    s0 = b * S_BLOCK

    def win_dma(blk):
        g = gstart_ref[blk]
        t0 = jnp.clip(g // LANE, 0, t_cap - W_TILES)
        slot = jax.lax.rem(blk, 2)
        return pltpu.make_async_copy(
            records_ref.at[pl.ds(t0, W_TILES)],
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
        wt = win_vmem[jax.lax.rem(b, 2)]
        for t in range(W_TILES):  # tiled -> flat: static register moves
            flat_vmem[:, t * LANE : (t + 1) * LANE] = wt[t]
        win = flat_vmem[...]
        # Global slot index of each output lane (f32 exact: slot indices
        # < 2^24 by the caller's static check).
        s_glob = (
            jax.lax.broadcasted_iota(jnp.int32, (1, S_BLOCK), 1) + s0
        ).astype(jnp.float32)
        # Record r owns slots [off_r, off_{r+1}); the next offset is a
        # 1-lane roll. The circular wrap puts off_0 into row W-1, but the
        # caller's sentinel tail guarantees the last REAL record never sits
        # on row W-1, and the wrapped row's own test
        # (off_{W-1} <= s < off_0) is always false.
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
        out = dot_f32_bf16x3(win, onehot, (((1,), (0,)), ((), ())))
        for s in range(S_TILES):  # flat -> tiled
            out_ref[s] = out[:, s * LANE : (s + 1) * LANE]

    @pl.when(s0 >= total)
    def _tail():
        out_ref[...] = jnp.zeros((S_TILES, c_rows, LANE), jnp.float32)


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
    bounds each block's source span to S_BLOCK records.

    Input/output are logically flat (C, N); the tiled HBM layout is an
    internal detail (XLA fuses the reshapes into producers/consumers).
    """
    c, r = records.shape
    if s_cap % S_BLOCK != 0:
        raise ValueError(f"s_cap={s_cap} must be a multiple of {S_BLOCK}")
    c_pad = ((c + 7) // 8) * 8  # sublane-aligned record rows
    if c_pad != c:
        records = jnp.pad(records, ((0, c_pad - c), (0, 0)))
    # Append sentinel records with offset == total: guarantees the last
    # REAL record never sits on a window's final row (whose next-offset
    # boundary would wrap), gives every real record a successor offset,
    # pads R to whole 128-lane tiles, and keeps R >= WINDOW.
    pad_r = max(WINDOW - r, 128) + (-(r + 128) % LANE)
    tail = jnp.zeros((c_pad, pad_r), jnp.float32)
    tail = tail.at[off_row].set(
        jnp.broadcast_to(total.astype(jnp.float32), (pad_r,))
    )
    records = jnp.concatenate([records, tail], axis=1)
    r_pad = r + pad_r
    tiled = records.reshape(c_pad, r_pad // LANE, LANE).transpose(1, 0, 2)

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
            (S_TILES, c_pad, LANE), lambda b, *_: (b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, W_TILES, c_pad, LANE), jnp.float32),
            pltpu.VMEM((c_pad, WINDOW), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (s_cap // LANE, c_pad, LANE), jnp.float32
        ),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(s_cap) * WINDOW * c_pad * 2,
            bytes_accessed=int(s_cap) * c_pad * 4 + nblocks * WINDOW * c_pad * 4,
            transcendentals=0,
        ),
    )(total.reshape(1), gstart, tiled)
    return out.transpose(1, 0, 2).reshape(c_pad, s_cap)[:c]
