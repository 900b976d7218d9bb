"""Pallas segment-sum over gid-sorted gradient streams (the regroup).

TPU-native replacement for atomicAdd gradient accumulation
(/root/reference/cuda/render_backward.cu:207-220): after the backward
kernel's per-pair gradients are payload-sorted by their Gaussian id (the
tile sort's key2 operand, ops/binning.py), each Gaussian's rows occupy one
contiguous run of the stream. This kernel assigns each grid program a block
of G consecutive Gaussian ids, streams that block's value range from HBM in
K-aligned chunks, and extracts per-Gaussian sums with an id-equality
one-hot matmul on the MXU:

    acc (C, G) += values_chunk (C, K) @ onehot (G, K)^T
    onehot[g, j] = (gid_j == block_base + g)

exact in f32 (0/1 weights). Because candidates are generated in ORIGINAL
Gaussian order, the output lands in original order directly — no
back-permutation sort exists anywhere in the gradient path.

The per-block value ranges come from a tiny device-side searchsorted of the
sorted gid column at the G-aligned block bases (a few thousand queries —
NOT a pair-width gather). The gid column rides the value stream as row 0 so
one DMA chain feeds both the one-hot and the summed values.

Values and gid use the TILED stream layout (N/128, C, 128) in HBM so every
chunk DMA is one contiguous transfer; the tiled<->flat conversion is a few
in-VMEM register moves per chunk.

Packed int32 values (the backward kernel's pack_grads form — FOUR packed
words per pair: three bf16 pairs plus one shared-exponent e5s9 rgb triple,
kernels/rasterize.pack_grad_rows) are unpacked per chunk in VMEM; since
every unpacked value is bf16-exact, a SINGLE bf16 x bf16 -> f32 MXU pass
replaces the 3-pass bf16x3 split needed for full-f32 values.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mxu import dot_f32_bf16x3
from .rasterize import GRAD_PACKED_ROWS, unpack_grad_rows

ROWS = 9  # output gradient rows (matches kernels/rasterize.STREAM_ROWS)


def _segsum_kernel(
    # scalar prefetch
    block_lo_ref,  # (B,) int32: first stream slot of each gid block
    block_hi_ref,  # (B,) int32: end slot (== next block_lo when the
    #                stream is globally sorted; wider overlapping ranges
    #                for column-sorted input)
    # inputs
    values_ref,  # (P/128, 1 + in_rows, 128) ANY/HBM, tiled; row 0 = gid
    # outputs
    out_ref,  # (1, ROWS, G) VMEM block (G a multiple of 128 lanes; large
    #           blocks amortize the ~2us/program grid overhead)
    # scratch
    chunk_vmem,  # (2, K/128, 1 + in_rows, 128)
    flat_vmem,  # (1 + in_rows, K)
    acc_vmem,  # (ROWS, G)
    dma_sem,  # (2,)
    *, g_per_block: int, k: int, rows: int, packed: bool,
):
    b = pl.program_id(0)
    g = g_per_block
    start = block_lo_ref[b]
    end = block_hi_ref[b]
    k_tiles = k // 128
    p_cap = values_ref.shape[0] * 128
    lo = start - jax.lax.rem(start, k)
    nchunks = jnp.where(end > lo, (end - lo + k - 1) // k, 0)
    base = (b * g)

    def chunk_dma(j, slot):
        off = jnp.minimum(lo + j * k, p_cap - k)
        return pltpu.make_async_copy(
            values_ref.at[pl.ds(pl.multiple_of(off, k) // 128, k_tiles)],
            chunk_vmem.at[slot],
            dma_sem.at[slot],
        )

    @pl.when(nchunks > 0)
    def _start():
        chunk_dma(0, 0).start()

    acc_vmem[...] = jnp.zeros((rows, g), jnp.float32)
    # (G, 1) columns of this block's gid range for the one-hot broadcast.
    gcol = (
        jax.lax.broadcasted_iota(jnp.int32, (g, 1), 0) + base
    )

    def body(j, _):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < nchunks)
        def _prefetch():
            chunk_dma(j + 1, 1 - slot).start()

        chunk_dma(j, slot).wait()
        ct = chunk_vmem[slot]
        for t in range(k_tiles):  # tiled -> flat: static register moves
            flat_vmem[:, t * 128 : (t + 1) * 128] = ct[t]
        flat = flat_vmem[...]
        if packed:
            gid_row = flat[0:1, :]  # int32 gids
        else:
            gid_row = jax.lax.bitcast_convert_type(flat[0:1, :], jnp.int32)
        chunk = flat[1:, :]
        # Id-equality one-hot: gids are sorted, so out-of-block lanes of a
        # shared boundary chunk simply match nothing here and are summed by
        # the neighbouring block instead (both blocks stream the chunk).
        onehot = jnp.where(gid_row == gcol, 1.0, 0.0)  # (G, K)
        if packed:
            # Every unpacked value is bf16-exact and the one-hot weights
            # are 0/1, so ONE bf16 x bf16 -> f32 MXU pass sums exactly.
            vals = unpack_grad_rows(chunk).astype(jnp.bfloat16)
            acc_vmem[...] += jax.lax.dot_general(
                vals, onehot.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            # bf16x3 split matmul (kernels/mxu.py): f32-grade gradient sums
            # at half the cost of Mosaic's 6-pass HIGHEST precision; DEFAULT
            # would demote the f32 gradients to bf16 on input, silently
            # quantizing every regrouped gradient.
            acc_vmem[...] += dot_f32_bf16x3(
                chunk, onehot, (((1,), (1,)), ((), ()))
            )
        return 0

    jax.lax.fori_loop(0, nchunks, body, 0)
    out_ref[0] = acc_vmem[...]


def segment_sum_by_gid(
    values: jnp.ndarray,  # (ROWS, P) f32 — or (GRAD_PACKED_ROWS, P) int32
    gids: jnp.ndarray,  # (P,) int32 Gaussian ids (sentinel >= n for
    #                     invalid tails): globally NONDECREASING when
    #                     columns == 1, else nondecreasing within each of
    #                     the strided (P/columns, columns) reshape's columns
    n: int,  # number of Gaussians (output columns before padding)
    *,
    g_per_block: int = 512,
    k: int = 1024,
    interpret: bool = False,
    columns: int = 1,
) -> jnp.ndarray:
    """Per-Gaussian sums of a gid-sorted value stream, in id order.

    Returns (ROWS, N_pad) f32 with column g = sum of values[:, j] over
    slots with gids[j] == g; N_pad = n rounded up to g_per_block. Ids >= n
    (invalid-tail sentinels) are never summed. int32 ``values`` are treated
    as packed bf16-pair gradient words (kernels/rasterize.pack_grad_rows)
    and summed into the same (ROWS=9, N_pad) f32 output.

    ``columns > 1`` accepts COLUMN-sorted input (ops/render.py regroup):
    the flat stream read as a row-major (P/columns, columns) matrix is
    nondecreasing down every column. Each column is a strided sample of
    the pair stream, so equal row ranks stay quantile-aligned across
    columns and each gid block's slots still occupy a narrow contiguous
    row band — bounded exactly by per-row min/max searchsorted below. The
    kernel's gid-equality mask makes overlapping bands correct; only the
    streamed volume grows (by the tiny rank spread, ~1-2%).
    """
    p = values.shape[1]
    packed = values.dtype == jnp.int32
    g = g_per_block
    if g % 128 != 0:
        raise ValueError("g_per_block must be a multiple of the 128 lanes")
    if columns > 1 and p % columns != 0:
        raise ValueError("columns must divide the stream length")
    n_pad = ((n + g - 1) // g) * g
    nblocks = n_pad // g
    bases = jnp.arange(nblocks + 1, dtype=jnp.int32) * g
    if columns == 1:
        # First stream slot of each block: a ~(nblocks+1)-query
        # searchsorted over the sorted gid column (queries, not pairs).
        block_lo = jnp.searchsorted(gids, bases, side="left").astype(
            jnp.int32
        )
        block_hi = block_lo[1:]
        block_lo = block_lo[:-1]
    else:
        g2 = gids.reshape(p // columns, columns)
        row_min = jnp.min(g2, axis=1)  # nondecreasing (columns sorted)
        row_max = jnp.max(g2, axis=1)  # nondecreasing
        # Block b's slots live in rows [first row with max >= b*g,
        # first row with min >= (b+1)*g).
        block_lo = (
            jnp.searchsorted(row_max, bases[:-1], side="left")
            .astype(jnp.int32) * columns
        )
        block_hi = (
            jnp.searchsorted(row_min, bases[1:], side="left")
            .astype(jnp.int32) * columns
        )

    # gid rides as value row 0 so one DMA chain feeds one-hot + values
    # (f32 mode bitcasts the ids to ride the f32 stack losslessly).
    if packed:
        stacked = jnp.concatenate([gids[None, :], values], axis=0)
    else:
        stacked = jnp.concatenate(
            [jax.lax.bitcast_convert_type(gids, jnp.float32)[None, :],
             values],
            axis=0,
        )
    if p % k != 0:  # pad the stream to whole chunks (tail is never summed)
        pad = k - p % k
        pad_rows = jnp.zeros((stacked.shape[0], pad), stacked.dtype)
        if packed:
            pad_rows = pad_rows.at[0].set(jnp.int32(1 << 23))
        else:
            pad_rows = pad_rows.at[0].set(
                jax.lax.bitcast_convert_type(
                    jnp.full((pad,), 1 << 23, jnp.int32), jnp.float32
                )
            )
        stacked = jnp.concatenate([stacked, pad_rows], axis=1)
        p += pad
    in_rows = values.shape[0]
    rows = ROWS if packed else in_rows
    tiled = stacked.reshape(1 + in_rows, p // 128, 128).transpose(1, 0, 2)

    kernel = functools.partial(
        _segsum_kernel, g_per_block=g, k=k, rows=rows, packed=packed
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nblocks,),
        in_specs=[
            # HBM (not ANY): small streams fit VMEM where unaligned-sublane
            # memref slices are illegal (see kernels/expand.py).
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, rows, g), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, k // 128, 1 + in_rows, 128), stacked.dtype),
            pltpu.VMEM((1 + in_rows, k), stacked.dtype),
            pltpu.VMEM((rows, g), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nblocks, rows, g), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(p) * g * rows * 2,
            bytes_accessed=int(p) * (1 + in_rows) * 4 + n_pad * rows * 4,
            transcendentals=0,
        ),
    )(block_lo, block_hi, tiled)
    return out.transpose(1, 0, 2).reshape(rows, n_pad)
