"""Pallas segment-sum over contiguous value ranges (the gradient regroup).

TPU-native replacement for the XLA cumsum + boundary-gather reduction in the
rasterizer backward (see ops/render.py): after the regroup sort, each
Gaussian's per-pair gradient rows occupy ONE contiguous slot range
[bounds[g], bounds[g+1]) of the candidate stream, with ranges monotone in
depth-compacted Gaussian rank. The XLA formulation (exclusive cumsum of the
(P, 9) stream + csum[end] - csum[start] row gathers) moves ~100 B/pair
through gathers whose cost grows with source bytes (~66 ms at P=6.5M on
v5e). This kernel instead assigns each grid program a block of G Gaussians,
streams that block's candidate range from HBM in K-aligned chunks, and
extracts per-Gaussian sums with a one-hot membership matmul on the MXU:

    acc (C, G) += values_chunk (C, K) @ onehot (G, K)^T

where onehot[g, j] = bounds[g] <= j_global < bounds[g+1] — exact in f32
(each output element sums values selected by exact 0/1 weights).

The reference CUDA has no counterpart stage (it scatter-adds with atomics,
render_backward.cu:207-220); this kernel + one payload sort IS the TPU
equivalent of that atomic accumulation.

Values and outputs use the TILED stream layout (N/128, C, 128) in HBM so
every chunk DMA and block write is one contiguous transfer (the flat
(C, N) layout cost ~12 ms of pure strided DMA at this scale); the
tiled<->flat conversion is a few in-VMEM register moves per chunk.

Packed int32 values (the backward kernel's pack_grads form — five bf16-pair
words per pair, kernels/rasterize.pack_grad_rows) are unpacked per chunk in
VMEM; since every unpacked value is bf16-exact, a SINGLE bf16 x bf16 -> f32
MXU pass replaces the 3-pass bf16x3 split needed for full-f32 values.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mxu import dot_f32_bf16x3
from .rasterize import GRAD_PACKED_ROWS, unpack_grad_rows

ROWS = 9  # value stream rows (matches kernels/rasterize.STREAM_ROWS)


def _segsum_kernel(
    # scalar prefetch
    block_lo_ref,  # (B+1,) int32: bounds[b*G] at block starts
    # inputs
    values_ref,  # (P/128, ROWS, 128) ANY/HBM, tiled layout
    bounds_ref,  # (1, G) VMEM block: bounds[b*G : b*G + G]
    # outputs
    out_ref,  # (1, ROWS, G) VMEM block (G a multiple of 128 lanes; large
    #           blocks amortize the ~2us/program grid overhead)
    # scratch
    chunk_vmem,  # (2, K/128, in_rows, 128)
    flat_vmem,  # (in_rows, K)
    acc_vmem,  # (ROWS, G)
    dma_sem,  # (2,)
    *, g_per_block: int, k: int, rows: int, packed: bool,
):
    b = pl.program_id(0)
    g = g_per_block
    start = block_lo_ref[b]
    end = block_lo_ref[b + 1]
    k_tiles = k // 128
    p_cap = values_ref.shape[0] * 128
    lo = start - jax.lax.rem(start, k)
    nchunks = jnp.where(end > lo, (end - lo + k - 1) // k, 0)

    # Range starts (G,) for this block's Gaussians; range ends are the next
    # start (ranges tile the stream), with the block's last end coming from
    # the prefetched block-start table.
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, g), 1)
    lo_row = bounds_ref[0:1, :].astype(jnp.float32)
    hi_row = jnp.where(
        lane == g - 1,
        jnp.float32(end),
        pltpu.roll(lo_row, g - 1, 1),  # left-roll by 1: bounds[g+1]
    )
    # (G, 1) columns for the one-hot broadcast (small one-time transpose).
    b0 = lo_row.reshape(g, 1)
    b1 = hi_row.reshape(g, 1)

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

    def body(j, _):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < nchunks)
        def _prefetch():
            chunk_dma(j + 1, 1 - slot).start()

        chunk_dma(j, slot).wait()
        ct = chunk_vmem[slot]
        for t in range(k_tiles):  # tiled -> flat: static register moves
            flat_vmem[:, t * 128 : (t + 1) * 128] = ct[t]
        chunk = flat_vmem[...]
        # Global slot index of each lane, as f32 (exact below 2^24 — the
        # pair cap is statically checked against that in ops/binning.py).
        j_glob = (
            jax.lax.broadcasted_iota(jnp.int32, (1, k), 1) + (lo + j * k)
        ).astype(jnp.float32)
        onehot = jnp.where((j_glob >= b0) & (j_glob < b1), 1.0, 0.0)  # (G, K)
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


def segment_sum_ranges(
    values: jnp.ndarray,  # (ROWS, P) f32 — or (GRAD_PACKED_ROWS, P) int32
    bounds: jnp.ndarray,  # (N + 1,) int32 nondecreasing range boundaries
    *,
    g_per_block: int = 512,
    k: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-range sums of a contiguous value stream.

    Returns (ROWS, N_pad) with column g = sum of values[:, bounds[g]:
    bounds[g+1]), N_pad = N rounded up to g_per_block. bounds must be
    nondecreasing with bounds[N] <= P (ranges tile the stream; empty ranges
    yield zero columns). int32 ``values`` are treated as packed bf16-pair
    gradient words (kernels/rasterize.pack_grad_rows) and summed into the
    same (ROWS=9, N_pad) f32 output.
    """
    n = bounds.shape[0] - 1
    p = values.shape[1]
    packed = values.dtype == jnp.int32
    if p % k != 0:  # pad the stream to whole chunks (tail is never summed)
        pad = k - p % k
        values = jnp.pad(values, ((0, 0), (0, pad)))
        p += pad
    in_rows = values.shape[0]
    rows = ROWS if packed else in_rows
    tiled = values.reshape(in_rows, p // 128, 128).transpose(1, 0, 2)
    g = g_per_block
    if g % 128 != 0:
        raise ValueError("g_per_block must be a multiple of the 128 lanes")
    n_pad = ((n + g - 1) // g) * g
    nblocks = n_pad // g
    # Pad to n_pad + g entries (whole blocks; padding ranges are empty).
    bounds_pad = jnp.concatenate(
        [
            bounds.astype(jnp.int32),
            jnp.full((n_pad + g - (n + 1),), bounds[-1], jnp.int32),
        ]
    )
    block_lo = bounds_pad[::g]  # (nblocks + 1,)

    kernel = functools.partial(
        _segsum_kernel, g_per_block=g, k=k, rows=rows, packed=packed
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[
            # HBM (not ANY): small streams fit VMEM where unaligned-sublane
            # memref slices are illegal (see kernels/expand.py).
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(
                (1, g), lambda b, *_: (0, b), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, rows, g), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, k // 128, in_rows, 128), values.dtype),
            pltpu.VMEM((in_rows, k), values.dtype),
            pltpu.VMEM((rows, g), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad // g, rows, g), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(p) * g * rows * 2,
            bytes_accessed=int(p) * in_rows * 4 + n_pad * rows * 4,
            transcendentals=0,
        ),
    )(block_lo, tiled, bounds_pad.reshape(1, -1))
    return out.transpose(1, 0, 2).reshape(rows, n_pad)
