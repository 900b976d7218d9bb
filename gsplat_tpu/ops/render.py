"""Differentiable tile rasterization op (custom VJP around the Pallas kernels).

Architecture: the custom-gradient boundary is (per-Gaussian attribute matrix)
-> (tile pixels). The forward consumes the pair attribute stream built by
binning (the attribute payload rides binning's expansion and tile sort —
per-operand cost, so the extra width is nearly free).

The backward replaces the reference's atomicAdd accumulation
(render_backward.cu:207-220) — and the row scatter-add XLA's AD would emit,
which measures ~8x slower than a gather on TPU (and gathers are themselves
unusable at pair width) — with a scatter-free, gather-free reduction that
exploits the binning structure:

  per-pair grads, 5 packed bf16-pair int32 words from the backward kernel
  (kernels/rasterize.pack_grad_rows; uv scale folded in-kernel)
  --payload SORT keyed by splat_gid (the tile sort's Gaussian-id key2)-->
  Gaussian-id order == ORIGINAL parameter order (binning enumerates
  candidates Gaussian-major), so per-Gaussian sums are id-equality runs
  reduced by the Pallas one-hot-MXU segment-sum (kernels/segsum.py,
  unpacking per chunk in VMEM) directly into original order — no back-
  permutation exists anywhere in the chain, and no full-size XLA
  pack/unpack/scale pass touches the P_cap-wide gradient stream.

Gradient conventions (reference parity, SURVEY §2.4 D11):
- uv cotangents are scaled by 0.5*W / 0.5*H inside the backward
  (render_backward.cu:186-187). Projection AD then applies the full W/2 chain
  again, reproducing the reference's double-scaled xyz gradient path, and the
  densification accumulator consumes these scaled uv grads.
- the 0.99 alpha clamp and the power<=0 clamp are ignored in the backward,
  as in the reference.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels import rasterize as _k
from ..kernels.segsum import segment_sum_by_gid
from .binning import TileTables

_barrier = jax.lax.optimization_barrier

# Columns for the gradient-regroup sort (see bwd below). A strided column
# sort (e.g. 512 columns) is ~3x cheaper than the flat sort on v5e, and the
# segment sum is order-agnostic across columns — but MEASURED end-to-end it
# LOSES badly: after column-sorting the real pair distribution, a gid
# block's slots spread over a 23-33K-gid row band (rank spread of 512
# independent order statistics), so segsum's per-block streamed volume and
# DMA count explode ~20x (142 ms vs 36 ms for the flat chain at 5.8M).
# Default 1 = flat sort. The columns= plumbing in segsum stays (tested) for
# distributions with tighter rank alignment.
import os as _os

from ..kernels.sort import S_BLOCK as _SS_BLOCK, sample_sort

REGROUP_COLS = int(_os.environ.get("GSPLAT_REGROUP_COLS", "1"))
_USE_SAMPLE_SORT = _os.environ.get("GSPLAT_SAMPLE_SORT", "1") == "1"


def default_interpret() -> bool:
    return jax.default_backend() != "tpu"


class RenderOutput(NamedTuple):
    image: jnp.ndarray  # (H, W, 3) cropped
    t_final: jnp.ndarray  # (T, PIX)
    n_splats: jnp.ndarray  # (T, PIX) float32 counts


@functools.lru_cache(maxsize=64)
def _get_raster_op(num_tiles_x, num_tiles, tile, k, interpret,
                   grad_scale_wh=None, bf16_grads=True):
    """Build the custom-VJP op for a static (grid, tile, chunk) geometry.

    op(attrs, tables, bg) -> (T, 8, PIX) tile pixels. Differentiable w.r.t.
    ``attrs`` (rows [u v c00 c01 c11 opa r g b 0...]) and ``bg``.

    CONTRACT: ``tables`` must come from build_tile_tables called with the
    numerically identical ``attrs``; the forward reads tables.stream (the
    pre-gathered pair rows) while the VJP is defined w.r.t. ``attrs``.
    """

    def kernel_fwd(tables: TileTables, bg):
        return _k.rasterize_forward(
            tables.stream, tables.tile_start, tables.tile_count, bg,
            num_tiles_x=num_tiles_x, num_tiles=num_tiles, tile=tile, k=k,
            interpret=interpret,
        )

    @jax.custom_vjp
    def op(attrs, tables: TileTables, bg):
        del attrs  # values already in tables.stream (see CONTRACT)
        return kernel_fwd(tables, bg)

    def fwd(attrs, tables: TileTables, bg):
        out = kernel_fwd(tables, bg)
        return out, (tables, bg, out, attrs.shape[0])

    def bwd(res, ct):
        tables, bg, out, n = res
        tile_start, tile_count = tables.tile_start, tables.tile_count
        stream = tables.stream
        di = ct[:, 0:3, :]  # (T, 3, PIX) image cotangent
        tfin = out[:, 3:4, :]
        nspl = out[:, 4:5, :]
        bgdot = bg * jnp.sum(di, axis=1, keepdims=True)
        pix_stream = jnp.concatenate(
            [di, tfin, nspl, bgdot, jnp.zeros_like(di[:, :2, :])], axis=1
        )
        tile_maxn = jnp.max(out[:, 4, :], axis=1).astype(jnp.int32)
        # Reference uv-gradient convention: x(0.5*W), x(0.5*H)
        # (render_backward.cu:186-187), folded into the kernel.
        # Overridable for tile-sharded rendering, where the local grid is
        # a strip of the global image.
        if grad_scale_wh is not None:
            w_img, h_img = grad_scale_wh
        else:
            w_img = num_tiles_x * tile
            h_img = (num_tiles // num_tiles_x) * tile
        grad_tiled, side = _k.rasterize_backward(
            stream, pix_stream, tile_start, tile_count, tile_maxn,
            num_tiles_x=num_tiles_x, num_tiles=num_tiles, tile=tile, k=k,
            interpret=interpret, pack_grads=bf16_grads,
            grad_scale=(0.5 * w_img, 0.5 * h_img),
        )  # grad_tiled: (P/128, 9|5, 128) tiled layout (f32 | packed i32)
        p_cap = stream.shape[0] * 128
        kt = k // 128
        # The kernel writes only each tile's main chunks up to its
        # deepest-needed splat (tile_maxn); every other chunk is
        # uninitialized garbage. Zero them with a union-of-intervals mask
        # (two T-sized scatters + one cumsum — doing this in the kernel
        # cost a serial start/wait DMA pair per skipped chunk). Must happen
        # BEFORE the side-add: an unaligned tile's head-chunk grads must
        # survive even when the chunk's owner never reached it.
        lo_t = tile_start - jax.lax.rem(tile_start, k)
        used_t = (tile_start + tile_maxn - lo_t + k - 1) // k
        a_t = lo_t + jnp.where(tile_start == lo_t, 0, k)
        b_t = jnp.maximum(lo_t + used_t * k, a_t)
        marks = jnp.zeros((p_cap // 128 + 1,), jnp.int32)
        marks = marks.at[a_t // 128].add(1)
        marks = marks.at[b_t // 128].add(-1)
        covered = jnp.cumsum(marks[:-1]) > 0
        # where(), not multiply: uninitialized chunks may hold NaN bit
        # patterns and NaN * 0 would survive into the regroup.
        grad_tiled = jnp.where(
            covered[:, None, None], grad_tiled,
            jnp.zeros((), grad_tiled.dtype),
        )
        # Add back each unaligned tile's head-chunk gradients (the chunk is
        # owned by the previous tile; side is zeros for aligned tiles).
        side_t = side.reshape(
            num_tiles, _k.STREAM_ROWS, kt, 128
        ).transpose(0, 2, 1, 3)
        from ..kernels.packing import (
            GRAD_E5_BIAS, pack_bf16_pair, pack_rgb_e5, unpack_bf16_pair,
            unpack_rgb_e5,
        )

        if bf16_grads:
            # Packed main stream: combine in f32 on the affected chunks
            # only (unpack -> add -> repack). Several tiles can share one
            # head chunk, so side buffers are first summed per UNIQUE chunk
            # (head chunks are nondecreasing -> duplicates are adjacent
            # runs; rank = run index) and each unique chunk is rewritten
            # once — a duplicate-index .set would race. Dead rank rows get
            # an out-of-bounds index: JAX drops OOB scatter updates (and
            # clamps the paired gather, whose result is unused). All-T
            # sized ops: ~num_tiles*9*128 elements, a few hundred us.
            hc = tile_start // k  # (T,) head chunk group, nondecreasing
            is_new = jnp.concatenate(
                [jnp.ones((1,), bool), hc[1:] != hc[:-1]]
            )
            rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1
            nuniq = rank[-1] + 1
            live = jnp.arange(num_tiles, dtype=jnp.int32) < nuniq
            uniq_hc = jnp.zeros((num_tiles,), jnp.int32).at[rank].set(hc)
            uniq_hc = jnp.where(live, uniq_hc, p_cap // k)  # dead -> OOB
            for tt in range(kt):
                ssum = (
                    jnp.zeros((num_tiles, _k.STREAM_ROWS, 128), jnp.float32)
                    .at[rank].add(side_t[:, tt])
                )
                ssum = jnp.where(live[:, None, None], ssum, 0.0)
                idx = uniq_hc * kt + tt
                mw = grad_tiled.at[idx].get(mode="clip")  # (T, 4, 128) i32
                c = []
                for i in range(3):
                    hi, lo = unpack_bf16_pair(mw[:, i])
                    c += [hi + ssum[:, 2 * i], lo + ssum[:, 2 * i + 1]]
                rgb3 = unpack_rgb_e5(mw[:, 3], bias=GRAD_E5_BIAS)
                c += [rgb3[j] + ssum[:, 6 + j] for j in range(3)]
                repacked = jnp.stack(
                    [pack_bf16_pair(c[2 * i], c[2 * i + 1])
                     for i in range(3)]
                    + [pack_rgb_e5(c[6], c[7], c[8], bias=GRAD_E5_BIAS)],
                    axis=1,
                )  # (T, 4, 128) i32
                grad_tiled = grad_tiled.at[idx].set(repacked, mode="drop")
            grad_rows = _k.GRAD_PACKED_ROWS
        else:
            head_tile = (tile_start // k) * kt
            for tt in range(kt):
                grad_tiled = grad_tiled.at[head_tile + tt].add(side_t[:, tt])
            grad_rows = _k.STREAM_ROWS
        grad_stream = _barrier(
            grad_tiled.transpose(1, 0, 2).reshape(grad_rows, p_cap)
        )

        # Scatter-free, gather-free pair->Gaussian reduction: a payload
        # sort regroups per-pair grads by Gaussian id (splat_gid is the
        # tile sort's key2), then the Pallas id-equality segment-sum
        # (one-hot MXU, kernels/segsum.py) emits per-Gaussian sums
        # directly in original order. Sort cost is per-OPERAND, so by
        # default the 9 gradient rows ride as the backward kernel's 4
        # packed int32 words VERBATIM (no XLA pack/unpack passes at P_cap;
        # segsum unpacks per chunk in VMEM); parity/FD tests pass
        # bf16_grads=False for exact f32.
        #
        # The sort runs as REGROUP_COLS independent COLUMN sorts over the
        # strided (P/C, C) reshape — ~3x cheaper than a flat sort on TPU
        # (the comparator network is log^2(P/C) deep instead of log^2(P),
        # fully lane-vectorized). Summation needs no global order: each
        # column is a uniform strided sample, every column ends up
        # gid-ascending, and segsum bounds each gid block's row range via
        # per-row min/max (see segment_sum_by_gid columns=).
        gid_key = jnp.where(
            tables.splat_gid < 0, jnp.int32(1 << 23), tables.splat_gid
        )
        ops = (gid_key,) + tuple(grad_stream[i] for i in range(grad_rows))
        if (_USE_SAMPLE_SORT and p_cap % _SS_BLOCK == 0
                and not interpret):
            # In-VMEM bitonic samplesort (kernels/sort.py): ~O(1) HBM
            # passes instead of lax.sort's comparator-network re-streams.
            # gid duplicates regroup in arbitrary within-id order — the
            # segment-sum is order-agnostic inside an id run. A range
            # overflow (probability ~0) would drop gradient rows for one
            # step; it cannot corrupt memory (partition clamps) and the
            # binning-side overflow trips first at the same cap.
            regrouped, _ss_ovf = sample_sort(
                ops, num_keys=1, interpret=interpret
            )
            regrouped = _barrier(list(regrouped))
            cols = 1
        else:
            cols = REGROUP_COLS if p_cap % REGROUP_COLS == 0 else 1
            if cols > 1:
                ops = tuple(x.reshape(p_cap // cols, cols) for x in ops)
            regrouped = jax.lax.sort(
                ops, dimension=0, is_stable=False, num_keys=1
            )
            if cols > 1:
                regrouped = [x.reshape(p_cap) for x in regrouped]
            regrouped = _barrier(list(regrouped))
        sums = segment_sum_by_gid(
            jnp.stack(regrouped[1:], axis=0), regrouped[0], n,
            interpret=interpret, columns=cols,
        )  # (9, N_pad) f32, ORIGINAL Gaussian order
        d_attrs = _barrier(sums[:, :n].T)

        f0 = jax.tree_util.tree_map(
            lambda x: np.zeros(x.shape, jax.dtypes.float0), tables
        )
        return (d_attrs, f0, jnp.zeros_like(bg))

    op.defvjp(fwd, bwd)
    return op


def pack_attrs(
    uv: jnp.ndarray,
    conic: jnp.ndarray,
    rgb: jnp.ndarray,
    opacity_logit: jnp.ndarray,
) -> jnp.ndarray:
    """Per-Gaussian (N, 9) attribute rows [u v c00 c01 c11 opa r g b].

    Plain jnp (differentiable): AD through the stack is dense elementwise.
    The sigmoid here realizes the opacity chain o(1-o) of
    render_backward.cu:154 via AD.
    """
    n = uv.shape[0]
    opa = jax.nn.sigmoid(opacity_logit)
    cols = [
        uv[:, 0], uv[:, 1],
        conic[:, 0], conic[:, 1], conic[:, 2],
        opa,
        rgb[:, 0], rgb[:, 1], rgb[:, 2],
    ]
    pad = [jnp.zeros((n,), uv.dtype)] * (_k.STREAM_ROWS - len(cols))
    return jnp.stack(cols + pad, axis=1)


def tiles_to_image(
    out_tiles: jnp.ndarray,
    num_tiles_x: int,
    num_tiles_y: int,
    tile: int,
    width: int,
    height: int,
) -> jnp.ndarray:
    """(T, 3, PIX) tile pixels -> cropped (H, W, 3) image."""
    x = out_tiles.reshape(num_tiles_y, num_tiles_x, 3, tile, tile)
    x = x.transpose(0, 3, 1, 4, 2)  # (ty, py, tx, px, 3)
    x = x.reshape(num_tiles_y * tile, num_tiles_x * tile, 3)
    return x[:height, :width, :]


def rasterize(
    uv: jnp.ndarray,
    conic: jnp.ndarray,
    rgb: jnp.ndarray,
    opacity_logit: jnp.ndarray,
    tables: TileTables,
    bg: jnp.ndarray,
    *,
    width: int,
    height: int,
    tile: int,
    chunk: int,
    interpret: bool | None = None,
    grad_scale_wh: tuple[int, int] | None = None,
    bf16_grads: bool = True,
) -> RenderOutput:
    """Render the image; differentiable w.r.t. (uv, conic, rgb, opacity).

    ``tables`` must come from build_tile_tables with
    ``attrs=pack_attrs(uv, conic, rgb, opacity_logit)`` (same values).
    """
    if interpret is None:
        interpret = default_interpret()
    num_tiles_x = (width + tile - 1) // tile
    num_tiles_y = (height + tile - 1) // tile
    num_tiles = num_tiles_x * num_tiles_y

    attrs = pack_attrs(uv, conic, rgb, opacity_logit)
    op = _get_raster_op(num_tiles_x, num_tiles, tile, chunk, bool(interpret),
                        grad_scale_wh, bf16_grads)
    out = op(attrs, tables, jnp.asarray(bg, jnp.float32))
    image = tiles_to_image(
        out[:, 0:3, :], num_tiles_x, num_tiles_y, tile, width, height
    )
    t_final = jax.lax.stop_gradient(out[:, 3, :])
    n_splats = jax.lax.stop_gradient(out[:, 4, :])
    return RenderOutput(image=image, t_final=t_final, n_splats=n_splats)
