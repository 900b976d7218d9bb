"""Tile binning + depth sort (jitted JAX, fixed shapes, no atomics).

TPU-first redesign of the reference's binning stage
(/root/reference/cuda/culling.cu:97-343,386-475), which uses warp-aggregated
atomic pair allocation and a CUB radix sort on a composite double key. Here:

1. Gaussians are argsorted by camera depth z first (invisible -> +inf keys).
2. Per-Gaussian conservative tile spans (the coarse binning square of
   culling.cu:212-219) are expanded into a fixed-capacity candidate array via
   the cumsum-offset/segment-id trick (replacing atomicAdd allocation).
3. The exact OBB-vs-tile separating-axis test (culling.cu:97-165) filters
   candidates.
4. One *stable* sort by tile index yields tile-major, depth-ascending order —
   equivalent to the reference's single radix sort on
   ``z + (max_z+1)*tile_idx`` (culling.cu:294-298,455-470) because candidates
   enter the sort already depth-ordered.
5. Tile ranges come from searchsorted (replacing find_tile_boundaries), and
   each tile's splat list is copied into a *chunk-padded* stream so the Pallas
   rasterizer can DMA fixed-size, tile-private blocks.

TPU performance notes (measured on v5e):
- XLA gather/scatter cost is per-INDEX (~6-15 ns/index), independent of row
  width, so every per-Gaussian value needed at the candidate level is packed
  into ONE (N, 16) f32 record matrix and fetched with a single row gather
  instead of ~10 column gathers.
- ``jax.lax.optimization_barrier`` pins the stage seams; without it XLA fuses
  the gather chain into pathological loop fusions (measured 4-6x slower).
- Row *scatters* are ~8x slower than row gathers on TPU, so the pipeline is
  arranged so that only two element scatters remain (splat_gid, pair_of_cand)
  and the rasterizer backward needs no scatter at all: it regroups per-pair
  gradients into monotone candidate order via ``pair_of_cand`` and reduces
  per-Gaussian segments with a cumsum difference (see ops/render.py).

Everything is fixed-shape: candidate/pair capacities are static; on overflow
pairs are dropped deterministically and ``overflow`` reports the required
size so the host can re-jit with a larger bucket.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_barrier = jax.lax.optimization_barrier


class TileTables(NamedTuple):
    """Sorted, chunk-padded splat stream + per-tile ranges.

    ``pair_of_cand`` / ``cand_start`` / ``cand_end`` / ``inv_order`` exist for
    the rasterizer's scatter-free backward (ops/render.py): candidate slots
    are monotone in depth-ordered Gaussian index, so per-Gaussian gradient
    sums are cumsum differences over candidate-ordered rows.
    """

    splat_gid: jnp.ndarray  # (P_cap,) int32 gaussian index, -1 = padding
    tile_start: jnp.ndarray  # (T,) int32 offset of each tile's chunk block
    tile_count: jnp.ndarray  # (T,) int32 number of REAL splats per tile
    num_pairs: jnp.ndarray  # () int32 — valid (unpadded) pair count
    overflow: jnp.ndarray  # () int32 — required padded capacity (check > P_cap)
    pair_of_cand: jnp.ndarray  # (P_cap,) int32 candidate slot -> pair slot,
    #                            P_cap = dropped/invalid sentinel
    cand_start: jnp.ndarray  # (N,) int32 candidate range start, ORIGINAL order
    cand_end: jnp.ndarray  # (N,) int32 candidate range end (clamped to cap)


def tile_spans(
    uv: jnp.ndarray,
    radius: jnp.ndarray,
    mask: jnp.ndarray,
    num_tiles_x: int,
    num_tiles_y: int,
    tile_size: int,
):
    """Per-Gaussian candidate tile spans: the exact AABB of the OBB.

    The reference's coarse pass uses a bounding square of
    ``ceil(r_major/tile)+1`` tiles (culling.cu:212-219) — loose for small
    Gaussians (>= 5x5 tiles each) and lossy for very large ones (the square
    under-covers the OBB's AABB once r_major(sqrt(2)-1) > tile). We instead
    take the OBB's exact axis-aligned extents
    ``hx = r_major|cos| + r_minor|sin|`` (resp. hy) so the candidate set both
    covers every SAT hit and is ~5x smaller; the exact SAT filter then yields
    the same final pair set.
    """
    u, v = uv[:, 0], uv[:, 1]
    r_major, r_minor = radius[:, 0], radius[:, 1]
    sin_t, cos_t = jnp.abs(radius[:, 2]), jnp.abs(radius[:, 3])
    hx = r_major * cos_t + r_minor * sin_t
    hy = r_major * sin_t + r_minor * cos_t
    tx0 = jnp.floor((u - hx) / tile_size).astype(jnp.int32)
    tx1 = jnp.floor((u + hx) / tile_size).astype(jnp.int32) + 1
    ty0 = jnp.floor((v - hy) / tile_size).astype(jnp.int32)
    ty1 = jnp.floor((v + hy) / tile_size).astype(jnp.int32) + 1
    tx0 = jnp.clip(tx0, 0, num_tiles_x)
    tx1 = jnp.clip(tx1, 0, num_tiles_x)
    ty0 = jnp.clip(ty0, 0, num_tiles_y)
    ty1 = jnp.clip(ty1, 0, num_tiles_y)
    num_x = jnp.maximum(0, tx1 - tx0)
    num_y = jnp.maximum(0, ty1 - ty0)
    counts = jnp.where(mask, num_x * num_y, 0).astype(jnp.int32)
    return tx0, ty0, num_x, num_y, counts


def obb_tile_intersects(
    u: jnp.ndarray,
    v: jnp.ndarray,
    radius: jnp.ndarray,  # (..., 4) [r_major r_minor sin cos]
    tile_x: jnp.ndarray,
    tile_y: jnp.ndarray,
    tile_size: int,
) -> jnp.ndarray:
    """Exact OBB vs axis-aligned tile separating-axis test.

    Vectorized port of the 4-axis SAT of culling.cu:97-165 (x axis, y axis,
    OBB major axis, OBB minor axis) with the OBB corners from compute_obb.
    """
    r_major, r_minor = radius[..., 0], radius[..., 1]
    sin_t, cos_t = radius[..., 2], radius[..., 3]

    v1x = r_major * cos_t
    v1y = r_major * sin_t
    v2x = -r_minor * sin_t
    v2y = r_minor * cos_t

    # Corners: bl, br, tl, tr (culling.cu:157-164).
    blx, bly = u - v1x - v2x, v - v1y - v2y
    brx, bry = u + v1x - v2x, v + v1y - v2y
    tlx, tly = u - v1x + v2x, v - v1y + v2y
    trx, try_ = u + v1x + v2x, v + v1y + v2y

    left = tile_x.astype(jnp.float32) * tile_size
    right = (tile_x + 1).astype(jnp.float32) * tile_size
    top = tile_y.astype(jnp.float32) * tile_size
    bottom = (tile_y + 1).astype(jnp.float32) * tile_size

    # Axis 0: X
    obb_min_x = jnp.minimum(jnp.minimum(blx, brx), jnp.minimum(tlx, trx))
    obb_max_x = jnp.maximum(jnp.maximum(blx, brx), jnp.maximum(tlx, trx))
    ok = (obb_min_x <= right) & (obb_max_x >= left)

    # Axis 1: Y
    obb_min_y = jnp.minimum(jnp.minimum(bly, bry), jnp.minimum(tly, try_))
    obb_max_y = jnp.maximum(jnp.maximum(bly, bry), jnp.maximum(tly, try_))
    ok &= (obb_min_y <= bottom) & (obb_max_y >= top)

    def _axis_test(ax, ay, pa_x, pa_y, pb_x, pb_y):
        t1 = ax * left + ay * top
        t2 = ax * right + ay * top
        t3 = ax * left + ay * bottom
        t4 = ax * right + ay * bottom
        tile_min = jnp.minimum(jnp.minimum(t1, t2), jnp.minimum(t3, t4))
        tile_max = jnp.maximum(jnp.maximum(t1, t2), jnp.maximum(t3, t4))
        o1 = ax * pa_x + ay * pa_y
        o2 = ax * pb_x + ay * pb_y
        obb_min = jnp.minimum(o1, o2)
        obb_max = jnp.maximum(o1, o2)
        return (tile_min <= obb_max) & (tile_max >= obb_min)

    # Axis 2: OBB major axis (br - bl), projections of br and bl corners.
    ok &= _axis_test(brx - blx, bry - bly, brx, bry, blx, bly)
    # Axis 3: OBB minor axis (br - tr), projections of br and tr corners.
    ok &= _axis_test(brx - trx, bry - try_, brx, bry, trx, try_)
    return ok


def _segment_ids(offsets: jnp.ndarray, counts: jnp.ndarray, cap: int):
    """Map candidate slot -> source ROW index, given exclusive offsets.

    Rows with count==0 (e.g. visible Gaussians whose clipped tile span is
    empty) share an offset with their successor and must not shift the
    mapping, so we scatter each non-empty row's index at its segment start
    and take a running max.
    """
    n = offsets.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    dst = jnp.where(counts > 0, offsets, cap)  # empty rows dropped
    marks = jnp.zeros((cap,), jnp.int32).at[dst].max(rows, mode="drop")
    return jax.lax.cummax(marks)  # (cap,) source row per slot


def build_tile_tables(
    uv: jnp.ndarray,
    z: jnp.ndarray,
    radius: jnp.ndarray,
    mask: jnp.ndarray,
    *,
    num_tiles_x: int,
    num_tiles_y: int,
    tile_size: int,
    pair_cap: int,
    chunk_size: int,
) -> TileTables:
    """Full binning pipeline; all inputs dense over the capacity axis.

    Args:
      uv: (N, 2) screen positions. z: (N,) camera depths. radius: (N, 4) OBB
      records. mask: (N,) visibility.
    """
    n = uv.shape[0]
    num_tiles = num_tiles_x * num_tiles_y

    # 1. Depth order (invisible last). Ties broken by index (stable).
    zkey = jnp.where(mask, z, jnp.inf)
    order = jnp.argsort(zkey, stable=True).astype(jnp.int32)  # (N,)

    uv_d = uv[order]
    radius_d = radius[order]
    mask_d = mask[order]

    # 2. Tile spans + candidate expansion in depth order.
    tx0, ty0, num_x, num_y, counts = tile_spans(
        uv_d, radius_d, mask_d, num_tiles_x, num_tiles_y, tile_size
    )
    offsets = jnp.cumsum(counts) - counts  # exclusive
    total_cand = offsets[-1] + counts[-1]

    cap = pair_cap
    slot = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0).squeeze(-1)
    gid_d = _segment_ids(offsets, counts, cap)  # index into depth-ordered rows
    gid_d = _barrier(jnp.clip(gid_d, 0, n - 1))

    # One packed row gather replaces ~10 per-column gathers: gather cost on
    # TPU is per-index, not per-byte. i32 values are exact in f32 (< 2^24).
    rec = _barrier(
        jnp.stack(
            [
                offsets.astype(jnp.float32),
                jnp.maximum(num_y, 1).astype(jnp.float32),
                tx0.astype(jnp.float32),
                ty0.astype(jnp.float32),
                uv_d[:, 0],
                uv_d[:, 1],
                radius_d[:, 0],
                radius_d[:, 1],
                radius_d[:, 2],
                radius_d[:, 3],
                mask_d.astype(jnp.float32),
                order.astype(jnp.float32),
            ],
            axis=1,
        )
    )
    crec = _barrier(rec[gid_d])  # (cap, 12)
    c_off = crec[:, 0].astype(jnp.int32)
    c_ny = crec[:, 1].astype(jnp.int32)
    c_tx0 = crec[:, 2].astype(jnp.int32)
    c_ty0 = crec[:, 3].astype(jnp.int32)
    c_mask = crec[:, 10] > 0.5
    gid_orig = crec[:, 11].astype(jnp.int32)

    within = slot - c_off
    cand_valid = slot < jnp.minimum(total_cand, cap)
    # Reference enumeration order: tile_x outer, tile_y inner
    # (culling.cu:237-243); irrelevant after the sort but kept for parity.
    tile_x = c_tx0 + within // c_ny
    tile_y = c_ty0 + within % c_ny

    # 3. Exact OBB-vs-tile test.
    hits = obb_tile_intersects(
        crec[:, 4], crec[:, 5], crec[:, 6:10], tile_x, tile_y, tile_size
    )
    valid = cand_valid & hits & c_mask

    tile_idx = tile_y * num_tiles_x + tile_x
    key = _barrier(
        jnp.where(valid, tile_idx, num_tiles).astype(jnp.int32)
    )

    # 4. Stable sort by tile: candidates are already depth-ordered, so this
    # yields (tile-major, depth-ascending) — the reference's composite key.
    # ``slot`` rides along so the backward can map pair slots back to
    # monotone candidate order without any scatter.
    key_sorted, gid_sorted, cand_sorted = jax.lax.sort(
        (key, gid_orig, slot), dimension=0, is_stable=True, num_keys=1
    )
    key_sorted, gid_sorted, cand_sorted = _barrier(
        (key_sorted, gid_sorted, cand_sorted)
    )

    # 5. Tile ranges via searchsorted over the sorted keys.
    bounds = jnp.searchsorted(
        key_sorted, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    tile_start_raw = bounds[:-1]
    tile_count = bounds[1:] - bounds[:-1]
    num_pairs = bounds[-1]

    # 6. Chunk-padded stream: each tile's block is rounded up to chunk_size so
    # Pallas programs own disjoint, aligned slots.
    padded = ((tile_count + chunk_size - 1) // chunk_size) * chunk_size
    tile_start = jnp.cumsum(padded) - padded  # exclusive
    total_padded = tile_start[-1] + padded[-1]

    # dst = tile_start[t] + (slot - tile_start_raw[t]) = slot + delta[t],
    # where delta = cumulative chunk padding — NON-DECREASING in t. Two 4M
    # gathers from the (T,) tables would cost ~60 ms (gather is per-index);
    # instead scatter delta at each tile's first sorted slot and cummax.
    delta = tile_start - tile_start_raw  # (T,) non-decreasing
    dmarks = jnp.zeros((cap,), jnp.int32).at[tile_start_raw].max(
        delta, mode="drop"
    )
    dst = slot + jax.lax.cummax(dmarks)
    in_range = (key_sorted < num_tiles) & (dst < cap)
    dst = _barrier(jnp.where(in_range, dst, cap))  # out-of-bounds -> dropped

    splat_gid = jnp.full((cap,), -1, jnp.int32)
    splat_gid = splat_gid.at[dst].set(
        jnp.where(in_range, gid_sorted, -1), mode="drop"
    )

    # Candidate slot -> pair slot (cap = sentinel for dropped candidates).
    pair_of_cand = jnp.full((cap,), cap, jnp.int32)
    pair_of_cand = pair_of_cand.at[
        jnp.where(in_range, cand_sorted, cap)
    ].set(dst, mode="drop")

    # Candidate ranges scattered back to ORIGINAL Gaussian order so the
    # rasterizer backward needs no final reorder (one small scatter here is
    # cheaper than an (N,16) row gather there).
    cand_start = (
        jnp.zeros((n,), jnp.int32).at[order].set(jnp.minimum(offsets, cap))
    )
    cand_end = (
        jnp.zeros((n,), jnp.int32)
        .at[order]
        .set(jnp.minimum(offsets + counts, cap))
    )

    overflow = jnp.maximum(total_padded, total_cand).astype(jnp.int32)
    return TileTables(
        splat_gid=splat_gid,
        tile_start=tile_start,
        tile_count=tile_count,
        num_pairs=num_pairs,
        overflow=overflow,
        pair_of_cand=pair_of_cand,
        cand_start=cand_start,
        cand_end=cand_end,
    )
