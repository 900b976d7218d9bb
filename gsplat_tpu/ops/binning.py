"""Tile binning + depth sort (jitted JAX, fixed shapes, no atomics).

TPU-first redesign of the reference's binning stage
(/root/reference/cuda/culling.cu:97-343,386-475), which uses warp-aggregated
atomic pair allocation and a CUB radix sort on a composite double key. Here:

1. Gaussians are argsorted by camera depth z first (invisible -> +inf keys).
2. EXACT two-level expansion: level 1 enumerates each Gaussian's tile ROWS
   (y-AABB); level 2 computes the exact x-interval of the OBB within each
   16px strip in closed form (fuzz-verified equal to the reference's 4-axis
   SAT, culling.cu:97-165) — candidates EQUAL true pairs, so nothing is ever
   conservatively over-enumerated or filtered afterwards. Expansion uses the
   cumsum-offset/segment-id trick (replacing atomicAdd allocation).
3. One *stable* sort by tile index yields tile-major, depth-ascending order —
   equivalent to the reference's single radix sort on
   ``z + (max_z+1)*tile_idx`` (culling.cu:294-298,455-470) because candidates
   enter the sort already depth-ordered. The 9 attribute columns ride the
   sort as payload and become the pair stream; the pre-sort candidate slot
   rides along as the backward's inverse-permutation record.
4. Tile ranges come from searchsorted (replacing find_tile_boundaries);
   pair slot == sorted slot (the Pallas kernels handle unaligned ranges),
   so no remap scatter and no chunk padding exist.

TPU performance notes (measured on v5e):
- XLA gather/scatter cost is per-INDEX (~6-40 ns) and grows with SOURCE
  byte size, so every per-Gaussian value needed at each expansion level is
  packed into ONE record matrix and fetched with a single row gather, and
  the attribute payload is gathered from the small (N, 9) source rather
  than carried through the (wider, slower) expansion records.
- ``jax.lax.optimization_barrier`` pins the stage seams; without it XLA
  fuses the gather chain into pathological loop fusions (measured 4-6x
  slower).
- Sorts are cheap (~1.5 ns/element even with many payload operands); row
  scatters are ~8x a gather. Permutations are therefore applied by payload
  SORTS, and the only scatters left are small (segment marks, candidate
  ranges).

Everything is fixed-shape: capacities are static; on overflow pairs are
dropped deterministically and ``overflow`` reports the required size so the
host can re-jit with a larger bucket (2^19-granular, see
train/state.round_pair_cap).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_barrier = jax.lax.optimization_barrier


class TileTables(NamedTuple):
    """Sorted splat attribute stream + per-tile ranges.

    ``stream`` carries the per-pair attribute rows, built by fusing the
    attribute payload through the expansion gathers and the tile sort (the
    payload rides the sort at ~1.5 ns/element, vs ~20 ns/index for a
    post-hoc gather).

    ``cand_of_pair`` / ``cand_start`` / ``cand_end`` exist for the
    rasterizer's scatter-free backward (ops/render.py): candidate order is
    monotone in depth-ranked Gaussian id, and — because the exact
    enumeration makes candidates == pairs — ``cand_of_pair`` is a
    permutation, so per-pair gradients regroup to candidate order with one
    payload SORT, and per-Gaussian sums are cumsum differences at
    [cand_start, cand_end).
    """

    splat_gid: jnp.ndarray  # (P_cap,) int32 gaussian index, -1 = invalid tail
    tile_start: jnp.ndarray  # (T,) int32 first pair slot of each tile
    tile_count: jnp.ndarray  # (T,) int32 number of splats per tile
    num_pairs: jnp.ndarray  # () int32 — valid pair count
    overflow: jnp.ndarray  # () int32 — required capacity (check > P_cap)
    cand_of_pair: jnp.ndarray  # (P_cap,) int32 pair slot -> candidate slot
    #                            (a permutation of [0, P_cap))
    cand_start: jnp.ndarray  # (N,) int32 candidate range start, ORIGINAL order
    cand_end: jnp.ndarray  # (N,) int32 candidate range end (clamped to cap)
    stream: jnp.ndarray  # (16, P_cap) f32 pair attribute rows
    #                      [u v c00 c01 c11 opa r g b 0...]


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


def _strip_x_extreme(u, a1x, a1y, a2x, a2y, dy0, dy1):
    """Exact max-x of the OBB restricted to the strip dy in [dy0, dy1].

    OBB points: (s*a1x + t*a2x, s*a1y + t*a2y) around center, |s|,|t| <= 1;
    dy measured relative to the center. If the unconstrained maximizer's y
    falls inside the strip, the answer is the OBB's global x-extent;
    otherwise the maximum lies on the clamped y level and the LP optimum has
    s or t at a bound (4 candidate vertices). Returns -inf (plus u) when the
    OBB does not reach the strip. Exact vs the 4-axis SAT test (fuzzed).
    """
    s0 = jnp.sign(jnp.where(a1x == 0, 1.0, a1x))
    t0 = jnp.sign(jnp.where(a2x == 0, 1.0, a2x))
    y_at = s0 * a1y + t0 * a2y
    x_unc = jnp.abs(a1x) + jnp.abs(a2x)
    d = jnp.clip(y_at, dy0, dy1)
    in_range = (y_at >= dy0) & (y_at <= dy1)
    eps = 1e-20
    a1y_s = jnp.where(jnp.abs(a1y) < eps, eps, a1y)
    a2y_s = jnp.where(jnp.abs(a2y) < eps, eps, a2y)
    cands = []
    for sv in (1.0, -1.0):
        t = (d - sv * a1y) / a2y_s
        ok = jnp.abs(t) <= 1.0 + 1e-5
        cands.append(jnp.where(ok, sv * a1x + jnp.clip(t, -1, 1) * a2x,
                               -jnp.inf))
    for tv in (1.0, -1.0):
        s = (d - tv * a2y) / a1y_s
        ok = jnp.abs(s) <= 1.0 + 1e-5
        cands.append(jnp.where(ok, jnp.clip(s, -1, 1) * a1x + tv * a2x,
                               -jnp.inf))
    x_con = jnp.maximum(jnp.maximum(cands[0], cands[1]),
                        jnp.maximum(cands[2], cands[3]))
    return u + jnp.where(in_range, x_unc, x_con)


def _f32bits(x: jnp.ndarray) -> jnp.ndarray:
    """Integer column -> f32 for packed-row gathers. Plain cast (NOT a
    bitcast: the TPU VPU flushes denormal f32 to zero even in data movement,
    destroying small bit patterns); exact for |x| < 2^24 — build_tile_tables
    statically rejects capacities beyond that."""
    return x.astype(jnp.float32)


def _i32bits(x: jnp.ndarray) -> jnp.ndarray:
    return x.astype(jnp.int32)


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
    attrs: jnp.ndarray,
    num_tiles_x: int,
    num_tiles_y: int,
    tile_size: int,
    pair_cap: int,
    chunk_size: int,
    row_limit: jnp.ndarray | None = None,
) -> TileTables:
    """Full binning pipeline; all inputs dense over the capacity axis.

    Args:
      uv: (N, 2) screen positions. z: (N,) camera depths. radius: (N, 4) OBB
      records. mask: (N,) visibility.
      attrs: (N, >=9) per-Gaussian attribute rows
        [u v c00 c01 c11 opa r g b ...] (ops/render.pack_attrs); the payload
        is fused through the expansion and the tile sort to produce
        ``stream``. Values must match ``uv`` in columns 0:2.
      row_limit: optional traced upper bound (<= num_tiles_y) on enumerated
        tile rows — used by tile-sharded rendering where the last strip's
        padding rows lie outside the global image.
    """
    n = uv.shape[0]
    num_tiles = num_tiles_x * num_tiles_y
    if pair_cap >= (1 << 24) or n >= (1 << 24):
        # Integer indices ride packed f32 rows (exact only below 2^24).
        raise ValueError("pair_cap and N must be < 2^24")

    # 1. Depth order (invisible last). Ties broken by index (stable).
    zkey = jnp.where(mask, z, jnp.inf)
    order = jnp.argsort(zkey, stable=True).astype(jnp.int32)  # (N,)
    cap = pair_cap
    # Row-level arrays are roughly half the candidate count in practice;
    # sizing them separately halves the level-1 expansion and the level-2
    # gather's source. Overflow reports 2*total_rows so cap growth covers
    # row overflow too.
    row_cap = max(cap // 2, 1 << 19)

    # 2. EXACT two-level expansion (replaces the reference's conservative
    # bounding-square + SAT filter, culling.cu:97-244): level 1 enumerates
    # the tile ROWS of each Gaussian's y-AABB; level 2 computes, per row,
    # the exact x-interval of the OBB within that 16px strip in closed form
    # (equal to the 4-axis SAT result — OBB∩strip is convex, so its
    # x-projection interval decides tile membership exactly). Candidate
    # count therefore equals the true pair count: no SAT stage, no dropped
    # pairs from conservative over-enumeration.
    u, v = uv[:, 0], uv[:, 1]
    r_major, r_minor = radius[:, 0], radius[:, 1]
    sin_t, cos_t = radius[:, 2], radius[:, 3]
    a1x, a1y = r_major * cos_t, r_major * sin_t
    a2x, a2y = -r_minor * sin_t, r_minor * cos_t
    hx = jnp.abs(a1x) + jnp.abs(a2x)
    hy = jnp.abs(a1y) + jnp.abs(a2y)
    nty_eff = num_tiles_y if row_limit is None else row_limit
    ty0 = jnp.clip(jnp.floor((v - hy) / tile_size).astype(jnp.int32),
                   0, nty_eff)
    ty1 = jnp.clip(jnp.floor((v + hy) / tile_size).astype(jnp.int32) + 1,
                   0, nty_eff)
    has_x = (
        jnp.floor((u + hx) / tile_size) >= 0
    ) & (jnp.floor((u - hx) / tile_size) < num_tiles_x)
    row_counts = jnp.where(mask & has_x, jnp.maximum(0, ty1 - ty0), 0)

    # Per-Gaussian record packed once in original order, depth-reordered
    # with ONE row gather (gather cost on TPU is per-index, not per-byte).
    # Integer columns ride as bitcast f32 for exactness at any capacity.
    rec0 = jnp.stack(
        [
            u, v, a1x, a1y, a2x, a2y,
            _f32bits(ty0),
            _f32bits(row_counts),
            _f32bits(jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
                     .squeeze(-1)),
        ],
        axis=1,
    )
    rec_d = _barrier(rec0[order])  # (N, 9) in depth order
    counts1 = _i32bits(rec_d[:, 7])
    offsets1 = jnp.cumsum(counts1) - counts1  # exclusive, depth order
    total_rows = offsets1[-1] + counts1[-1]
    rec_d = _barrier(
        jnp.concatenate([rec_d, _f32bits(offsets1)[:, None]], axis=1)
    )

    # Level 1: tile rows.
    slot_r = jax.lax.broadcasted_iota(jnp.int32, (row_cap, 1), 0).squeeze(-1)
    rid = _segment_ids(offsets1, counts1, row_cap)
    rid = _barrier(jnp.clip(rid, 0, n - 1))
    rrec = _barrier(rec_d[rid])  # (row_cap, 10)
    r_u, r_v = rrec[:, 0], rrec[:, 1]
    r_a1x, r_a1y, r_a2x, r_a2y = (rrec[:, 2], rrec[:, 3], rrec[:, 4],
                                  rrec[:, 5])
    row_y = _i32bits(rrec[:, 6]) + (slot_r - _i32bits(rrec[:, 9]))
    dy0 = row_y.astype(jnp.float32) * tile_size - r_v
    dy1 = dy0 + tile_size
    xhi = _strip_x_extreme(r_u, r_a1x, r_a1y, r_a2x, r_a2y, dy0, dy1)
    xlo = -_strip_x_extreme(-r_u, -r_a1x, r_a1y, -r_a2x, r_a2y, dy0, dy1)
    ok = jnp.isfinite(xlo) & jnp.isfinite(xhi)
    cx0 = jnp.clip(
        jnp.floor(jnp.where(ok, xlo, 0.0) / tile_size).astype(jnp.int32),
        0, num_tiles_x - 1,
    )
    cx1 = jnp.clip(
        jnp.floor(jnp.where(ok, xhi, -1.0) / tile_size).astype(jnp.int32),
        -1, num_tiles_x - 1,
    )
    # guard: xhi below image / xlo above image -> empty
    empty = (~ok) | (jnp.floor(xhi / tile_size) < 0) | (
        jnp.floor(xlo / tile_size) >= num_tiles_x
    )
    row_valid = slot_r < jnp.minimum(total_rows, row_cap)
    counts2 = jnp.where(
        row_valid & ~empty, jnp.maximum(0, cx1 - cx0 + 1), 0
    ).astype(jnp.int32)
    offsets2 = jnp.cumsum(counts2) - counts2  # exclusive, row order
    total_cand = offsets2[-1] + counts2[-1]
    rrec2 = _barrier(
        jnp.stack(
            [
                _f32bits(cx0),
                _f32bits(row_y),
                rrec[:, 8],  # gid bits (passthrough)
                _f32bits(offsets2),
            ],
            axis=1,
        )
    )

    # Level 2: tile columns.
    slot = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0).squeeze(-1)
    cid = _segment_ids(offsets2, counts2, cap)
    cid = _barrier(jnp.clip(cid, 0, row_cap - 1))
    crec = _barrier(rrec2[cid])  # (cap, 4)
    tile_x = _i32bits(crec[:, 0]) + (slot - _i32bits(crec[:, 3]))
    tile_y = _i32bits(crec[:, 1])
    gid_orig = _i32bits(crec[:, 2])
    cand_valid = slot < jnp.minimum(total_cand, cap)

    tile_idx = tile_y * num_tiles_x + tile_x
    key = _barrier(
        jnp.where(cand_valid, tile_idx, num_tiles).astype(jnp.int32)
    )

    # Attribute payload gathered once per candidate from the small (N, 16)
    # source (gather cost grows with source bytes, so this is far cheaper
    # than carrying the columns through the expansion gathers), then rides
    # the tile sort (~1.5 ns/element) into pair order — no per-pair gather
    # afterwards and, crucially, no scatter-add transpose in the backward.
    attrs9 = _barrier(attrs[:, :9])  # gather cost grows with source bytes
    arows = _barrier(attrs9[jnp.clip(gid_orig, 0, n - 1)])  # (cap, 9)

    # 4. Stable sort by tile: candidates are already depth-ordered, so this
    # yields (tile-major, depth-ascending) — the reference's composite key.
    # ``slot`` rides along as the inverse-permutation record for the
    # backward; the 9 attribute columns become the pair stream.
    sorted_ops = jax.lax.sort(
        (key, gid_orig, slot,
         arows[:, 0], arows[:, 1], arows[:, 2], arows[:, 3], arows[:, 4],
         arows[:, 5], arows[:, 6], arows[:, 7], arows[:, 8]),
        dimension=0, is_stable=True, num_keys=1,
    )
    sorted_ops = _barrier(sorted_ops)
    key_sorted, gid_sorted, cand_sorted = sorted_ops[:3]
    in_range = key_sorted < num_tiles
    valid_f = in_range.astype(jnp.float32)
    # stream rows [u v c00 c01 c11 opa r g b 0...]; invalid tail zeroed.
    stream = jnp.concatenate(
        [
            jnp.stack([col * valid_f for col in sorted_ops[3:12]], axis=0),
            jnp.zeros((16 - 9, cap), jnp.float32),
        ],
        axis=0,
    )

    # 5. Tile ranges via searchsorted over the sorted keys. Pair slot ==
    # sorted slot (no chunk padding; the Pallas kernels read k-aligned chunks
    # and lane-mask both unaligned ends, so no remap scatter is needed).
    bounds = jnp.searchsorted(
        key_sorted, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    tile_start = bounds[:-1]
    tile_count = bounds[1:] - bounds[:-1]
    num_pairs = bounds[-1]

    splat_gid = jnp.where(in_range, gid_sorted, -1)

    # Candidate ranges per Gaussian: its rows are contiguous in row space,
    # so the range is off2ext at its first/one-past-last row. Scattered back
    # to ORIGINAL Gaussian order so the rasterizer backward needs no final
    # reorder (one small scatter here beats an (N,16) row gather there).
    off2ext = jnp.concatenate([offsets2, total_cand[None]])
    row_start = jnp.minimum(offsets1, row_cap)
    row_end = jnp.minimum(offsets1 + counts1, row_cap)
    cand_start = (
        jnp.zeros((n,), jnp.int32)
        .at[order]
        .set(jnp.minimum(off2ext[row_start], cap))
    )
    cand_end = (
        jnp.zeros((n,), jnp.int32)
        .at[order]
        .set(jnp.minimum(off2ext[row_end], cap))
    )

    overflow = jnp.maximum(total_cand, 2 * total_rows).astype(jnp.int32)
    return TileTables(
        splat_gid=splat_gid,
        tile_start=tile_start,
        tile_count=tile_count,
        num_pairs=num_pairs,
        overflow=overflow,
        cand_of_pair=cand_sorted,
        cand_start=cand_start,
        cand_end=cand_end,
        stream=stream,
    )
