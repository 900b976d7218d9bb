"""Tile binning + depth sort (jitted JAX, fixed shapes, no atomics).

TPU-first redesign of the reference's binning stage
(/root/reference/cuda/culling.cu:97-343,386-475), which uses warp-aggregated
atomic pair allocation and a CUB radix sort on a composite uint64
``z + (max_z+1)*tile`` key. Here:

1. EXACT two-level expansion IN ORIGINAL GAUSSIAN ORDER: level 1 enumerates
   each Gaussian's tile ROWS (y-AABB); level 2 computes the exact x-interval
   of the OBB within each 16px strip in closed form (fuzz-verified equal to
   the reference's 4-axis SAT, culling.cu:97-165) — candidates EQUAL true
   pairs (plus one invalid sentinel per empty row and per masked Gaussian),
   so nothing is conservatively over-enumerated or filtered afterwards.
   Both expansions run in the Pallas segment-expand kernel
   (kernels/expand.py: windowed one-hot matmuls on the MXU, replacing
   atomicAdd allocation AND the per-index expansion gathers). EVERY record
   (even masked/empty) emits >= 1 row so the expansion windows stay bounded
   without a visibility-compaction sort; the Gaussian id of a row is
   recovered post-expansion as ``cumsum(offsets_row == slot) - 1`` (each
   record's first row is the unique slot equal to its offset), so the id
   rides NEITHER expansion level.
2. ONE sort produces tile-major depth-ascending order: key1 packs
   (tile_idx << qd_bits) | quantized_depth into a single int32 — the TPU
   analogue of the reference's composite 64-bit radix key — and key2 is the
   Gaussian id (a deterministic tiebreak: a Gaussian contributes at most
   one pair per tile, so the full key is unique). The former N-wide depth
   pre-sort (12 payload operands) and the backward's N-wide back-sort both
   disappear: candidates are Gaussian-major, so per-Gaussian gradient
   regroups key directly on the sorted-out Gaussian id and the segment sum
   lands in ORIGINAL order (ops/render.py, kernels/segsum.py).
   Depth is quantized to qd_bits (<= 16) log-spaced buckets (~2e-4 relative
   z at 16 bits); candidates with equal quantized depth composite in
   Gaussian-id order — a documented divergence from the reference's exact
   f32 ordering that only reorders near-coincident splats (the reference's
   radix ties are insertion-order arbitrary too).
3. Tile ranges come from searchsorted at the qd_bits-aligned key boundaries
   (replacing find_tile_boundaries); pair slot == sorted slot (the Pallas
   kernels handle unaligned ranges), so no remap scatter and no chunk
   padding exist.

TPU performance notes (measured on v5e, see also BENCH detail):
- XLA gather/scatter cost is per-INDEX (~9-17 ns at 7M) — a permutation can
  never be applied by gather/scatter at pair width; payload columns RIDE
  the sorts (~5-7 ms per int32 operand at 7M, superlinear in size).
- ``jax.lax.optimization_barrier`` pins the stage seams; without it XLA
  fuses record-building chains into pathological loop fusions (measured
  4-6x slower).

Everything is fixed-shape: capacities are static; on overflow pairs are
dropped deterministically and ``overflow`` reports the required size so the
host can re-jit with a larger bucket (2^19-granular, see
train/state.round_pair_cap).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

import os as _os

from ..kernels.expand import WINDOW as _WINDOW, segment_expand
from ..kernels.sort import S_BLOCK as _SS_BLOCK, sample_sort

_barrier = jax.lax.optimization_barrier

# In-VMEM bitonic samplesort for the tile sort (kernels/sort.py): pays HBM
# O(1) times instead of lax.sort's ~30 roundtrip-equivalents. Used when the
# pair cap is a multiple of its 2^16 block (always true for product caps,
# which are 2^19-granular); small/unaligned caps (tests) and the exact-f32
# parity path keep lax.sort. Env-gated for A/B on hardware.
_USE_SAMPLE_SORT = _os.environ.get("GSPLAT_SAMPLE_SORT", "1") == "1"

# Depth quantization: log2-spaced buckets over Z0 * 2^[0, OCTAVES). At the
# default 16 key bits that is 2048 buckets per octave (~3.4e-4 relative z)
# over z in [1e-4, 4.3e5] — far below any visible compositing-order scale.
_QD_Z0 = 1e-4
_QD_OCTAVES = 32.0


def depth_key_bits(num_tiles: int) -> int:
    """Quantized-depth bits packed below the tile index in the sort key."""
    return max(1, min(16, 30 - int(num_tiles).bit_length()))


def quantize_depth(z: jnp.ndarray, qd_bits: int) -> jnp.ndarray:
    """z -> int32 log-spaced depth bucket in [0, 2^qd_bits)."""
    levels = float(1 << qd_bits)
    scale = levels / _QD_OCTAVES
    q = jnp.floor(
        (jnp.log2(jnp.maximum(z, _QD_Z0)) - jnp.log2(_QD_Z0)) * scale
    )
    return jnp.clip(q, 0.0, levels - 1.0).astype(jnp.int32)


class TileTables(NamedTuple):
    """Sorted splat attribute stream + per-tile ranges.

    ``stream`` carries the per-pair attribute rows, built by fusing the
    attribute payload through the expansion and the tile sort (the payload
    rides the sort at per-operand cost — far cheaper than any post-hoc
    pair-width gather).

    ``splat_gid`` is the tile sort's Gaussian-id key operand: pair slot ->
    original Gaussian index (-1 for the invalid tail). It is BOTH the test
    oracle's splat list and the backward's regroup key: candidates are
    Gaussian-major, so sorting per-pair gradients by this id and segment-
    summing equal-id runs (kernels/segsum.py) yields per-Gaussian sums in
    ORIGINAL order with no back-permutation.
    """

    splat_gid: jnp.ndarray  # (P_cap,) int32 gaussian index, -1 = invalid tail
    tile_start: jnp.ndarray  # (T,) int32 first pair slot of each tile
    tile_count: jnp.ndarray  # (T,) int32 number of splats per tile
    num_pairs: jnp.ndarray  # () int32 — valid pair count
    overflow: jnp.ndarray  # () int32 — required PAIR capacity (check >
    #                        P_cap). With the derived (row_cap=None) sizing
    #                        it also folds in 2*row_overflow so single-cap
    #                        growth covers row truncation (legacy protocol).
    row_overflow: jnp.ndarray  # () int32 — required ROW capacity (check
    #                            > row_cap when row_cap was passed)
    stream: jnp.ndarray  # pair attribute stream, TILED layout (one
    #                      contiguous HBM block per 128-pair chunk). Two
    #                      forms, told apart by row count (the kernels
    #                      auto-detect): default packed (P_cap/128, 4, 128)
    #                      int32 [f16(u_rel)|f16(v_rel), bf16(c00|c01),
    #                      bf16(c11|opa), rgb_e5(r,g,b)] with TILE-RELATIVE
    #                      uv; exact (bf16_colors=False)
    #                      (P_cap/128, 9, 128) f32 rows
    #                      [u v c00 c01 c11 opa r g b] with global uv


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
    covers every SAT hit and is ~5x smaller; the exact strip filter then
    yields the same final pair set.
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
    extent: float | None = None,
) -> jnp.ndarray:
    """Exact OBB vs axis-aligned tile separating-axis test.

    Vectorized port of the 4-axis SAT of culling.cu:97-165 (x axis, y axis,
    OBB major axis, OBB minor axis) with the OBB corners from compute_obb.
    ``extent`` sets the tested rect to [t*ts, t*ts + extent] (default: the
    full tile rect, reference parity); the product binning tests the PIXEL
    rect (extent = tile_size - 1: pixel centers sit at integer offsets
    0..ts-1), which is value-exact and slightly tighter.
    """
    if extent is None:
        extent = float(tile_size)
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
    right = left + extent
    top = tile_y.astype(jnp.float32) * tile_size
    bottom = top + extent

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


def _strip_x_extreme_ell(u, e1x, e1y, e2x, e2y, dy0, dy1):
    """Exact max-x of the ELLIPSE {s*e1 + t*e2 : s^2+t^2 <= 1} within the
    strip dy in [dy0, dy1] (dy relative to the center).

    The disk analogue of _strip_x_extreme's square LP: with vx = (e1x,e2x),
    vy = (e1y,e2y) in the (s,t) parameter plane, maximize vx.p subject to
    vy.p = d (the clamped strip level) and |p| <= 1. Decompose
    vx = alpha*vy + w with w perp vy: on the level set vx.p = alpha*d + w.q
    where |q|^2 <= 1 - d^2/|vy|^2, so the constrained max is
    alpha*d + |w|*sqrt(1 - d^2/|vy|^2). If the unconstrained maximizer's
    y-level (vx.vy)/|vx| falls inside the strip, the answer is |vx|. Rows
    are enumerated from the ellipse's y-AABB, so every enumerated strip
    intersects [-|vy|, |vy|]; the d-clamp absorbs boundary fuzz (a strip
    fully outside the span has no above-cutoff pixels, so either branch is
    safe there)."""
    rx2 = e1x * e1x + e2x * e2x
    rx = jnp.sqrt(rx2)
    ry2 = e1y * e1y + e2y * e2y
    ry = jnp.sqrt(ry2)
    dot = e1x * e1y + e2x * e2y
    eps = 1e-20
    y_at = dot / jnp.maximum(rx, eps)
    in_range = (y_at >= dy0) & (y_at <= dy1)
    d = jnp.clip(jnp.clip(y_at, dy0, dy1), -ry, ry)
    alpha = dot / jnp.maximum(ry2, eps)
    w = jnp.sqrt(jnp.maximum(rx2 - alpha * dot, 0.0))
    x_con = alpha * d + w * jnp.sqrt(
        jnp.maximum(1.0 - (d * d) / jnp.maximum(ry2, eps), 0.0)
    )
    # Degenerate flat-in-y ellipse: the single enumerated strip contains
    # the center level, so the full x-extent applies.
    x_con = jnp.where(ry2 <= eps, rx, x_con)
    return u + jnp.where(in_range, rx, x_con)


def _span_y(v, a1y, a2y, s_e, tile_size, nty_eff):
    """Pixel-rect tile-row span of the OBB/ellipse intersection.

    hy = min(OBB y-extent, ellipse y-extent); tile row ty covers pixel rows
    ty*ts .. ty*ts + (ts-1), so ty is alive iff ty*ts <= v + hy AND
    ty*ts + (ts-1) >= v - hy. Shared by the level-1 enumeration and the
    post-expansion recompute — MUST stay one function so both jit programs
    emit the identical f32 op sequence (the recompute relies on bit-equal
    results)."""
    hy = jnp.minimum(
        jnp.abs(a1y) + jnp.abs(a2y),
        s_e * jnp.sqrt(a1y * a1y + a2y * a2y),
    )
    ts = float(tile_size)
    ty0 = jnp.clip(
        jnp.ceil((v - hy - (ts - 1.0)) / ts).astype(jnp.int32), 0, nty_eff
    )
    ty1 = jnp.clip(
        jnp.floor((v + hy) / ts).astype(jnp.int32) + 1, 0, nty_eff
    )
    return ty0, ty1


def _f32bits(x: jnp.ndarray) -> jnp.ndarray:
    """Integer column -> f32 for packed-row expansion. Plain cast (NOT a
    bitcast: the TPU VPU flushes denormal f32 to zero even in data movement,
    destroying small bit patterns); exact for |x| < 2^24 — build_tile_tables
    statically rejects capacities beyond that."""
    return x.astype(jnp.float32)


def _i32bits(x: jnp.ndarray) -> jnp.ndarray:
    return x.astype(jnp.int32)


# 16-bit pair packing: ONE shared bit format (see kernels/packing.py for
# rationale and precision notes), re-exported here for the ops layer.
from ..kernels.packing import (  # noqa: F401  (re-exports)
    pack_bf16_pair, pack_f16_pair, pack_rgb_e5, unpack_bf16_pair,
    unpack_f16_pair, unpack_rgb_e5,
)


# Row indices of the record matrices fed to the expand kernel (counts ride
# as offset DIFFERENCES — no count rows; see kernels/expand.py). Geometry,
# the quantized depth and offsets ride the exact-f32 matrix; in the default
# bf16 configuration the 7 (already bf16-rounded) attribute rows ride a
# half-width bf16 matrix expanded by the same one-hot weights, and
# small-integer rows (true counts <= num_tiles_x) join them. The Gaussian
# id rides NEITHER level-1 row: it is recovered bit-exactly post-expansion
# as cumsum(offsets == slot) - 1 (every record owns >= 1 row).
# Level 1 f32 (per-Gaussian, ORIGINAL order):
_A_U, _A_V, _A_A1X, _A_A1Y, _A_A2X, _A_A2Y, _A_QD = 0, 1, 2, 3, 4, 5, 6
_A_SE = 7  # ellipse/OBB radius ratio (covariance ell_scale): rides so the
#            post-expansion span recompute and the ellipse strip support
#            see the bit-identical per-Gaussian value
_A_OFF = 8  # bf16 mode (exact mode appends the 7 attrs first: off = 15)
# Level 1/2 bf16 attr rows (bf16 mode), also appended to f32 in exact mode:
#   [c00 c01 c11 opa r g b]
# Level 2 f32 (per tile-row): tile0 = row_y * num_tiles_x + cx0 fuses the
# run's first tile index into ONE exact-f32 integer row; qd and gid ride
# from level 1.
_B_T0, _B_U, _B_V, _B_QD, _B_GID = 0, 1, 2, 3, 4
_B_OFF = 5  # bf16 mode (exact: [t0 u v qd gid cnt attrs7 off] -> off = 13)

# Far-off screen position used to sanitize masked/empty records so their
# sentinel rows enumerate zero tiles through the SAME math as real rows
# (exactly representable in f32; any image is < 2^22 px).
_FAR = float(1 << 22)


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
    row_cap: int | None = None,
    row_limit: jnp.ndarray | None = None,
    interpret: bool | None = None,
    bf16_colors: bool = True,
    depth_rank: jnp.ndarray | None = None,
    _stop_after: str | None = None,
    _wide_offsets: bool | None = None,  # None = auto (pair_cap >= 2^24);
    #                                     tests force True at small caps
    _wide_rows: bool | None = None,  # None = auto (row_cap >= 2^24)
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
      depth_rank: optional (N,) int32 dense depth rank (0 = nearest; e.g.
        argsort-of-argsort of z). EXACT-ORDERING FALLBACK MODE: the rank
        replaces the quantized log-depth as the sort key's depth field, so
        compositing order is the reference's exact f32 ordering
        (culling.cu:294-298) with Gaussian-id ties impossible. Available
        when bitlen(num_tiles) + bitlen(N-1) <= 30 (the packed int32 key
        budget); scripts/depth_quant_bound.py uses it to measure the
        default log-bucket divergence.
      _stop_after: PROFILING ONLY — truncate the pipeline after the named
        stage ("expand1" | "strip" | "expand2" | "tile_sort") and return a
        consuming scalar instead of TileTables, so jitted stage diffs
        attribute time per stage (XLA DCEs the rest).

    Capacity semantics: every Gaussian record (visible or not) emits at
    least one tile row, and every row emits at least one candidate (empty
    ones as invalid sentinels), so ``row_cap`` must cover N + extra rows
    and ``pair_cap`` must cover true pairs + sentinel candidates;
    ``overflow`` / ``row_overflow`` report the exact requirement.
    """

    def _probe(*arrs):
        total = jnp.float32(0)
        for a in arrs:
            total = total + jnp.sum(a.astype(jnp.float32))
        return total
    n = uv.shape[0]
    num_tiles = num_tiles_x * num_tiles_y
    if pair_cap >= (1 << 26) or n >= (1 << 23):
        # Integer indices ride packed f32 rows (exact only below 2^24; the
        # WIDE-OFFSET mode below lifts pair slots to 2^26 via hi/lo rows)
        # and the invalid-gid sentinel is 1 << 23.
        raise ValueError("pair_cap must be < 2^26 and N < 2^23")
    # Pair slot indices above the f32-exact integer ceiling ride as TWO
    # record rows [off >> 11 | off & 2047] and the expand kernel compares
    # membership in int32 (kernels/expand.py off_rows=2). Row offsets get
    # the SAME treatment once row_cap can reach 2^24 (the trainer derives
    # row_cap = pair_cap // 2, so a 2^26 pair cap implies a 2^25 row cap —
    # single-row f32 offsets would silently corrupt membership there).
    wide_off = (pair_cap >= (1 << 24) if _wide_offsets is None
                else _wide_offsets)
    if pair_cap % 512 != 0:
        raise ValueError("pair_cap must be a multiple of 512")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if depth_rank is not None:
        qd_bits = max(1, int(n - 1).bit_length())
        if int(num_tiles).bit_length() + qd_bits > 30:
            raise ValueError(
                "exact depth-rank mode needs bitlen(tiles) + bitlen(N-1) "
                f"<= 30; got {int(num_tiles).bit_length()} + {qd_bits}"
            )
    else:
        qd_bits = depth_key_bits(num_tiles)

    cap = pair_cap
    # Row capacity: explicit (the trainer/bench grow it from row_overflow,
    # decoupled from the pair cap — the bench scene needs rows ~= 0.64 x
    # pairs, and a coupled cap forces the PAIR cap to 2x the row need,
    # paying ~20-30% dead tail in every pair-wide sort/kernel) or derived
    # (legacy: half the pair cap; overflow then folds in 2*total_rows so
    # single-cap growth covers row truncation). Small caps get row_cap ==
    # cap, which can never truncate rows (every row emits >= 1 candidate,
    # so rows <= candidates).
    row_cap_derived = row_cap is None
    if row_cap_derived:
        row_cap = max(cap // 2, min(cap, 1 << 19), _WINDOW)
    else:
        row_cap = max(row_cap, _WINDOW)
    row_cap = ((row_cap + 4095) // 4096) * 4096
    # Row offsets/slots above the f32-exact ceiling ride as hi/lo rows too.
    wide_row = (row_cap >= (1 << 24) if _wide_rows is None else _wide_rows)
    if row_cap >= (1 << 26):
        raise ValueError("row_cap must be < 2^26")

    # EXACT two-level expansion (replaces the reference's conservative
    # bounding-square + SAT filter, culling.cu:97-244), in ORIGINAL Gaussian
    # order: level 1 enumerates the tile ROWS of each Gaussian's y-AABB;
    # level 2 computes, per row, the exact x-interval of the OBB within
    # that 16px strip in closed form (equal to the 4-axis SAT result —
    # OBB∩strip is convex, so its x-projection interval decides tile
    # membership exactly). Candidate count therefore equals the true pair
    # count (plus the sentinels): nothing is conservatively over-enumerated.
    u, v = uv[:, 0], uv[:, 1]
    r_major, r_minor = radius[:, 0], radius[:, 1]
    sin_t, cos_t = radius[:, 2], radius[:, 3]
    a1x, a1y = r_major * cos_t, r_major * sin_t
    a2x, a2y = -r_minor * sin_t, r_minor * cos_t
    # Ellipse/OBB scale (covariance ell_scale): the 1/255-cutoff ellipse
    # with semi-axes s_e*(a1, a2) contains every above-cutoff pixel, so
    # the pair set is the OBB tile test INTERSECTED with the ellipse's
    # exact strip support — the OBB's corner tiles (zero contribution,
    # zero gradient) never become pairs. (N, 4) records (hand-built OBBs)
    # get s_e = 2 >= sqrt(2): the ellipse then contains the OBB and the
    # behavior is pure-OBB.
    s_e = radius[:, 4] if radius.shape[1] >= 5 else jnp.full_like(u, 2.0)
    hx = jnp.minimum(
        jnp.abs(a1x) + jnp.abs(a2x),
        s_e * jnp.sqrt(a1x * a1x + a2x * a2x),
    )
    nty_eff = num_tiles_y if row_limit is None else row_limit
    ty0, ty1 = _span_y(v, a1y, a2y, s_e, tile_size, nty_eff)
    # Pixel-rect x gate: tile tx covers pixels tx*ts .. tx*ts + (ts-1).
    has_x = (
        jnp.floor((u + hx) / tile_size) >= 0
    ) & (jnp.ceil((u - hx - (tile_size - 1.0)) / tile_size) < num_tiles_x)
    row_counts = jnp.where(mask & has_x, jnp.maximum(0, ty1 - ty0), 0)

    # Sentinel-row trick, level 1: EVERY record owns >= 1 row (the expand
    # kernel's window bound needs compacted counts), so no visibility-
    # compaction sort is needed. Records with row_counts == 0 (masked,
    # off-screen, or NaN geometry) are SANITIZED to a far-off position with
    # zero axes: their single sentinel row then enumerates zero tiles
    # through the same strip math as real rows (no NaNs ride the records).
    live = row_counts > 0
    u = jnp.where(live, u, _FAR)
    v = jnp.where(live, v, _FAR)
    a1x = jnp.where(live, a1x, 0.0)
    a1y = jnp.where(live, a1y, 0.0)
    a2x = jnp.where(live, a2x, 0.0)
    a2y = jnp.where(live, a2y, 0.0)
    s_e = jnp.where(live, s_e, 1.0)
    if depth_rank is not None:
        qd = jnp.where(live, depth_rank.astype(jnp.int32), 0)
    else:
        qd = jnp.where(live, quantize_depth(z, qd_bits), 0)
    counts1 = jnp.maximum(row_counts, 1).astype(jnp.int32)
    offsets1 = jnp.cumsum(counts1) - counts1  # exclusive, original order
    total_rows = offsets1[-1] + counts1[-1]
    if wide_row:
        off1_rows = (_f32bits(offsets1 >> 11), _f32bits(offsets1 & 2047))
    else:
        off1_rows = (_f32bits(offsets1),)
    attrs9 = attrs[:, :9]
    if bf16_colors:
        # The 7 conic/opacity/color columns are bf16-rounded HERE (the same
        # rounding the stream pack applies), so they ride the half-width
        # bf16 expansion matrices and the final stream precision is
        # unchanged. u/v and the OBB axes stay f32 — they decide the exact
        # strip enumeration (pair membership must equal the f32 SAT oracle).
        attr_rows = tuple(
            attrs9[:, i].astype(jnp.bfloat16) for i in range(2, 9)
        )
        rec_a = _barrier(
            jnp.stack(
                (u, v, a1x, a1y, a2x, a2y, _f32bits(qd), s_e)
                + off1_rows,
                axis=0,
            )
        )  # (9 | 10, n)
        rec_a_b16 = _barrier(jnp.stack(attr_rows, axis=0))  # (7, n)
        off_row_a = _A_OFF
    else:
        rec_a = _barrier(
            jnp.stack(
                (u, v, a1x, a1y, a2x, a2y, _f32bits(qd), s_e)
                + tuple(attrs9[:, i] for i in range(2, 9))
                + off1_rows,
                axis=0,
            )
        )  # (16 | 17, n)
        rec_a_b16 = None
        off_row_a = 15
    off1_ext = jnp.concatenate([offsets1, total_rows[None]])

    # Level 1: tile rows (Pallas expand), then the exact strip x-interval
    # per row in closed form (XLA elementwise).
    res_a = segment_expand(
        rec_a, off1_ext, total_rows, row_cap,
        off_row=off_row_a, records_b16=rec_a_b16, interpret=interpret,
        off_rows=2 if wide_row else 1,
    )
    if bf16_colors:
        rrec, rrec_b = res_a
        rrec_b = _barrier(rrec_b)  # (7, row_cap) bf16
    else:
        rrec = res_a
    rrec = _barrier(rrec)
    if _stop_after == "expand1":
        return _probe(rrec, *([rrec_b] if bf16_colors else []))
    slot_r = jax.lax.broadcasted_iota(jnp.int32, (row_cap, 1), 0).squeeze(-1)
    if wide_row:
        off1_r = (_i32bits(rrec[off_row_a]) * 2048
                  + _i32bits(rrec[off_row_a + 1]))
    else:
        off1_r = _i32bits(rrec[off_row_a])
    # Gaussian id per row, recovered bit-exactly WITHOUT riding the
    # expansion: every record owns >= 1 row, so slot == offsets marks each
    # record's first row exactly once and the running count is the record
    # index (== original Gaussian id; records are never compacted). Tail
    # slots see the sentinel offset (== total_rows) and stay clamped.
    gid_r = jnp.cumsum((off1_r == slot_r).astype(jnp.int32)) - 1
    gid_r = jnp.clip(gid_r, 0, n - 1)
    r_u, r_v = rrec[_A_U], rrec[_A_V]
    r_a1x, r_a1y, r_a2x, r_a2y = (rrec[_A_A1X], rrec[_A_A1Y],
                                  rrec[_A_A2X], rrec[_A_A2Y])
    r_se = rrec[_A_SE]
    # ty0 did not ride the expansion: recompute it bit-identically from the
    # expanded v/a1y/a2y/s_e via the SHARED _span_y (the bf16x3 one-hot
    # matmul reconstructs every f32 exactly, so the same op sequence sees
    # the same inputs as row_counts did).
    ty0_r, ty1_r = _span_y(r_v, r_a1y, r_a2y, r_se, tile_size, nty_eff)
    # A sentinel row (its record enumerated zero tiles) recomputes a zero
    # ty-count from the sanitized geometry; real rows recompute their
    # record's full count (>= 1).
    real_row = (ty1_r - ty0_r) > 0
    row_y = ty0_r + (slot_r - off1_r)
    # Strip of PIXEL rows: pixel py = row_y*ts + 0..ts-1, dy = py - v.
    dy0 = row_y.astype(jnp.float32) * tile_size - r_v
    dy1 = dy0 + (tile_size - 1.0)
    # Exact x-interval of the OBB-ellipse INTERSECTION within the strip:
    # min/max of the two supports is a (safe, near-exact) superset bound
    # for the convex intersection; pairs beyond the ellipse support have
    # every pixel below the 1/255 alpha cutoff (zero value AND gradient).
    xhi_o = _strip_x_extreme(r_u, r_a1x, r_a1y, r_a2x, r_a2y, dy0, dy1)
    xlo_o = -_strip_x_extreme(-r_u, -r_a1x, r_a1y, -r_a2x, r_a2y, dy0, dy1)
    e1x, e1y = r_se * r_a1x, r_se * r_a1y
    e2x, e2y = r_se * r_a2x, r_se * r_a2y
    xhi_e = _strip_x_extreme_ell(r_u, e1x, e1y, e2x, e2y, dy0, dy1)
    xlo_e = -_strip_x_extreme_ell(-r_u, -e1x, e1y, -e2x, e2y, dy0, dy1)
    xhi = jnp.minimum(xhi_o, xhi_e)
    xlo = jnp.maximum(xlo_o, xlo_e)
    ok = jnp.isfinite(xlo) & jnp.isfinite(xhi)
    # Pixel-rect tile gate: tile tx covers pixels tx*ts .. tx*ts + (ts-1),
    # so tx is alive iff tx*ts <= xhi AND tx*ts + (ts-1) >= xlo.
    cx0 = jnp.clip(
        jnp.ceil(
            (jnp.where(ok, xlo, 0.0) - (tile_size - 1.0)) / tile_size
        ).astype(jnp.int32),
        0, num_tiles_x - 1,
    )
    cx1 = jnp.clip(
        jnp.floor(jnp.where(ok, xhi, -1.0) / tile_size).astype(jnp.int32),
        -1, num_tiles_x - 1,
    )
    # guard: xhi below image / xlo above image -> empty
    empty = (~ok) | (jnp.floor(xhi / tile_size) < 0) | (
        jnp.ceil((xlo - (tile_size - 1.0)) / tile_size) >= num_tiles_x
    )
    row_valid = slot_r < jnp.minimum(total_rows, row_cap)
    counts2 = jnp.where(
        row_valid & real_row & ~empty, jnp.maximum(0, cx1 - cx0 + 1), 0
    ).astype(jnp.int32)
    # Sentinel-candidate trick, level 2: every VALID row emits >= 1
    # candidate so the expansion stays contiguous without a compaction
    # sort; the sentinel of an empty row is marked invalid downstream
    # (rel >= true count) and sorts to the tail with the other invalid keys.
    counts2_off = jnp.where(row_valid, jnp.maximum(counts2, 1), 0)
    offsets2 = jnp.cumsum(counts2_off) - counts2_off  # exclusive, row order
    total_cand = offsets2[-1] + counts2_off[-1]
    if _stop_after == "strip":
        return _probe(offsets2, counts2, cx0,
                      rrec, *([rrec_b] if bf16_colors else []))
    # tile0 = first tile index of the row's run (one exact-f32 int row);
    # candidate c of the run is tile tile0 + c. True counts are <= 256 =
    # bf16-exact for images up to 4096 px wide; wider images keep the count
    # row in the f32 matrix.
    tile0 = row_y * num_tiles_x + cx0
    cnt_in_b16 = bf16_colors and num_tiles_x <= 256
    if wide_off:
        off2_rows = [_f32bits(offsets2 >> 11), _f32bits(offsets2 & 2047)]
    else:
        off2_rows = [_f32bits(offsets2)]
    if bf16_colors:
        f32_rows = [_f32bits(tile0), r_u, r_v, rrec[_A_QD], _f32bits(gid_r)]
        if not cnt_in_b16:
            f32_rows.append(_f32bits(counts2))
        f32_rows.extend(off2_rows)
        b16_rows = ([_f32bits(counts2)] if cnt_in_b16 else []) + [
            rrec_b[i] for i in range(7)
        ]
        rec_b = _barrier(jnp.stack(f32_rows, axis=0))
        rec_b_b16 = _barrier(jnp.stack(b16_rows, axis=0))
        off_row_b = len(f32_rows) - len(off2_rows)
    else:
        rec_b = _barrier(
            jnp.stack(
                [
                    _f32bits(tile0), r_u, r_v, rrec[_A_QD],
                    _f32bits(gid_r), _f32bits(counts2),
                    rrec[8], rrec[9], rrec[10], rrec[11], rrec[12],
                    rrec[13], rrec[14],
                ] + off2_rows,
                axis=0,
            )
        )  # (14 | 15, row_cap)
        rec_b_b16 = None
        off_row_b = 13
    off2_ext = jnp.concatenate([offsets2, total_cand[None]])

    # Level 2: tile columns (Pallas expand).
    res_b = segment_expand(
        rec_b, off2_ext, total_cand, cap,
        off_row=off_row_b, records_b16=rec_b_b16, interpret=interpret,
        off_rows=2 if wide_off else 1,
    )
    if bf16_colors:
        crec, crec_b = res_b
        crec_b = _barrier(crec_b)  # (8|7, cap) bf16
        attr_b = crec_b[1:] if cnt_in_b16 else crec_b
    else:
        crec = res_b
    crec = _barrier(crec)
    if _stop_after == "expand2":
        return _probe(crec, *([crec_b] if bf16_colors else []))
    slot = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0).squeeze(-1)
    if wide_off:
        off2_back = (_i32bits(crec[off_row_b]) * 2048
                     + _i32bits(crec[off_row_b + 1]))
    else:
        off2_back = _i32bits(crec[off_row_b])
    rel2 = slot - off2_back
    tile_idx = _i32bits(crec[_B_T0]) + rel2
    if bf16_colors and cnt_in_b16:
        cnt_true = crec_b[0].astype(jnp.int32)
    elif bf16_colors:
        cnt_true = _i32bits(crec[5])
    else:
        cnt_true = _i32bits(crec[5])
    cand_valid = (slot < jnp.minimum(total_cand, cap)) & (rel2 < cnt_true)

    tile_x = tile_idx - (tile_idx // num_tiles_x) * num_tiles_x
    tile_y = tile_idx // num_tiles_x
    # Composite single-int32 key: (tile << qd_bits) | quantized depth — the
    # TPU analogue of the reference's uint64 radix key (culling.cu:294-298).
    # Invalid candidates key to the all-tiles sentinel.
    qd_c = jnp.clip(_i32bits(crec[_B_QD]), 0, (1 << qd_bits) - 1)
    key = _barrier(
        jnp.where(
            cand_valid,
            (tile_idx << qd_bits) | qd_c,
            jnp.int32(num_tiles << qd_bits),
        ).astype(jnp.int32)
    )
    # Gaussian id as key2: the deterministic depth tiebreak (one pair per
    # (tile, Gaussian) -> the full key is unique) AND the backward's
    # regroup key. Invalid candidates get the 1<<23 sentinel (> any N).
    gid_key = jnp.where(cand_valid, _i32bits(crec[_B_GID]),
                        jnp.int32(1 << 23))

    # ONE sort by ((tile, qdepth), gid) — tile-major, depth-ascending, the
    # reference's composite ordering. The attribute columns become the pair
    # stream. Sort cost is per-OPERAND (~5-7 ms per int32 at 7M on v5e), so
    # conic+color+opacity ride as packed bf16-pair int32 operands by
    # default (bf16 color is plenty for an 8-bit-rendered image; positions
    # stay f32). Parity tests pass bf16_colors=False for exact f32 oracle
    # comparison.
    if bf16_colors:
        # u, v ride as ONE f16 pair of TILE-RELATIVE offsets (tile origin
        # is recovered from the sorted key; sub-0.01px rounding near the
        # tile, ~2^-11-relative for a wide splat's far tiles); conic,
        # opacity and color ride as bf16 pairs (<=0.4% relative rounding
        # on splat shape and color — far below the 8-bit render target
        # and SGD noise).
        tsz = jnp.float32(tile_size)
        # Invalid candidates carry garbage tile coords (expand tail);
        # force their rel offsets to 0 so no inf/NaN f16 patterns enter
        # the stream (the tail is never unmasked in the kernels, and
        # inf*0=NaN). Valid offsets are CLAMPED to +-16384: covariance
        # puts no upper bound on r_major, so a degenerate near-camera
        # splat can reach beyond f16's 65504 max — the clamp keeps the
        # pack finite (an inf here becomes NaN uv-gradients in the
        # backward kernel). A splat evaluated >16k px from its center has
        # sigma ~5k px; the clamp (and f16's ~8 px ulp out there) is far
        # below its color scale.
        def _rel(col, tcoord):
            rel = col - tsz * tcoord.astype(jnp.float32)
            return jnp.where(
                cand_valid, jnp.clip(rel, -16384.0, 16384.0), 0.0
            )

        sort_ops_in = (
            key, gid_key,
            pack_f16_pair(
                _rel(crec[_B_U], tile_x), _rel(crec[_B_V], tile_y)
            ),
            pack_bf16_pair(attr_b[0], attr_b[1]),
            pack_bf16_pair(attr_b[2], attr_b[3]),
            pack_rgb_e5(
                attr_b[4].astype(jnp.float32),
                attr_b[5].astype(jnp.float32),
                attr_b[6].astype(jnp.float32),
            ),
        )
        ss_overflow = jnp.int32(0)
        if _USE_SAMPLE_SORT and cap % _SS_BLOCK == 0 and not interpret:
            # (key, gid) is unique per pair, so the unstable samplesort
            # produces the IDENTICAL order to the 2-key lax.sort.
            sorted_ops, ss_overflow = sample_sort(
                sort_ops_in, num_keys=2, interpret=interpret
            )
        else:
            sorted_ops = jax.lax.sort(
                sort_ops_in, dimension=0, is_stable=False, num_keys=2
            )
        sorted_ops = _barrier(sorted_ops)
        # PACKED stream: the 4 sorted int32 value operands ARE the pair
        # stream (kernels/rasterize.PACKED_ROWS layout, unpacked per chunk
        # in VMEM) — no XLA-side unpack/restack/re-pack passes at P_cap.
        # The invalid tail is NOT zeroed: its f16 uv field was forced to 0
        # at the pack site and every other field is a finite bit pattern
        # of real Gaussian data, and the kernels lane-mask all
        # out-of-range pairs (`real`/`valid`), so the tail never reaches an
        # accumulator. TILED (cap/128, 4, 128): one contiguous HBM block
        # per 128-pair chunk DMA.
        stream = (
            jnp.stack(sorted_ops[2:6], axis=0)
            .reshape(4, cap // 128, 128)
            .transpose(1, 0, 2)
        )
    else:
        ss_overflow = jnp.int32(0)
        sorted_ops = jax.lax.sort(
            (key, gid_key,
             crec[1], crec[2],
             crec[6], crec[7], crec[8], crec[9],
             crec[10], crec[11], crec[12]),
            dimension=0, is_stable=False, num_keys=2,
        )
        sorted_ops = _barrier(sorted_ops)
        attr_cols = list(sorted_ops[2:11])
        valid_f = (
            sorted_ops[0] < jnp.int32(num_tiles << qd_bits)
        ).astype(jnp.float32)
        # Exact-f32 stream rows [u v c00 c01 c11 opa r g b], GLOBAL uv;
        # invalid tail zeroed. TILED layout (cap/128, 9, 128).
        stream = (
            jnp.stack([col * valid_f for col in attr_cols], axis=0)
            .reshape(9, cap // 128, 128)
            .transpose(1, 0, 2)
        )
    if _stop_after == "tile_sort":
        return _probe(*sorted_ops)
    key_sorted, gid_sorted = sorted_ops[:2]
    in_range = key_sorted < jnp.int32(num_tiles << qd_bits)

    # Tile ranges via searchsorted at the qd-aligned key boundaries. Pair
    # slot == sorted slot (no chunk padding; the Pallas kernels read
    # k-aligned chunks and lane-mask both unaligned ends, so no remap
    # scatter is needed).
    bounds = jnp.searchsorted(
        key_sorted,
        (jnp.arange(num_tiles + 1, dtype=jnp.int32) << qd_bits),
        side="left",
    ).astype(jnp.int32)
    tile_start = bounds[:-1]
    tile_count = bounds[1:] - bounds[:-1]
    num_pairs = bounds[-1]

    splat_gid = jnp.where(in_range, gid_sorted, -1)

    if row_cap_derived:
        # Legacy conflated protocol: one scalar must cover both axes.
        overflow = jnp.maximum(total_cand, 2 * total_rows).astype(jnp.int32)
    else:
        overflow = total_cand.astype(jnp.int32)
    # Samplesort range overflow (probability ~0: 25% headroom over the
    # 128x-oversampled quantiles): surface it through the pair-overflow
    # protocol so the trainer's monitor sees a cap breach, grows the cap,
    # and re-runs the step rather than training on dropped pairs.
    overflow = jnp.where(
        ss_overflow > 0, jnp.maximum(overflow, jnp.int32(cap + 1)), overflow
    )
    return TileTables(
        splat_gid=splat_gid,
        tile_start=tile_start,
        tile_count=tile_count,
        num_pairs=num_pairs,
        overflow=overflow,
        row_overflow=total_rows.astype(jnp.int32),
        stream=stream,
    )
