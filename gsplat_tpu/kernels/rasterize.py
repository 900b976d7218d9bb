"""Pallas TPU tile rasterizer — forward and backward kernels.

TPU-native re-design of the reference CUDA rasterizer
(/root/reference/cuda/render.cu, render_backward.cu). The CUDA kernels put one
warp on each 16x16 tile and walk the depth-sorted splat list sequentially with
per-pixel divergence (ballot early-exit, atomicAdd gradient flush). Neither
maps to a TPU, so this kernel instead:

- runs one grid program per tile, DMA-streaming the tile's splats from HBM
  in double-buffered, K-aligned chunks; tile ranges are UNALIGNED slices of
  the sorted pair stream (no padding), with both ends lane-masked;
- evaluates a whole (PIX=tile^2, K) alpha matrix per chunk on the VPU;
- replaces the sequential transmittance recurrence with LINEAR-SPACE prefix
  products along the splat axis: T_k = T_carry * cumprod(1 - alpha) — the
  same log-step roll scan as a cumsum but with multiplies, and ONE
  transcendental per pair-pixel (the exp of the Gaussian power) instead of
  three (exp/log1p/exp of the log-space formulation; measured ~25% faster).
  Safe in f32: within the alive region (T >= 1e-4 early-stop, alpha <=
  0.99) every partial product is >= ~1e-6; fully-dead pixels may underflow
  harmlessly after their T is frozen;
- replaces the backward's atomicAdd with per-pair gradient rows written at
  pair slots (the shared, unaligned head chunk goes to a per-tile side
  buffer owned by this tile; the previous tile owns the main write),
  reduced to per-Gaussian sums outside by a payload sort + cumsum
  difference (ops/render.py).

Compositing semantics match render.cu:49-107 exactly: alpha =
min(0.99, sigmoid(op)*exp(min(0, power))), the 1/255 cutoff, T < 1e-4
early-stop with T frozen at the crossing value, per-pixel splat counts of
every streamed real splat while alive, and background = T_final * bg.

The backward matches render_backward.cu:82-222 via the suffix-sum identity
  grad_alpha_k = dI.(c_k T_k) - dI.P_{k+1}/(1-alpha_k) - T_final/(1-alpha_k)*bg.dI
where P_k = sum_{j>=k} c_j alpha_j T_j, and intentionally reproduces the
reference's decisions to ignore the 0.99 alpha clamp and the power<=0 clamp
in the gradient (render_backward.cu:117-119,161-166).

Stream layouts (pair streams are TILED (P/128, ROWS, 128): one contiguous
HBM block per 128-pair chunk, so every chunk DMA is a single transfer
instead of strided per-row segments; no zero-padded rows ride the DMAs):
- splat stream, two auto-detected forms:
    packed (P/128, 4, 128) i32 — the tile sort's value operands verbatim
      (see PACKED_ROWS below); 2KB/chunk DMA, unpacked in VMEM
    exact  (P/128, 9, 128) f32 — rows [u v c00 c01 c11 opa r g b]
- forward out   (T, 8, PIX): rows [r g b T_final n_splats 0 0 0]
- backward pix  (T, 8, PIX): rows [dI_r dI_g dI_b T_final n_splats bg.dI 0 0]
- backward out, two forms selected by ``pack_grads``:
    exact  (P/128, 9, 128) f32 rows [du dv dc00 dc01 dc11 dop dr dg db]
    packed (P/128, 5, 128) i32 — the same nine rows as five bf16-pair
      words [du|dv, dc00|dc01, dc11|dop, dr|dg, db|0], written packed so
      the regroup sort and segment-sum consume them with no full-size
      XLA pack/unpack passes at P_cap (ops/render.py, kernels/segsum.py)
The uv-gradient convention factor (x0.5*W / x0.5*H,
render_backward.cu:186-187) is folded into the kernel via ``grad_scale``.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .packing import (
    GRAD_E5_BIAS, f16_bits_to_f32, pack_bf16_pair, pack_rgb_e5,
    unpack_bf16_pair, unpack_rgb_e5,
)

# MXU power evaluation (packed mode): the Gaussian exponent
#   power = -0.5(c00 dx^2 + 2 c01 dx dy + c11 dy^2),  dx = u - px,
# is a degree-2 polynomial in the pixel coords, so each chunk's whole
# (PIX, K) power matrix is ONE contraction of per-pair coefficient rows
# with the constant per-tile basis [1 px py px^2 px*py py^2] — the exact
# dual of the backward's moment extraction. Two bf16-split passes keep
# the coefficients to ~2^-16 relative (the bf16 conic the packed stream
# carries is already 2^-8), offloading the alpha quadratic from the VPU
# to the otherwise-idle MXU. Env-gated for A/B on hardware.
MXU_POWER = os.environ.get("GSPLAT_MXU_POWER", "1") == "1"
# The FORWARD kernel measured FASTER with the plain VPU quadratic (23.2 vs
# 25.2 ms @5.5M pairs): its per-chunk work is lighter than the backward's,
# so the MXU path's coeff build + two matmuls don't pay for the dx/dy FMAs
# they replace. The BACKWARD keeps the MXU path (20.0 vs 22.6 ms) — it
# already builds basis6 for moment extraction. Both env-overridable.
MXU_POWER_FWD = os.environ.get("GSPLAT_MXU_POWER_FWD", "0") == "1"
# Forward color accumulation as ONE (PIX,K)@(K,3) bf16 MXU matmul per
# chunk instead of six elementwise FMA passes on (PIX,K) f32 — offloads
# ~10% of the forward's VPU ops to the otherwise-idle MXU and shrinks the
# carried accumulator from three (PIX,K) matrices to one (PIX,3). Packed
# mode only (w is bf16-rounded: the same 0.4%-relative scale the packed
# stream's e5s9 colors already carry). Env-gated for A/B.
MXU_COLOR_FWD = os.environ.get("GSPLAT_MXU_COLOR_FWD", "1") == "1"
# Forward transmittance prefix as an MXU triangular matmul on
# log1p(-alpha) (3-pass bf16 split, ~5e-7 relative on T) instead of the
# log2(K)-step roll/multiply lane scan (~21 VPU ops per pair-pixel, the
# single largest VPU block in the kernel). Trades ~25 MFLOP/chunk of MXU
# (hidden behind the VPU) for the scan. Env-gated for A/B.
MXU_SCAN_FWD = os.environ.get("GSPLAT_MXU_SCAN_FWD", "0") == "1"

# Tiles per grid program: per-program fixed cost (out-block DMA turnaround
# + prologue) measured ~2 us on v5e, so one-tile programs put ~9 ms of pure
# overhead on a 4.3K-tile image; TPP tiles run sequentially per program and
# share one out-block pipeline DMA. Tile counts are padded with empty tiles.
TPP = int(os.environ.get("GSPLAT_TPP", "4"))  # 8 measured no better

ALPHA_CUTOFF = 0.00392156862  # 1/255 (render.cu:74)
T_EPS = 1e-4  # early-stop threshold (render.cu:77)
ALPHA_MAX = 0.99
# 9 live rows [u v c00 c01 c11 opa r g b], no zero padding: sublane counts
# need not be multiples of 8 for HBM arrays or DMA (VMEM pads internally),
# and the 16-row layout moved 78% more stream bytes through every chunk
# DMA, the sort-side stream build, and the gradient writes.
STREAM_ROWS = 9
# PACKED stream: the tile sort's 4 int32 value operands ride straight into
# the kernel without the XLA-side unpack/restack (which cost ~10 full-size
# elementwise passes at P_cap): row 0 = f16(u_rel)<<16 | f16(v_rel)
# TILE-RELATIVE positions, rows 1-2 = bf16 pairs (c00,c01) (c11,opa),
# row 3 = shared-exponent rgb word (kernels/packing.pack_rgb_e5). Kernels
# unpack per chunk in VMEM (bit math only — no hardware f16 dependency).
PACKED_ROWS = 4
# PACKED grad rows (pack_grads=True): the nine f32 gradient rows as three
# bf16-pair words [du|dv, dc00|dc01, dc11|dop] plus one shared-exponent
# signed triple [dr dg db] (kernels/packing.pack_rgb_e5 with the GRADIENT
# bias window) — 4 int32 words: half the out-DMA bytes of f32 AND one
# fewer regroup-sort payload operand (~5 ms/operand at 6.8M pairs); the
# regroup sort + segment-sum ride the words as-is.
GRAD_PACKED_ROWS = 4
OUT_ROWS = 8


def _unpack_attr_chunk(ci: jnp.ndarray) -> jnp.ndarray:
    """Packed (PACKED_ROWS, k) int32 chunk -> (9, k) f32 attribute rows.

    Row layout mirrors the f32 stream [u v c00 c01 c11 opa r g b], except
    u/v are TILE-RELATIVE (the kernels use tile-local pixel coords)."""
    w = jax.lax.bitcast_convert_type(ci, jnp.uint32)
    u = f16_bits_to_f32(w[0:1] >> 16)
    v = f16_bits_to_f32(w[0:1] & jnp.uint32(0xFFFF))
    c00, c01 = unpack_bf16_pair(w[1:2])
    c11, opa = unpack_bf16_pair(w[2:3])
    r, g, b = unpack_rgb_e5(ci[3:4])
    return jnp.concatenate([u, v, c00, c01, c11, opa, r, g, b], axis=0)


def pack_grad_rows(g9: jnp.ndarray) -> jnp.ndarray:
    """(9, k) f32 gradient rows -> (GRAD_PACKED_ROWS, k) int32 words.

    Word layout [du|dv, dc00|dc01, dc11|dop, e5s9(dr,dg,db)]. Uses the ONE
    shared bit format (kernels/packing.py) consumed by the regroup sort,
    the segment-sum kernel, and the side-add repack in ops/render.py."""
    return jnp.concatenate(
        [pack_bf16_pair(g9[i : i + 1], g9[i + 1 : i + 2])
         for i in range(0, 6, 2)]
        + [pack_rgb_e5(g9[6:7], g9[7:8], g9[8:9], bias=GRAD_E5_BIAS)],
        axis=0,
    )


def unpack_grad_rows(gw: jnp.ndarray) -> jnp.ndarray:
    """(GRAD_PACKED_ROWS, k) int32 packed words -> (9, k) f32 rows."""
    rows = []
    for i in range(3):
        hi, lo = unpack_bf16_pair(gw[i : i + 1])
        rows += [hi, lo]
    rows.extend(unpack_rgb_e5(gw[3:4], bias=GRAD_E5_BIAS))
    return jnp.concatenate(rows, axis=0)


def _lane_iota(pix: int, k: int):
    return jax.lax.broadcasted_iota(jnp.int32, (pix, k), 1)


def _cumprod_lanes(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Inclusive prefix product along the lane (minor) axis, log-step rolls."""
    lane = _lane_iota(x.shape[0], k)
    s = 1
    while s < k:
        rolled = pltpu.roll(x, s, 1)
        x = x * jnp.where(lane >= s, rolled, 1.0)
        s *= 2
    return x


def _excl_lanes(incl: jnp.ndarray, k: int) -> jnp.ndarray:
    """Inclusive -> exclusive prefix product (shift right, lane 0 := 1)."""
    lane = _lane_iota(incl.shape[0], k)
    return jnp.where(lane == 0, 1.0, pltpu.roll(incl, 1, 1))


def _suffix_sum_lanes(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Inclusive suffix sum along the lane axis."""
    lane = _lane_iota(x.shape[0], k)
    s = 1
    while s < k:
        rolled = pltpu.roll(x, k - s, 1)  # left-roll by s (shift must be >= 0)
        x = x + jnp.where(lane < k - s, rolled, 0.0)
        s *= 2
    return x


def _flat_chunk(chunk_vmem, slot, k: int):
    """Tiled (k/128, ROWS, 128) chunk -> flat (ROWS, k) values.

    k == 128 is a pure index; larger k concatenates the lane tiles (static
    register moves)."""
    kt = k // 128
    if kt == 1:
        return chunk_vmem[slot, 0]
    return jnp.concatenate(
        [chunk_vmem[slot, t] for t in range(kt)], axis=1
    )


def _pix_coords(tile_idx, num_tiles_x: int, tile: int, pix: int,
                packed: bool):
    """Pixel centers of this tile as (PIX, 1) f32 columns.

    GLOBAL coords for the f32 stream (u/v are absolute); TILE-LOCAL for the
    packed stream (u/v are tile-relative) — dx/dy are identical either way."""
    p = jax.lax.broadcasted_iota(jnp.int32, (pix, 1), 0)
    if packed:
        return (p % tile).astype(jnp.float32), (p // tile).astype(jnp.float32)
    tile_x = tile_idx % num_tiles_x
    tile_y = tile_idx // num_tiles_x
    px = (tile_x * tile + p % tile).astype(jnp.float32)
    py = (tile_y * tile + p // tile).astype(jnp.float32)
    return px, py


def _tile_basis6(tile: int, pix: int) -> jnp.ndarray:
    """(6, PIX) bf16 tile-local pixel basis [1 px py px^2 px*py py^2].

    Exact in bf16: px, py are tile-local ints <= 15, squares <= 225.
    Shared by the backward's MXU moment extraction and (MXU_POWER) both
    kernels' power evaluation."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, pix), 1)
    pxl = (lane % tile).astype(jnp.float32)
    pyl = (lane // tile).astype(jnp.float32)
    return jnp.concatenate(
        [jnp.ones((1, pix), jnp.float32), pxl, pyl,
         pxl * pxl, pxl * pyl, pyl * pyl], axis=0
    ).astype(jnp.bfloat16)


def _power_mxu(chunk, basis6, k: int):
    """(PIX, K) Gaussian exponent via two bf16-split MXU passes.

    power(px, py) = a0 + a1 px + a2 py + a3 px^2 + a4 px py + a5 py^2
    with per-pair coefficients from the expanded quadratic (K-wide VPU
    math, ~12 ops on 1xK rows). No cancellation amplification: px <= 15,
    so dx = u - px never loses leading digits against u."""
    u = chunk[0:1, :]
    v = chunk[1:2, :]
    c00 = chunk[2:3, :]
    c01 = chunk[3:4, :]
    c11 = chunk[4:5, :]
    coeff = jnp.concatenate(
        [
            -(0.5 * c00 * u * u + c01 * u * v + 0.5 * c11 * v * v),
            c00 * u + c01 * v,
            c01 * u + c11 * v,
            jnp.broadcast_to(-0.5 * c00, (1, k)),
            jnp.broadcast_to(-c01, (1, k)),
            jnp.broadcast_to(-0.5 * c11, (1, k)),
        ],
        axis=0,
    )  # (6, K) f32
    chi = coeff.astype(jnp.bfloat16)
    clo = (coeff - chi.astype(jnp.float32)).astype(jnp.bfloat16)
    dims = (((0,), (0,)), ((), ()))
    power = jax.lax.dot_general(
        basis6, chi, dims, preferred_element_type=jnp.float32
    )
    power += jax.lax.dot_general(
        basis6, clo, dims, preferred_element_type=jnp.float32
    )
    return power  # (PIX, K), pre-clamp


def _alpha_terms(chunk, px, py, pix: int, k: int, basis6=None):
    """Shared forward math: dx/dy, power, gval, alpha (pre-mask).

    With ``basis6`` (packed mode + MXU_POWER) the exponent comes from the
    MXU contraction and dx/dy are not formed (returned as None — the
    packed backward never uses them)."""
    opa = chunk[5:6, :]
    if basis6 is not None:
        power = jnp.minimum(0.0, _power_mxu(chunk, basis6, k))
        dx = dy = None
    else:
        u = chunk[0:1, :]
        v = chunk[1:2, :]
        c00 = chunk[2:3, :]
        c01 = chunk[3:4, :]
        c11 = chunk[4:5, :]
        dx = u - px  # (PIX, K)
        dy = v - py
        power = jnp.minimum(
            0.0,
            -0.5 * (c00 * dx * dx + 2.0 * c01 * dx * dy + c11 * dy * dy),
        )
    gval = jnp.exp(power)
    alpha = jnp.minimum(ALPHA_MAX, opa * gval)
    alpha = jnp.where(alpha > ALPHA_CUTOFF, alpha, 0.0)
    return dx, dy, gval, alpha, opa


def _forward_kernel(
    # scalar prefetch
    tile_start_ref, tile_count_ref, bg_ref,
    # inputs
    stream_ref,  # (P/128, 9, 128) in HBM/ANY, tiled layout
    # outputs
    out_ref,  # (TPP, 8, PIX) VMEM block
    # scratch
    chunk_vmem,  # (2, k/128, ROWS, 128) double buffer
    dma_sem,  # (2,) semaphores
    *, num_tiles_x: int, tile: int, pix: int, k: int, packed: bool,
    tpp: int,
):
    # TPP tiles per grid program: the per-program fixed cost (out-block DMA
    # turnaround + prologue) measured ~2 us on v5e — one program per tile
    # put ~9 ms of pure overhead on a 4.3K-tile image. Tiles run
    # sequentially inside the program; the out block batches TPP tiles into
    # one pipeline DMA.
    for tp in range(tpp):
        _forward_tile(
            tile_start_ref, tile_count_ref, bg_ref, stream_ref, out_ref,
            chunk_vmem, dma_sem, tp,
            num_tiles_x=num_tiles_x, tile=tile, pix=pix, k=k, packed=packed,
            tpp=tpp,
        )


def _forward_tile(
    tile_start_ref, tile_count_ref, bg_ref, stream_ref, out_ref,
    chunk_vmem, dma_sem, tp,
    *, num_tiles_x: int, tile: int, pix: int, k: int, packed: bool,
    tpp: int,
):
    t = pl.program_id(0) * tpp + tp
    start = tile_start_ref[t]
    count = tile_count_ref[t]
    bg = bg_ref[0]
    kt = k // 128
    p_cap = stream_ref.shape[0] * 128
    px, py = _pix_coords(t, num_tiles_x, tile, pix, packed)
    basis6 = _tile_basis6(tile, pix) if (packed and MXU_POWER_FWD) else None
    # Tile ranges are UNALIGNED slices of the sorted pair stream (no chunk
    # padding); chunks are read k-aligned and both ends lane-masked.
    lo = start - jax.lax.rem(start, k)

    def chunk_dma(j, slot):
        # Prefetched addresses may run one chunk past the tile's range (the
        # data is discarded); clamp so the slice stays inside the stream.
        off = jnp.minimum(lo + j * k, p_cap - k)
        return pltpu.make_async_copy(
            stream_ref.at[pl.ds(pl.multiple_of(off, k) // 128, kt)],
            chunk_vmem.at[slot],
            dma_sem.at[slot],
        )

    chunk_dma(0, 0).start()

    def cond(carry):
        j, tcar = carry[0], carry[1]
        return (lo + j * k < start + count) & (jnp.max(tcar) >= T_EPS)

    mxu_color = packed and MXU_COLOR_FWD
    mxu_scan = packed and MXU_SCAN_FWD
    if mxu_scan:
        # M[j, i] = 1 iff j <= i: (q @ M)[p, i] = inclusive prefix sum.
        rows_ = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
        cols_ = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
        incl_m = jnp.where(rows_ <= cols_, 1.0, 0.0).astype(jnp.bfloat16)

    # DEFERRED REDUCTIONS: the loop accumulates full (PIX, K) partials
    # elementwise (1 FMA per pair-pixel per output) and the lane reductions
    # (log2(K) shuffle-add steps each, x5 outputs) run ONCE after the loop
    # instead of once per chunk — measured as the largest share of the
    # loop's VPU ops after the alpha math itself. With MXU_COLOR_FWD the
    # three color accumulators collapse to one already-reduced (PIX, 3)
    # matmul output per chunk.
    def body(carry):
        j, tcar, tf_acc, accr, accg, accb, nacc = carry
        slot = jax.lax.rem(j, 2)
        chunk_dma(j + 1, 1 - slot).start()  # prefetch next chunk
        chunk_dma(j, slot).wait()
        chunk = _flat_chunk(chunk_vmem, slot, k)
        if packed:
            chunk = _unpack_attr_chunk(chunk)
        _, _, _, alpha, _ = _alpha_terms(chunk, px, py, pix, k, basis6)
        glob = _lane_iota(pix, k) + (lo + j * k)
        real = (glob >= start) & (glob < start + count)
        alpha = jnp.where(real, alpha, 0.0)

        if mxu_scan:
            # exp of the MXU prefix-sum of log1p(-alpha): alpha <= 0.99
            # bounds |log1p| <= 4.61, alpha == 0 contributes an exact 0.
            # 3-way bf16 split keeps the summed log error ~2^-24 * |sum|.
            s_log = jnp.log1p(-alpha)
            hi = s_log.astype(jnp.bfloat16)
            r1 = s_log - hi.astype(jnp.float32)
            mid = r1.astype(jnp.bfloat16)
            lo3 = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
            dims = (((1,), (0,)), ((), ()))
            pre = jax.lax.dot_general(
                hi, incl_m, dims, preferred_element_type=jnp.float32
            )
            pre += jax.lax.dot_general(
                mid, incl_m, dims, preferred_element_type=jnp.float32
            )
            pre += jax.lax.dot_general(
                lo3, incl_m, dims, preferred_element_type=jnp.float32
            )
            incl = jnp.exp(pre)
        else:
            incl = _cumprod_lanes(1.0 - alpha, k)
        t_entry = tcar * _excl_lanes(incl, k)  # T before each splat
        alive = t_entry >= T_EPS
        w = jnp.where(alive, alpha * t_entry, 0.0)

        if mxu_color:
            # ONE (PIX, K) @ (K, 3) bf16 pass: w is bf16-rounded (the
            # same 0.4%-relative scale the e5s9 colors already carry);
            # garbage-color lanes ride with w == 0 (finite x 0 == 0).
            cols3 = jnp.concatenate(
                [chunk[6:7, :], chunk[7:8, :], chunk[8:9, :]], axis=0
            ).astype(jnp.bfloat16)  # (3, K)
            accr = accr + jax.lax.dot_general(
                w.astype(jnp.bfloat16), cols3, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (PIX, 3)
        else:
            accr = accr + w * chunk[6:7, :]
            accg = accg + w * chunk[7:8, :]
            accb = accb + w * chunk[8:9, :]
        nacc = nacc + jnp.where(alive & real, 1.0, 0.0)

        # T < 1e-4 crossing freezes T at the crossing value (render.cu:76-87:
        # done pixels stop compositing). T is monotone decreasing along the
        # stream, so the FIRST crossing has the LARGEST post-T of all
        # crossings: an elementwise running max over (PIX, K) recovers the
        # freeze value with no per-chunk reduction.
        post = tcar * incl
        tf_acc = jnp.maximum(tf_acc, jnp.where(alive & (post < T_EPS),
                                               post, -1.0))

        tcar = tcar * incl[:, k - 1 : k]
        return j + 1, tcar, tf_acc, accr, accg, accb, nacc

    zeros = jnp.zeros((pix, k), jnp.float32)
    zc = jnp.zeros((pix, 3), jnp.float32) if mxu_color else zeros
    init = (
        0, jnp.ones((pix, 1), jnp.float32), jnp.full((pix, k), -1.0),
        zc, zeros if not mxu_color else jnp.zeros((0,), jnp.float32),
        zeros if not mxu_color else jnp.zeros((0,), jnp.float32), zeros,
    )
    j_end, tcar, tf_acc, accr, accg, accb, nacc = jax.lax.while_loop(
        cond, body, init
    )
    # Drain the one outstanding prefetch (chunk j_end) before returning.
    chunk_dma(j_end, jax.lax.rem(j_end, 2)).wait()
    cand = jnp.max(tf_acc, axis=1, keepdims=True)
    t_final = jnp.where(cand >= 0.0, cand, tcar)
    if mxu_color:
        accb = accr[:, 2:3]
        accg = accr[:, 1:2]
        accr = accr[:, 0:1]
    else:
        accr = jnp.sum(accr, axis=1, keepdims=True)
        accg = jnp.sum(accg, axis=1, keepdims=True)
        accb = jnp.sum(accb, axis=1, keepdims=True)
    nspl = jnp.sum(nacc, axis=1, keepdims=True)

    out_ref[tp, 0:1, :] = (accr + t_final * bg).reshape(1, pix)
    out_ref[tp, 1:2, :] = (accg + t_final * bg).reshape(1, pix)
    out_ref[tp, 2:3, :] = (accb + t_final * bg).reshape(1, pix)
    out_ref[tp, 3:4, :] = t_final.reshape(1, pix)
    out_ref[tp, 4:5, :] = nspl.reshape(1, pix)
    out_ref[tp, 5:8, :] = jnp.zeros((3, pix), jnp.float32)


def rasterize_forward(
    stream: jnp.ndarray,  # (P/128, 9, 128) f32 OR (P/128, 4, 128) i32 packed
    tile_start: jnp.ndarray,  # (T,) int32, arbitrary (unaligned) offsets
    tile_count: jnp.ndarray,  # (T,) int32
    bg: jnp.ndarray,  # () f32
    *, num_tiles_x: int, num_tiles: int, tile: int, k: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns (T, 8, PIX): [r g b T_final n_splats 0 0 0] per tile.

    The stream form is inferred from its row count: PACKED_ROWS means the
    packed int32 layout (tile-relative f16 uv + bf16 pairs), unpacked per
    chunk in VMEM; STREAM_ROWS means plain f32 rows with global uv.
    """
    pix = tile * tile
    rows = stream.shape[1]
    packed = rows == PACKED_ROWS
    tpp = TPP
    t_pad = -num_tiles % tpp
    if t_pad:  # pad with empty tiles (start 0, count 0): cheap no-ops
        zpad = jnp.zeros((t_pad,), jnp.int32)
        tile_start = jnp.concatenate([tile_start, zpad])
        tile_count = jnp.concatenate([tile_count, zpad])
    kernel = functools.partial(
        _forward_kernel, num_tiles_x=num_tiles_x, tile=tile, pix=pix, k=k,
        packed=packed, tpp=tpp,
    )
    p_cap = stream.shape[0] * 128
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=((num_tiles + t_pad) // tpp,),
        # HBM (not ANY): small streams fit VMEM where unaligned-sublane
        # memref slices are illegal (see kernels/expand.py).
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (tpp, OUT_ROWS, pix), lambda i, *_: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, k // 128, rows, 128), stream.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (num_tiles + t_pad, OUT_ROWS, pix), jnp.float32
        ),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(p_cap) * pix * 30,
            bytes_accessed=int(p_cap) * rows * 4 + num_tiles * pix * 32,
            transcendentals=int(p_cap) * pix * 1,
        ),
    )(tile_start, tile_count, bg.reshape(1), stream)
    return out[:num_tiles] if t_pad else out


def _backward_kernel(
    # scalar prefetch
    tile_start_ref, tile_count_ref, tile_maxn_ref,
    # inputs
    stream_ref,  # (P/128, ROWS, 128) ANY, tiled layout (f32 or packed i32)
    pix_ref,  # (TPP, 8, PIX) VMEM block: [dIr dIg dIb Tfin nspl bgdot 0 0]
    # outputs
    out_ref,  # (P/128, 9|4, 128) ANY, tiled layout (f32 or packed i32)
    side_ref,  # (TPP, 9, k) VMEM block: unaligned head chunks
    # scratch
    chunk_vmem, grad_flat, grad_vmem, in_sem, out_sem,
    *, num_tiles_x: int, tile: int, pix: int, k: int, packed: bool,
    pack_out: bool, scale_u: float, scale_v: float, tpp: int,
):
    # TPP tiles per program: see _forward_kernel.
    for tp in range(tpp):
        _backward_tile(
            tile_start_ref, tile_count_ref, tile_maxn_ref, stream_ref,
            pix_ref, out_ref, side_ref, chunk_vmem, grad_flat, grad_vmem,
            in_sem, out_sem, tp,
            num_tiles_x=num_tiles_x, tile=tile, pix=pix, k=k, packed=packed,
            pack_out=pack_out, scale_u=scale_u, scale_v=scale_v, tpp=tpp,
        )


def _backward_tile(
    tile_start_ref, tile_count_ref, tile_maxn_ref, stream_ref,
    pix_ref, out_ref, side_ref, chunk_vmem, grad_flat, grad_vmem,
    in_sem, out_sem, tp,
    *, num_tiles_x: int, tile: int, pix: int, k: int, packed: bool,
    pack_out: bool, scale_u: float, scale_v: float, tpp: int,
):
    t = pl.program_id(0) * tpp + tp
    start = tile_start_ref[t]
    count = tile_count_ref[t]
    maxn = tile_maxn_ref[t]
    kt = k // 128
    p_cap = stream_ref.shape[0] * 128
    # Unaligned tile ranges: chunks are k-aligned; the head chunk is shared
    # with the previous tile, which OWNS it (writes it to the main stream,
    # zeros outside its own lanes). An unaligned tile routes its head-chunk
    # gradients to side_ref instead; the host adds the side buffers back with
    # one tiny scatter-add (ops/render.py).
    lo = start - jax.lax.rem(start, k)
    aligned = start == lo
    nchunks_real = (start + count - lo + k - 1) // k
    nchunks_used = (start + maxn - lo + k - 1) // k
    px, py = _pix_coords(t, num_tiles_x, tile, pix, packed)

    side_ref[tp] = jnp.zeros((STREAM_ROWS, k), jnp.float32)

    dir_ = pix_ref[tp, 0:1, :].reshape(pix, 1)
    dig = pix_ref[tp, 1:2, :].reshape(pix, 1)
    dib = pix_ref[tp, 2:3, :].reshape(pix, 1)
    tfin = pix_ref[tp, 3:4, :].reshape(pix, 1)
    nspl = pix_ref[tp, 4:5, :].reshape(pix, 1)
    bgdot = pix_ref[tp, 5:6, :].reshape(pix, 1)

    if packed:
        # MXU MOMENT EXTRACTION (packed mode only): every per-pair gradient
        # row is a pixel reduction of (polynomial in px,py) x grad_power or
        # (dI_c) x w, so all nine rows derive from TWO small matmuls
        # against constant per-tile bases — (6,PIX)@(PIX,K) moments of
        # grad_power and (3,PIX)@(PIX,K) moments of w — replacing nine
        # log2(PIX)-step VPU sublane reductions per chunk and their
        # integrand products. bf16 inputs with f32 MXU accumulation: exact
        # for the basis (_tile_basis6), 0.4%-relative on gp/w — the same
        # rounding scale the packed pipeline's bf16 grads already carry.
        # Gated on ``packed`` because global px (f32 stream) would put px^2
        # up to ~1.7M into bf16 and amplify cancellation in
        # u^2*S0 - 2u*Sx + Sxx; the exact-f32 path keeps VPU reductions.
        basis6 = _tile_basis6(tile, pix)
        basis3 = pix_ref[tp, 0:3, :].astype(jnp.bfloat16)
    power_basis = basis6 if (packed and MXU_POWER) else None
    if packed and MXU_POWER:
        # Inclusive suffix-sum as one triangular contraction (see body):
        # M[j, i] = 1 iff j >= i, so (q @ M)[p, i] = sum_{j>=i} q[p, j].
        rows = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
        suffix_m = jnp.where(rows >= cols, 1.0, 0.0).astype(jnp.bfloat16)

    def in_dma(j, slot):
        off = jnp.minimum(jnp.maximum(lo + j * k, 0), p_cap - k)
        return pltpu.make_async_copy(
            stream_ref.at[pl.ds(pl.multiple_of(off, k) // 128, kt)],
            chunk_vmem.at[slot],
            in_sem.at[slot],
        )

    def out_dma(j, slot):
        return pltpu.make_async_copy(
            grad_vmem.at[slot],
            out_ref.at[pl.ds(pl.multiple_of(lo + j * k, k) // 128, kt)],
            out_sem.at[slot],
        )

    @pl.when(nchunks_used > 0)
    def _prologue():
        in_dma(nchunks_used - 1, jax.lax.rem(nchunks_used - 1, 2)).start()

    def body(i, carry):
        rcar, pq = carry  # carries over chunks, back-to-front
        j = nchunks_used - 1 - i
        slot = jax.lax.rem(j, 2)

        @pl.when(j > 0)
        def _prefetch():
            in_dma(j - 1, 1 - slot).start()

        in_dma(j, slot).wait()
        chunk = _flat_chunk(chunk_vmem, slot, k)
        if packed:
            chunk = _unpack_attr_chunk(chunk)
        dx, dy, gval, alpha, opa = _alpha_terms(
            chunk, px, py, pix, k, power_basis
        )
        # tile-relative depth rank of each lane's splat
        rel = (_lane_iota(pix, k) + (lo + j * k - start)).astype(jnp.float32)
        valid = (
            (alpha >= ALPHA_CUTOFF) & (rel >= 0.0) & (rel < nspl)
            & (rel < count)
        )
        alpha_v = jnp.where(valid, alpha, 0.0)
        g_v = jnp.where(valid, gval, 0.0)

        # Linear-space back-replay: rcar carries T at this chunk's EXIT;
        # one column division recovers T at entry, prefix products give
        # per-splat entry transmittances. Partial products over the valid
        # region are >= ~1e-6 (alpha <= 0.99, T >= 1e-4 while any splat
        # counted), so f32 is safe; the max() guards the dead-pixel case.
        incl = _cumprod_lanes(1.0 - alpha_v, k)
        t_chunk_in = rcar / jnp.maximum(incl[:, k - 1 : k], 1e-30)
        t_entry = t_chunk_in * _excl_lanes(incl, k)
        w = alpha_v * t_entry

        r = chunk[6:7, :]
        g = chunk[7:8, :]
        b = chunk[8:9, :]
        # The image cotangent is constant per pixel, so the reference's three
        # per-color accumulated-color sums collapse into ONE suffix sum of
        # q_k = w_k * (c_k . dI): sum_c pn_c dI_c = suffix(q)_k - q_k.
        q = w * (r * dir_ + g * dig + b * dib)
        if packed and MXU_POWER:
            # Suffix sum as a (PIX,K)@(K,K) triangular matmul: full-depth
            # contraction (the ideal MXU shape) replaces log2(K) VPU
            # roll+add+select passes. bf16-rounding q adds the same
            # 0.4%-relative scale q already carries from the packed
            # stream's bf16 colors; f32 accumulation.
            pk = jax.lax.dot_general(
                q.astype(jnp.bfloat16), suffix_m, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + pq
        else:
            pk = _suffix_sum_lanes(q, k) + pq
        pn = pk - q

        inv1ma = 1.0 / (1.0 - alpha_v)
        grad_alpha = (
            (r * dir_ + g * dig + b * dib) * t_entry
            - pn * inv1ma
            - (tfin * inv1ma) * bgdot
        )
        grad_power = g_v * grad_alpha * opa
        # d alpha / d opa_prob = g; the sigmoid chain o(1-o) of
        # render_backward.cu:154 is applied by AD through the stream gather
        # (build_splat_stream computes opa = sigmoid(logit)). In packed
        # (MXU-moment) mode Σ grad_op is recovered as S0/opa instead.
        grad_op = None if packed else g_v * grad_alpha

        # Reuse of this grad buffer: its previous out-DMA (chunk j+2, same
        # slot) must have completed.
        @pl.when(i >= 2)
        def _wait_prev_out():
            out_dma(j + 2, slot).wait()

        if packed:
            # See the basis6/basis3 comment above: nine pixel reductions as
            # two MXU matmuls. With dx = u - px (u per-pair, px per-pixel):
            #   Σ dx·gp      = u·S0 - Sx
            #   Σ dx²·gp     = u²·S0 - 2u·Sx + Sxx         (etc. for dy)
            #   Σ grad_op    = Σ gp/opa = S0/opa   (opa is per-pair, > 0)
            mb = jax.lax.dot_general(
                basis6, grad_power.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (6, k): [S0 Sx Sy Sxx Sxy Syy]
            md = jax.lax.dot_general(
                basis3, w.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (3, k): [Σ w·dIr, Σ w·dIg, Σ w·dIb]
            s0, sx, sy = mb[0:1, :], mb[1:2, :], mb[2:3, :]
            sxx, sxy, syy = mb[3:4, :], mb[4:5, :], mb[5:6, :]
            u = chunk[0:1, :]
            v = chunk[1:2, :]
            gx = u * s0 - sx  # Σ dx·gp
            gy = v * s0 - sy  # Σ dy·gp
            grad_flat[0:1, :] = (
                -scale_u * (chunk[2:3, :] * gx + chunk[3:4, :] * gy)
            )
            grad_flat[1:2, :] = (
                -scale_v * (chunk[4:5, :] * gy + chunk[3:4, :] * gx)
            )
            grad_flat[2:3, :] = -0.5 * (u * u * s0 - 2.0 * u * sx + sxx)
            grad_flat[3:4, :] = -(u * v * s0 - u * sy - v * sx + sxy)
            grad_flat[4:5, :] = -0.5 * (v * v * s0 - 2.0 * v * sy + syy)
            # Guard: tail lanes inside a used chunk can carry opa == 0
            # (zeroed expand tail); their gp columns are all 0, so the
            # clamp turns the 0/0 into an exact 0 and never perturbs a
            # real pair (a live pair has opa >> 1e-30 or alpha fully
            # below the cutoff, which also zeroes s0).
            grad_flat[5:6, :] = s0 / jnp.maximum(chunk[5:6, :], 1e-30)
            grad_flat[6:9, :] = md
        else:
            grad_flat[0:1, :] = scale_u * jnp.sum(
                -(chunk[2:3, :] * dx + chunk[3:4, :] * dy) * grad_power,
                axis=0, keepdims=True,
            )
            grad_flat[1:2, :] = scale_v * jnp.sum(
                -(chunk[4:5, :] * dy + chunk[3:4, :] * dx) * grad_power,
                axis=0, keepdims=True,
            )
            grad_flat[2:3, :] = jnp.sum(-0.5 * dx * dx * grad_power, axis=0,
                                        keepdims=True)
            grad_flat[3:4, :] = jnp.sum(-dx * dy * grad_power, axis=0,
                                        keepdims=True)
            grad_flat[4:5, :] = jnp.sum(-0.5 * dy * dy * grad_power, axis=0,
                                        keepdims=True)
            grad_flat[5:6, :] = jnp.sum(grad_op, axis=0, keepdims=True)
            grad_flat[6:7, :] = jnp.sum(w * dir_, axis=0, keepdims=True)
            grad_flat[7:8, :] = jnp.sum(w * dig, axis=0, keepdims=True)
            grad_flat[8:9, :] = jnp.sum(w * dib, axis=0, keepdims=True)
        # flat -> tiled for the contiguous out-DMA (packed mode compresses
        # the nine f32 rows to five bf16-pair words first: half the bytes)
        staged = pack_grad_rows(grad_flat[...]) if pack_out else grad_flat
        for tt in range(kt):
            grad_vmem[slot, tt] = staged[:, tt * 128 : (tt + 1) * 128]

        # Chunk 0 of an unaligned tile is owned by the previous tile: route
        # its gradients to the side buffer instead of the main stream.
        @pl.when((j > 0) | aligned)
        def _to_main():
            out_dma(j, slot).start()

        @pl.when((j == 0) & ~aligned)
        def _to_side():
            side_ref[tp] = grad_flat[...]

        return t_chunk_in, pk[:, 0:1]

    zeros = jnp.zeros((pix, 1), jnp.float32)
    jax.lax.fori_loop(0, nchunks_used, body, (tfin, zeros))

    # Drain the last (up to two) outstanding out-DMAs: chunks j=0 and j=1.
    @pl.when(nchunks_used >= 2)
    def _drain1():
        out_dma(1, 1).wait()

    @pl.when((nchunks_used >= 1) & aligned)
    def _drain0():
        out_dma(0, 0).wait()

    # Chunks past the deepest-needed splat (nchunks_used..nchunks_real) are
    # never written — they carry zero gradient and the XLA-side wrapper
    # zeroes them with a per-pair used-mask (ops/render.py). Writing them
    # here cost a serial start/wait DMA pair per chunk (~10 tail chunks x
    # 4316 tiles measured as a large slice of the kernel's 40 ms).
    del nchunks_real


def rasterize_backward(
    stream: jnp.ndarray,  # (P/128, 9, 128) f32 OR (P/128, 4, 128) i32 packed
    pix_stream: jnp.ndarray,  # (T, 8, PIX) f32
    tile_start: jnp.ndarray,
    tile_count: jnp.ndarray,
    tile_maxn: jnp.ndarray,
    *, num_tiles_x: int, num_tiles: int, tile: int, k: int,
    interpret: bool = False,
    pack_grads: bool = False,
    grad_scale: tuple[float, float] = (1.0, 1.0),
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (grad_stream tiled, side (T, 9, k) f32).

    grad_stream rows [du dv dc00 dc01 dc11 dop dr dg db]: f32
    (P/128, 9, 128) by default, or — with ``pack_grads`` — bf16-pair words
    (P/128, GRAD_PACKED_ROWS, 128) int32 (see pack_grad_rows). uv grads are
    scaled by ``grad_scale`` in-kernel (the reference's x0.5*W / x0.5*H
    convention, render_backward.cu:186-187). ``side`` holds each unaligned
    tile's head-chunk gradients (zeros for aligned tiles; always f32,
    scaled); callers add it into grad_stream at chunk floor(tile_start/k) —
    see ops/render.py."""
    pix = tile * tile
    p_cap = stream.shape[0] * 128
    in_rows = stream.shape[1]
    packed = in_rows == PACKED_ROWS
    out_rows = GRAD_PACKED_ROWS if pack_grads else STREAM_ROWS
    out_dtype = jnp.int32 if pack_grads else jnp.float32
    tpp = TPP
    t_pad = -num_tiles % tpp
    if t_pad:  # pad with empty tiles (start 0, count 0): cheap no-ops
        zpad = jnp.zeros((t_pad,), jnp.int32)
        tile_start = jnp.concatenate([tile_start, zpad])
        tile_count = jnp.concatenate([tile_count, zpad])
        tile_maxn = jnp.concatenate([tile_maxn, zpad])
        pix_stream = jnp.concatenate(
            [pix_stream, jnp.zeros((t_pad, OUT_ROWS, pix), jnp.float32)]
        )
    kernel = functools.partial(
        _backward_kernel, num_tiles_x=num_tiles_x, tile=tile, pix=pix, k=k,
        packed=packed, pack_out=pack_grads,
        scale_u=float(grad_scale[0]), scale_v=float(grad_scale[1]), tpp=tpp,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=((num_tiles + t_pad) // tpp,),
        in_specs=[
            # HBM (not ANY): small streams fit VMEM where unaligned-sublane
            # memref slices are illegal (see kernels/expand.py).
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(
                (tpp, OUT_ROWS, pix), lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(
                (tpp, STREAM_ROWS, k), lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, k // 128, in_rows, 128), stream.dtype),
            pltpu.VMEM((STREAM_ROWS, k), jnp.float32),
            pltpu.VMEM((2, k // 128, out_rows, 128), out_dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    grads, side = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((p_cap // 128, out_rows, 128), out_dtype),
            jax.ShapeDtypeStruct(
                (num_tiles + t_pad, STREAM_ROWS, k), jnp.float32
            ),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=int(p_cap) * pix * 60,
            bytes_accessed=int(p_cap) * (in_rows + out_rows + 7) * 4
            + num_tiles * pix * 32,
            transcendentals=int(p_cap) * pix * 2,
        ),
    )(tile_start, tile_count, tile_maxn, stream, pix_stream)
    return grads, (side[:num_tiles] if t_pad else side)
