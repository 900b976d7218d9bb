"""Pallas in-VMEM bitonic samplesort for the pair streams.

The two `lax.sort`s (tile sort in ops/binning.py, gradient regroup in
ops/render.py) are ~38% of the train step at 1M Gaussians: lax.sort's
comparator network re-streams every operand from HBM for each of its
O(log^2 n) merge passes (~5.2 ms per int32 operand at 7M on v5e — ~30
HBM-roundtrip equivalents). The reference gets this from a CUB radix sort
at memory speed (culling.cu:455-470); TPU has no scatter primitive, so a
radix scatter is unavailable — but a SAMPLESORT whose compare-exchange
stages all run in VMEM pays HBM only O(1) times:

  phase 1  block sort: grid over blocks of S = 2^16 elements; the FULL
           bitonic network runs on (512, 128)-shaped registers in VMEM —
           sublane-strided pair views for distances < 512, lane rolls for
           larger. ONE HBM read + write; output interleaved
           (chunks, W, 128) so a 128-element chunk is one DMA unit.
  phase 2  splitters: R-quantiles of per-block regular samples (tiny XLA
           sort; ties broken by the second key, so duplicate-heavy key
           distributions still split exactly).
  phase 3  partition: each (block, range) run of the block-sorted stream
           moves to its destination range with chunked HBM DMAs; run
           phases are preserved (dst ≡ src mod 128) so full chunks copy
           directly and only the two boundary chunks bounce through VMEM
           (masked to sentinel keys).
  phase 4  range sort: each L_RANGE-padded range re-sorts in VMEM (the
           phase-1 network at 2x rows); sentinel pads sink to the tail.
  phase 5  assembly: ordered static-size dynamic-update-slices compact
           the ranges' valid prefixes into the exact flat output (later
           writes overwrite earlier ranges' pad tails).

Elements are (key [, key2], payload...) int32 words; the comparator is
lexicographic on the key(s) and equal-key elements never swap. The sort
is NOT stable, but for unique (key, key2) the result is fully
deterministic; the product tile sort's (key, gid) IS unique.

Keys must be < 2^31 - 1 (INT32_MAX is the internal sentinel); the
product keys are 30-bit composites, the gid sentinel is 1 << 23.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
ROWS = 512  # sublanes per phase-1 block
S_BLOCK = ROWS * LANE  # 65536 elements
# Phase-4 ranges reuse the PROVEN 512-row network size: the 1024-row
# variant compiles (under a raised scoped-vmem limit) but crashes the
# TPU worker at runtime (observed on v5e, 2026-08-21) — the fully
# unrolled 17x stages of (1024,128) roll/select temporaries exceed what
# the hardware tolerates. 512 rows halves range capacity (more ranges,
# same total work) and runs on the identical network as phase 1.
L_RANGE_ROWS = 512  # sublanes per phase-4 range
L_RANGE = L_RANGE_ROWS * LANE  # 131072 element slots per range
# Target fill per range (the rest is headroom for sample-quantile error
# and the <=128-slot per-run alignment pads; with 128 samples/block the
# quantile error is a few % — 25% headroom is far beyond any realistic
# imbalance, and phase 3 hard-clamps + reports overflow regardless).
_RANGE_TARGET = (L_RANGE * 3) // 4
_SAMPLES_PER_BLOCK = 128
_SENTINEL = 0x7FFFFFFF  # python int: jnp constants would be captured consts in kernels

# Distances below this use the two-roll formulation; from here up to the
# row count the reshape-pair formulation (half-size compares, 1 select
# per element-word) applies. Env-tunable for hardware A/B.
import os as _os

_RESHAPE_MIN_D = int(_os.environ.get("GSPLAT_SORT_RESHAPE_MIN_D", "8"))


def _cmp_lt(k0, g0, k1, g1):
    """(k0,g0) < (k1,g1) lexicographic; g may be None (single key)."""
    if g0 is None:
        return k0 < k1
    return (k0 < k1) | ((k0 == k1) & (g0 < g1))


def _stage_reshape(arrs, d: int, m: int, num_keys: int, rows: int):
    """Compare-exchange at row distance d via (ng, 2, d, L) pair views.

    The network runs in COLUMN-major logical order i = l * rows + r, so a
    row distance d is logical distance d and a lane distance dl is
    logical distance dl * rows."""
    ng = rows // (2 * d)

    def v(a):
        return a.reshape(ng, 2, d, LANE)

    kv = v(arrs[0])
    k0, k1 = kv[:, 0], kv[:, 1]
    if num_keys == 2:
        gv = v(arrs[1])
        g0, g1 = gv[:, 0], gv[:, 1]
    else:
        g0 = g1 = None
    swap_asc = _cmp_lt(k1, g1, k0, g0)  # inverted pair (for ascending)
    # Direction: descending iff bit m of the logical index is set. For
    # 2^m < rows the bit lives in the row field and is a function of the
    # pair-group index alone (2^m >= 2d); otherwise it lives in the lane.
    if (1 << m) < rows:
        gi = jax.lax.broadcasted_iota(jnp.int32, (ng, 1, LANE), 0)
        desc = ((gi * (2 * d)) >> m) & 1
    else:
        li = jax.lax.broadcasted_iota(jnp.int32, (ng, 1, LANE), 2)
        desc = ((li * rows) >> m) & 1
    do_swap = swap_asc ^ (desc == 1)  # (ng, d, L) via (ng, 1, L) broadcast
    out = []
    for a in arrs:
        av = v(a)
        a0, a1 = av[:, 0], av[:, 1]
        n0 = jnp.where(do_swap, a1, a0)
        n1 = jnp.where(do_swap, a0, a1)
        out.append(jnp.concatenate([n0[:, None], n1[:, None]], axis=1)
                   .reshape(rows, LANE))
    return out


def _stage_roll(arrs, d: int, m: int, num_keys: int, rows: int):
    """Compare-exchange at logical distance d via two rolls + selects.

    Row (sublane) axis for d < rows, lane axis for d >= rows."""
    if d < rows:
        axis, sh, size = 0, d, rows
        idx = jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 0)
    else:
        axis, sh, size = 1, d // rows, LANE
        idx = jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 1)
    islow = (idx & sh) == 0

    def partner(a):
        down = pltpu.roll(a, size - sh, axis)  # pos p <- p + sh
        up = pltpu.roll(a, sh, axis)  # pos p <- p - sh
        return jnp.where(islow, down, up)

    k = arrs[0]
    pk = partner(k)
    if num_keys == 2:
        g = arrs[1]
        pg = partner(g)
    else:
        g = pg = None
    p_lt = _cmp_lt(pk, pg, k, g)
    p_gt = _cmp_lt(k, g, pk, pg)
    if (1 << m) < rows:
        ri = jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 0)
        desc = (ri >> m) & 1
    else:
        li = jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 1)
        desc = ((li * rows) >> m) & 1
    want_min = islow ^ (desc == 1)
    # NOT jnp.where on bool operands: select-on-pred with i1 payloads
    # lowers to an i8->i1 trunci Mosaic rejects on real TPU.
    take = (want_min & p_lt) | (~want_min & p_gt)
    out = [jnp.where(take, pk, k)]
    if num_keys == 2:
        out.append(jnp.where(take, pg, g))
    for a in arrs[num_keys:]:
        out.append(jnp.where(take, partner(a), a))
    return out


def _bitonic_network(arrs, num_keys: int, rows: int = ROWS):
    """Full ascending bitonic sort of one (rows, LANE) register set in
    COLUMN-major logical order (i = lane * rows + row)."""
    s = rows * LANE
    log_s = (s - 1).bit_length()
    for m in range(1, log_s + 1):
        d = 1 << (m - 1)
        while d >= 1:
            if _RESHAPE_MIN_D <= d < rows:
                arrs = _stage_reshape(arrs, d, m, num_keys, rows)
            else:
                arrs = _stage_roll(arrs, d, m, num_keys, rows)
            d //= 2
    return arrs


def _cm_to_rm(a, rows: int):
    """Column-major logical (r, l) -> row-major (q, mlane) layout: the
    transpose's row-major linearization IS the logical order."""
    return a.T.reshape(rows, LANE)


def _rm_to_cm(a, rows: int):
    """Inverse of _cm_to_rm."""
    return a.reshape(LANE, rows).T


# ---------------------------------------------------------------------------
# Phase 1: block sort
# ---------------------------------------------------------------------------


def _sort_blocks_kernel(*refs, words: int, num_keys: int):
    ins = refs[:words]
    out_ref = refs[words]
    # Input order within a block is irrelevant (the block is sorted as a
    # SET): interpret the (ROWS, LANE) input as the network's column-major
    # register layout directly.
    arrs = [r[0] for r in ins]
    arrs = _bitonic_network(arrs, num_keys, ROWS)
    for w, a in enumerate(arrs):
        out_ref[0, :, w, :] = _cm_to_rm(a, ROWS)


def sort_blocks(
    operands: tuple[jnp.ndarray, ...],
    *,
    num_keys: int = 2,
    interpret: bool = False,
) -> jnp.ndarray:
    """Sort each S_BLOCK-sized block of the flat int32 operands.

    Returns the INTERLEAVED (n // 128, W, 128) layout: element i of the
    stream lives at [i // 128, :, i % 128]; each block ascends by the
    lexicographic (operands[0][, operands[1]]) key with payload words
    following their element. Unstable, but fully-equal key tuples never
    swap and unique keys give a deterministic result.
    """
    n = operands[0].shape[0]
    if n % S_BLOCK != 0:
        raise ValueError(f"n={n} must be a multiple of {S_BLOCK}")
    words = len(operands)
    nblk = n // S_BLOCK
    tiled = [op.reshape(nblk, ROWS, LANE) for op in operands]
    in_spec = pl.BlockSpec((1, ROWS, LANE), lambda b: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, ROWS, words, LANE), lambda b: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _sort_blocks_kernel, words=words, num_keys=num_keys
    )
    out = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[in_spec] * words,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((nblk, ROWS, words, LANE), jnp.int32),
        interpret=interpret,
        # The bitonic network's roll/select temporaries peak ~20 MB of
        # scoped VMEM at words=6; the default 16 MB limit is below the
        # v5e's physical 128 MB — raise it for this kernel only.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(n) * 140 * (words * 2 + 6),
            bytes_accessed=int(n) * words * 8,
            transcendentals=0,
        ),
    )(*tiled)
    return out.reshape(n // 128, words, LANE)


# ---------------------------------------------------------------------------
# Phase 2/3 host-side planning (small XLA ops)
# ---------------------------------------------------------------------------


def _bisect(key_b, gid_b, sk, sg, upper: bool):
    """Vectorized lexicographic lower/upper-bound search.

    key_b/gid_b: (B, S) sorted blocks; sk/sg: (Q,) splitters. Returns
    (B, Q) bounds. Fixed-trip bisection with guarded updates: while
    lo < hi the probe mid = lo + (hi - lo) // 2 stays < hi <= s (in
    bounds); once lo == hi the state must freeze (an unguarded update at
    the clamped gather index can push lo past s — observed as a 65537
    bound on a 65536 block, turning a run length negative)."""
    bsz, s = key_b.shape
    q = sk.shape[0]
    lo = jnp.zeros((bsz, q), jnp.int32)
    hi = jnp.full((bsz, q), s, jnp.int32)
    sk2 = sk[None, :]
    sg2 = sg[None, :] if sg is not None else None
    for _ in range(s.bit_length()):
        live = lo < hi
        mid = lo + (hi - lo) // 2
        km = jnp.take_along_axis(key_b, mid, axis=1)
        gm = (jnp.take_along_axis(gid_b, mid, axis=1)
              if sg is not None else None)
        if upper:
            go_right = ~_cmp_lt(sk2, sg2, km, gm)  # elem <= splitter
        else:
            go_right = _cmp_lt(km, gm, sk2, sg2)  # elem < splitter
        lo = jnp.where(live & go_right, mid + 1, lo)
        hi = jnp.where(live & ~go_right, mid, hi)
    return lo


def _block_searchsorted(key_b, gid_b, sk, sg, sp):
    """Per-block rank of splitters under the TOTAL order
    (key[, gid], global-sorted-position).

    The position tiebreak (``sp`` = each splitter's own global position
    b * S_BLOCK + sorted-local-index) makes partitioning balanced for
    ARBITRARY key duplication — without it, a run of equal keys larger
    than one range (e.g. the invalid-tail sentinels, easily hundreds of
    thousands of identical tuples) would land in a single range and
    overflow it. Equal-key elements are contiguous in a sorted block, so
    the rank is lower_bound + clip(sp - block_base - lower, 0, run)."""
    bsz, s = key_b.shape
    lo_kg = _bisect(key_b, gid_b, sk, sg, upper=False)  # (B, Q)
    hi_kg = _bisect(key_b, gid_b, sk, sg, upper=True)  # (B, Q)
    base = (jnp.arange(bsz, dtype=jnp.int32) * s)[:, None]
    cut = jnp.clip(sp[None, :] - base - lo_kg, 0, hi_kg - lo_kg)
    return lo_kg + cut


# ---------------------------------------------------------------------------
# Phase 3: partition kernel
# ---------------------------------------------------------------------------

_MAIN_TIERS = (64, 8, 1)  # chunk-row DMA sizes (log-stepped)



def _partition_kernel(
    # scalar prefetch
    src_ref,  # (B, R) int32 global src element start of each run
    len_ref,  # (B, R) int32 run length (elements)
    dst_ref,  # (B, R) int32 global dst element start (dst ≡ src mod 128)
    # inputs
    in_hbm,  # (n/128, W, LANE) interleaved block-sorted stream
    # outputs
    out_hbm,  # (R * L_RANGE/128, W, LANE)
    # scratch
    bounce,  # (2, 1, W, LANE) VMEM
    b_sem,  # (2,) DMA semaphores for bounces
    m_sem,  # () DMA semaphore shared by all main copies (counts add)
    *, words: int, num_keys: int, n_ranges: int,
):
    b = pl.program_id(0)
    out_rows = out_hbm.shape[0]

    def run_geometry(r):
        s = src_ref[b, r]
        ln = len_ref[b, r]
        d = dst_ref[b, r]
        e = s + ln
        # chunk geometry (dst mirrors src phase, so rows map 1:1)
        head_pad = jax.lax.rem(s, 128)
        c_lo = s // 128  # first src chunk touched
        c_hi = (e + 127) // 128  # one past last src chunk
        full_lo = jnp.where(head_pad > 0, c_lo + 1, c_lo)
        tail_pad = jax.lax.rem(e, 128)
        full_hi = jnp.where(tail_pad > 0, c_hi - 1, c_hi)
        full_hi = jnp.maximum(full_hi, full_lo)
        drow = d // 128 - c_lo  # constant row shift for this run
        # clamp: never write past this range's row span (overflow is
        # reported by the host-side plan; here we only protect memory)
        range_end_row = jnp.minimum(
            (d // 128 - jax.lax.rem(d // 128, L_RANGE // 128))
            + L_RANGE // 128,
            out_rows,
        )
        return (s, ln, e, head_pad, c_lo, c_hi, full_lo, full_hi,
                tail_pad, drow, range_end_row)

    def main_sweep(issue: bool):
        """Log-stepped static-size row DMAs for every run's full chunks.

        DMA semaphores are waited via a recreated descriptor, so the
        sweep runs twice: once starting every copy (they overlap in
        flight; dst spans of distinct runs are disjoint by construction)
        and once waiting them in issue order."""

        def run_body(r, _):
            (_, _, _, _, _, _, full_lo, full_hi, _, drow,
             range_end_row) = run_geometry(r)

            def tier_loop(tier, c0):
                def cond(c):
                    return c + tier <= full_hi

                def body(c):
                    dr = c + drow

                    @pl.when(dr + tier <= range_end_row)
                    def _():
                        cp = pltpu.make_async_copy(
                            in_hbm.at[pl.ds(c, tier)],
                            out_hbm.at[pl.ds(dr, tier)],
                            m_sem,
                        )
                        if issue:
                            cp.start()
                        else:
                            cp.wait()

                    return c + tier

                return jax.lax.while_loop(cond, body, c0)

            c = full_lo
            for tier in _MAIN_TIERS:
                c = tier_loop(tier, c)
            return 0

        jax.lax.fori_loop(0, n_ranges, run_body, 0)

    main_sweep(issue=True)

    # --- boundary chunks bounce through VMEM with sentinel masking.
    # The read+mask always runs (harmless); only the write-back is
    # predicated, so an unused bounce never clobbers a main chunk.
    def bounce_body(r, _):
        (_, ln, e, head_pad, c_lo, c_hi, _, _, tail_pad, drow,
         range_end_row) = run_geometry(r)

        def do_bounce(chunk, lane_lo, lane_hi, needed, slot):
            chunk = jnp.clip(chunk, 0, in_hbm.shape[0] - 1)
            cp_in = pltpu.make_async_copy(
                in_hbm.at[pl.ds(chunk, 1)], bounce.at[slot],
                b_sem.at[slot],
            )
            cp_in.start()
            cp_in.wait()
            li = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
            keep = (li >= lane_lo) & (li < lane_hi)  # (1, LANE)
            bounce[slot, 0, 0:1, :] = jnp.where(
                keep, bounce[slot, 0, 0:1, :], _SENTINEL
            )
            if num_keys == 2:
                bounce[slot, 0, 1:2, :] = jnp.where(
                    keep, bounce[slot, 0, 1:2, :], _SENTINEL
                )
            dr = chunk + drow

            @pl.when(needed & (dr >= 0) & (dr < range_end_row))
            def _():
                cp_out = pltpu.make_async_copy(
                    bounce.at[slot], out_hbm.at[pl.ds(dr, 1)],
                    b_sem.at[slot],
                )
                cp_out.start()
                cp_out.wait()

        one_chunk = c_hi == c_lo + 1
        head_hi = jnp.where(one_chunk, e - c_lo * 128, 128)
        do_bounce(c_lo, head_pad, head_hi,
                  (ln > 0) & (head_pad > 0), 0)
        do_bounce(c_hi - 1, 0, tail_pad,
                  (ln > 0) & (tail_pad > 0)
                  & ~(one_chunk & (head_pad > 0)), 1)
        return 0

    jax.lax.fori_loop(0, n_ranges, bounce_body, 0)

    # Drain every main DMA (recreated descriptors, issue order).
    main_sweep(issue=False)


# ---------------------------------------------------------------------------
# Phase 4: range sort kernel
# ---------------------------------------------------------------------------


def _range_sort_kernel(
    valid_ref,  # (R,) int32 padded fill per range (slots beyond: garbage)
    in_hbm,  # (R * L_RANGE/128, W, LANE) partitioned stream
    out_hbm,  # same shape
    scratch,  # (L_RANGE/128, W, LANE) VMEM
    sem,  # () DMA semaphore
    *, words: int, num_keys: int,
):
    # Manual single-buffered DMA: a (1024, W, 128) block is ~3 MB at 6
    # words — BlockSpec's in+out double buffering would put 12 MB of
    # pipeline buffers next to the network's ~6 MB of live registers.
    # The DMA is ~7 us against ~100+ us of sort compute per range, so
    # pipelining buys nothing here.
    r = pl.program_id(0)
    nvalid = valid_ref[r]
    rows = L_RANGE_ROWS
    cp_in = pltpu.make_async_copy(
        in_hbm.at[pl.ds(r * (L_RANGE // 128), L_RANGE // 128)],
        scratch, sem,
    )
    cp_in.start()
    cp_in.wait()
    arrs = [scratch[:, w, :] for w in range(words)]
    # mask garbage tail slots (beyond the padded fill) to the sentinel;
    # interior alignment pads already carry sentinels from phase 3.
    ci = jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 0)
    li = jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 1)
    dead = (ci * LANE + li) >= nvalid
    arrs[0] = jnp.where(dead, _SENTINEL, arrs[0])
    if num_keys == 2:
        arrs[1] = jnp.where(dead, _SENTINEL, arrs[1])
    # row-major physical -> column-major register labeling (the valid
    # mask above indexed physical row-major slots)
    arrs = [_rm_to_cm(a, rows) for a in arrs]
    arrs = _bitonic_network(arrs, num_keys, rows)
    for w, a in enumerate(arrs):
        scratch[:, w, :] = _cm_to_rm(a, rows)
    cp_out = pltpu.make_async_copy(
        scratch,
        out_hbm.at[pl.ds(r * (L_RANGE // 128), L_RANGE // 128)],
        sem,
    )
    cp_out.start()
    cp_out.wait()


# ---------------------------------------------------------------------------
# Full samplesort
# ---------------------------------------------------------------------------


def sample_sort(
    operands: tuple[jnp.ndarray, ...],
    *,
    num_keys: int = 2,
    interpret: bool = False,
    _stop_after_phase: int = 5,  # hardware-bisect debug knob
) -> tuple[tuple[jnp.ndarray, ...], jnp.ndarray]:
    """Fully sort flat int32 operands by the lexicographic leading key(s).

    Returns (sorted operands, overflow flag). The flag is nonzero if any
    range's padded fill exceeded L_RANGE (probability ~0 with the 25%
    headroom and 128x oversampling; partition clamps to protect memory,
    so a nonzero flag means dropped elements and the caller must treat
    the result like a capacity overflow).

    Requirements: n a multiple of S_BLOCK; keys < INT32_MAX (the
    sentinel). Unstable; deterministic for unique key tuples.
    """
    n = operands[0].shape[0]
    words = len(operands)
    bsz = n // S_BLOCK

    # ---- phase 1
    inter = sort_blocks(operands, num_keys=num_keys, interpret=interpret)
    key_s = inter[:, 0, :].reshape(bsz, S_BLOCK)
    gid_s = (inter[:, 1, :].reshape(bsz, S_BLOCK)
             if num_keys == 2 else None)

    # ---- phase 2: splitters from regular samples of the sorted blocks.
    # Each sample carries its GLOBAL SORTED POSITION (block * S_BLOCK +
    # local index) as the final splitter tiebreak — see
    # _block_searchsorted: without it a mega-run of equal keys (the
    # invalid-tail sentinels) would overflow one range.
    n_ranges = max(1, -(-n // _RANGE_TARGET))
    step = S_BLOCK // _SAMPLES_PER_BLOCK
    samp_k = key_s[:, ::step].reshape(-1)
    samp_p = (
        (jnp.arange(bsz, dtype=jnp.int32) * S_BLOCK)[:, None]
        + (jnp.arange(_SAMPLES_PER_BLOCK, dtype=jnp.int32) * step)[None, :]
    ).reshape(-1)
    if num_keys == 2:
        samp_g = gid_s[:, ::step].reshape(-1)
        sk_sorted, sg_sorted, sp_sorted = jax.lax.sort(
            (samp_k, samp_g, samp_p), dimension=0, is_stable=False,
            num_keys=3,
        )
    else:
        sk_sorted, sp_sorted = jax.lax.sort(
            (samp_k, samp_p), dimension=0, is_stable=False, num_keys=2
        )
        sg_sorted = None
    a_tot = bsz * _SAMPLES_PER_BLOCK
    q_idx = (jnp.arange(1, n_ranges, dtype=jnp.int32) * a_tot) // n_ranges
    sk = sk_sorted[q_idx]
    sg = sg_sorted[q_idx] if num_keys == 2 else None
    sp = sp_sorted[q_idx]

    # ---- phase 3 plan: per-(block, range) runs
    pos_in = _block_searchsorted(key_s, gid_s, sk, sg, sp)  # (B, R-1)
    zeros = jnp.zeros((bsz, 1), jnp.int32)
    full = jnp.full((bsz, 1), S_BLOCK, jnp.int32)
    bounds = jnp.concatenate([zeros, pos_in, full], axis=1)  # (B, R+1)
    starts = bounds[:, :-1]  # (B, R) within-block element starts
    lens = bounds[:, 1:] - bounds[:, :-1]  # (B, R)
    src = (jnp.arange(bsz, dtype=jnp.int32)[:, None] * S_BLOCK) + starts
    phase = jax.lax.rem(starts, 128)
    eff = jnp.where(lens > 0, ((phase + lens + 127) // 128) * 128, 0)
    # exclusive prefix over blocks per range -> local chunk-aligned base
    loc_base = jnp.cumsum(eff, axis=0) - eff  # (B, R)
    range_fill = loc_base[-1] + eff[-1]  # (R,) padded fill
    overflow = jnp.sum(
        jnp.where(range_fill > L_RANGE, range_fill - L_RANGE, 0)
    )
    loc = loc_base + jnp.where(lens > 0, phase, 0)
    dst = (jnp.arange(n_ranges, dtype=jnp.int32)[None, :] * L_RANGE) + loc

    out_rows = n_ranges * (L_RANGE // 128)
    if _stop_after_phase <= 2:
        return (starts, lens, dst), overflow
    part = pl.pallas_call(
        functools.partial(
            _partition_kernel, words=words, num_keys=num_keys,
            n_ranges=n_ranges,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(bsz,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
            scratch_shapes=[
                pltpu.VMEM((2, 1, words, LANE), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((out_rows, words, LANE), jnp.int32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(n) * 4,
            bytes_accessed=int(n) * words * 8,
            transcendentals=0,
        ),
    )(src, lens, dst, inter)

    if _stop_after_phase <= 3:
        return (part.reshape(-1),), overflow
    # ---- phase 4: sort each range in VMEM
    sorted_ranges = pl.pallas_call(
        functools.partial(
            _range_sort_kernel, words=words, num_keys=num_keys
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_ranges,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
            scratch_shapes=[
                pltpu.VMEM((L_RANGE // 128, words, LANE), jnp.int32),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((out_rows, words, LANE), jnp.int32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(n_ranges * L_RANGE) * 160 * (words * 2 + 6),
            bytes_accessed=int(n_ranges * L_RANGE) * words * 8,
            transcendentals=0,
        ),
    )(jnp.minimum(range_fill, L_RANGE), part)
    sorted_ranges = sorted_ranges.reshape(
        n_ranges, L_RANGE // 128, words, LANE
    )
    if _stop_after_phase <= 4:
        return (sorted_ranges.reshape(-1),), overflow

    # ---- phase 5: assembly — ordered static-size DUS; each range's
    # sentinel pad tail is overwritten by the next range's real prefix.
    v = jnp.sum(lens, axis=0)  # (R,) true fill
    starts_g = jnp.cumsum(v) - v  # exclusive prefix = exact global starts
    outs = []
    for w in range(words):
        flat = sorted_ranges[:, :, w, :].reshape(n_ranges * L_RANGE)
        acc = jnp.zeros((n + L_RANGE,), jnp.int32)
        for r in range(n_ranges):
            seg = jax.lax.dynamic_slice(
                flat, (r * L_RANGE,), (L_RANGE,)
            )
            acc = jax.lax.dynamic_update_slice(acc, seg, (starts_g[r],))
        outs.append(acc[:n])
    return tuple(outs), overflow
