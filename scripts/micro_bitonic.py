"""Calibrate the cost of in-VMEM bitonic compare-exchange stages on TPU.

Decides the custom-sort question (VERDICT r4 item 1): a samplesort whose
phase 1/4 are in-VMEM bitonic networks costs ~(n_stages x ops/elem) VPU
work; lax.sort at 5.8M x 6 int32 operands costs ~31 ms. This script times
a Pallas kernel running REPRESENTATIVE stage patterns (sublane-strided
row stages + lane-roll stages) over (512, 128)-shaped blocks x W words,
WITHOUT full sort correctness, to get ms-per-stage-per-element before
committing to the full build.

Usage: python scripts/micro_bitonic.py [n_log2] [words]
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scripts.mtime import timeit

R = 512  # sublanes per block
L = 128  # lanes
S = R * L  # 65536 elements per block


def _row_stage(arrs, d, m_bit):
    """Compare-exchange at row distance d (column-major logical index:
    i = lane * R + row, so row distance d == logical distance d)."""
    key = arrs[0]
    g = arrs[1]
    ng = R // (2 * d)
    # (ng, 2, d, L) view: pair [*, 0] with [*, 1]
    def v(a):
        return a.reshape(ng, 2, d, L)

    kv, gv = v(key), v(g)
    k0, k1 = kv[:, 0], kv[:, 1]
    g0, g1 = gv[:, 0], gv[:, 1]
    # lexicographic (key, gid): does the pair need a swap (for ascending)?
    swap_asc = (k1 < k0) | ((k1 == k0) & (g1 < g0))
    # direction from bit m of the logical index
    if (1 << m_bit) < R:
        gi = jax.lax.broadcasted_iota(jnp.int32, (ng, 1, d, L), 0)
        desc = ((gi * 2 * d) >> m_bit) & 1
    else:
        li = jax.lax.broadcasted_iota(jnp.int32, (ng, 1, d, L), 3)
        desc = ((li * R) >> m_bit) & 1
    do_swap = swap_asc ^ (desc == 1)
    out = []
    for a in arrs:
        av = v(a)
        a0, a1 = av[:, 0], av[:, 1]
        n0 = jnp.where(do_swap[:, 0], a1, a0)
        n1 = jnp.where(do_swap[:, 0], a0, a1)
        out.append(
            jnp.stack([n0, n1], axis=1).reshape(R, L)
        )
    return out


def _lane_stage(arrs, dl, m_bit):
    """Compare-exchange at lane distance dl (logical distance dl * R)."""
    key, g = arrs[0], arrs[1]
    li = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    islow = (li & dl) == 0

    def partner(a):
        down = pltpu.roll(a, L - dl, 1)  # lane l <- l + dl
        up = pltpu.roll(a, dl, 1)  # lane l <- l - dl
        return jnp.where(islow, down, up)

    pk, pg = partner(key), partner(g)
    p_lt = (pk < key) | ((pk == key) & (pg < g))
    p_gt = (key < pk) | ((key == pk) & (g < pg))
    desc = ((li * R) >> m_bit) & 1
    want_min = islow ^ (desc == 1)
    take = jnp.where(want_min, p_lt, p_gt)
    out = [jnp.where(take, pk, key), jnp.where(take, pg, g)]
    for a in arrs[2:]:
        out.append(jnp.where(take, partner(a), a))
    return out


def make_kernel(words, row_stages, lane_stages):
    def kernel(*refs):
        ins = refs[:words]
        outs = refs[words:]
        arrs = [r[...] for r in ins]
        # representative row stages: distances cycle 256..1
        d = R // 2
        m = 9
        for _ in range(row_stages):
            arrs = _row_stage(arrs, d, m)
            d = max(1, d // 2)
            if d == R // 2:
                m += 1
        dl = 1
        for _ in range(lane_stages):
            arrs = _lane_stage(arrs, dl, 13)
            dl = dl * 2 if dl < 64 else 1
        for o, a in zip(outs, arrs):
            o[...] = a

    return kernel


def run(n, words, row_stages, lane_stages, iters=20):
    nblk = n // S
    rng = np.random.default_rng(0)
    ops = [
        jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.int32)).reshape(
            nblk, R, L
        )
        for _ in range(words)
    ]
    kern = make_kernel(words, row_stages, lane_stages)
    spec = [
        pl.BlockSpec((1, R, L), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM)
        for _ in range(words)
    ]

    @jax.jit
    def f(*xs):
        return pl.pallas_call(
            lambda *refs: kern(*[r.at[0] for r in refs[:words]],
                               *[r.at[0] for r in refs[words:]]),
            grid=(nblk,),
            in_specs=spec,
            out_specs=tuple(spec),
            out_shape=tuple(
                jax.ShapeDtypeStruct((nblk, R, L), jnp.int32)
                for _ in range(words)
            ),
        )(*xs)

    tot = row_stages + lane_stages
    t = timeit(
        f"n=2^{int(np.log2(n))} w={words} "
        f"rows={row_stages} lanes={lane_stages}",
        f, *ops, iters=iters,
    )
    per = t / (tot * n) * 1e12 if tot else 0.0
    print(f"    -> {per:8.2f} ps/elem/stage "
          f"({t*1e3/max(tot,1):.3f} ms/stage at n={n})")
    return t


def main():
    n = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 22)
    words = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    # Baseline: what does lax.sort cost on the same data?
    rng = np.random.default_rng(0)
    ops = tuple(
        jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.int32))
        for _ in range(words)
    )
    sortf = jax.jit(
        functools.partial(
            jax.lax.sort, dimension=0, is_stable=False, num_keys=2
        )
    )
    timeit(f"lax.sort n=2^{int(np.log2(n))} x{words} ops", sortf, ops)

    # DMA floor: 0 stages = pure pipeline in+out
    run(n, words, 0, 0)
    # row stages only
    run(n, words, 8, 0)
    run(n, words, 16, 0)
    # lane stages only
    run(n, words, 0, 8)
    # mixed, bitonic-like ratio (125 row : 28 lane scaled to 24:5)
    run(n, words, 24, 5)


if __name__ == "__main__":
    main()
