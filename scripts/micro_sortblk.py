"""Time the in-VMEM bitonic block sort (kernels/sort.py phase 1) vs
lax.sort on the real chip — the go/no-go measurement for the custom
samplesort (VERDICT r4 item 1).

Usage: python scripts/micro_sortblk.py [n_log2=22] [words=6]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import numpy as np

import jax
import jax.numpy as jnp

from scripts.mtime import timeit


def main():
    nl = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    words = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    n = 1 << nl

    from gsplat_tpu.utils.platform import enable_compile_cache

    enable_compile_cache(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))

    from gsplat_tpu.kernels.sort import S_BLOCK, sample_sort, sort_blocks

    rng = np.random.default_rng(0)
    # Clustered keys like the real pair stream (Morton-coherent blocks):
    # each S_BLOCK-sized block concentrates in a narrow key interval.
    nblk = n // S_BLOCK
    base = np.repeat(
        np.sort(rng.integers(0, 1 << 13, nblk * 4)), n // (nblk * 4)
    )
    key = (base * (1 << 17) + rng.integers(0, 1 << 17, n)).astype(np.int32)
    gid = rng.permutation(n).astype(np.int32) % (1 << 20)
    ops = (jnp.asarray(key), jnp.asarray(gid)) + tuple(
        jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.int32))
        for _ in range(words - 2)
    )

    blk = jax.jit(functools.partial(sort_blocks, num_keys=2))
    t_blk = timeit(f"sort_blocks n=2^{nl} w={words}", blk, ops)

    sortf = jax.jit(functools.partial(
        jax.lax.sort, dimension=0, is_stable=False, num_keys=2))
    t_lax = timeit(f"lax.sort    n=2^{nl} w={words}", sortf, ops)

    ssf = jax.jit(functools.partial(sample_sort, num_keys=2))
    t_ss = timeit(f"sample_sort n=2^{nl} w={words}", ssf, ops)

    ss1 = jax.jit(functools.partial(sample_sort, num_keys=1))
    t_ss1 = timeit(f"sample_sort n=2^{nl} w={words} 1key",
                   ss1, ops[:1] + ops[2:])
    sort1 = jax.jit(functools.partial(
        jax.lax.sort, dimension=0, is_stable=False, num_keys=1))
    t_lax1 = timeit(f"lax.sort    n=2^{nl} w={words} 1key",
                    sort1, ops[:1] + ops[2:])

    # correctness checks on chip output
    blk_out = blk(ops)  # interleaved (n/128, W, 128), sorted per block
    bks = np.asarray(blk_out[:, 0, :]).reshape(-1, S_BLOCK)
    blk_ok = all(
        bool(np.all(np.diff(row.astype(np.int64)) >= 0)) for row in bks
    )
    print(f"blocks sorted: {blk_ok}")
    (out, ovf) = ssf(ops)
    ks, gs = np.asarray(out[0]), np.asarray(out[1])
    order = np.lexsort((gid, key))
    ok = bool(np.array_equal(ks, key[order]) and np.array_equal(
        gs, gid[order]))
    print(f"sample_sort exact match: {ok}  overflow: {int(ovf)}")
    print(f"2-key: blk {t_blk*1e3:.2f} ms | samplesort {t_ss*1e3:.2f} ms | "
          f"lax {t_lax*1e3:.2f} ms -> {t_lax/t_ss:.2f}x")
    print(f"1-key: samplesort {t_ss1*1e3:.2f} ms | lax {t_lax1*1e3:.2f} ms "
          f"-> {t_lax1/t_ss1:.2f}x")


if __name__ == "__main__":
    main()
