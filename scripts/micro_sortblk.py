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

    from gsplat_tpu.kernels.sort import sort_blocks

    rng = np.random.default_rng(0)
    ops = tuple(
        jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.int32))
        for _ in range(words)
    )

    blk = jax.jit(functools.partial(sort_blocks, num_keys=2))
    t_blk = timeit(f"sort_blocks n=2^{nl} w={words}", blk, ops)

    sortf = jax.jit(functools.partial(
        jax.lax.sort, dimension=0, is_stable=False, num_keys=2))
    t_lax = timeit(f"lax.sort    n=2^{nl} w={words}", sortf, ops)

    # correctness spot-check on chip output
    out = blk(ops)
    ks = np.asarray(out[0]).reshape(-1, 65536)
    ok = all(bool(np.all(np.diff(row.astype(np.int64)) >= 0)) for row in ks)
    print(f"blocks sorted: {ok}")
    print(f"ratio lax/blk: {t_lax / t_blk:.2f}x  "
          f"(projected full samplesort ~ {2.24 * t_blk * 1e3 + 6:.1f} ms "
          f"vs lax {t_lax * 1e3:.1f} ms)")


if __name__ == "__main__":
    main()
