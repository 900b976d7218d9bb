"""Primitive cost model on the real TPU: variadic sort vs gather vs scatter.

Measures, at bench-relevant sizes, the per-element costs that decide how
permutations should be applied (payload riding vs index gather) and how much
each sort operand costs. Run: python scripts/micro_prims.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu.utils.platform import enable_compile_cache

enable_compile_cache()


def timeit(name, fn, *args, iters=8):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:48s} {best*1e3:9.3f} ms", flush=True)
    return best


rng = np.random.default_rng(0)

for n in (1 << 20, 7 * (1 << 20)):
    nm = f"{n>>20}M"
    key = jnp.asarray(rng.integers(0, 4300, size=n).astype(np.int32))
    iota = jnp.arange(n, dtype=jnp.int32)
    pays = [jnp.asarray(rng.integers(-2**30, 2**30, size=n).astype(np.int32))
            for _ in range(9)]
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))

    # sorts with varying payload operand counts
    for npay in (0, 1, 3, 5, 7):
        f = jax.jit(lambda k, i, *p: jax.lax.sort(
            (k, i) + p, dimension=0, is_stable=False, num_keys=2))
        timeit(f"sort {nm} 2key+{npay}pay", f, key, iota, *pays[:npay])
    # 1-key sort
    f = jax.jit(lambda k, *p: jax.lax.sort(
        (k,) + p, dimension=0, is_stable=False, num_keys=1))
    timeit(f"sort {nm} 1key+5pay", f, perm, *pays[:5])

    # gather: permutation applied to (n,) col, (n,5) rows, 5 separate cols
    g1 = jax.jit(lambda p, x: x[p])
    timeit(f"gather {nm} (n,) i32", g1, perm, pays[0])
    mat5 = jnp.stack(pays[:5], axis=1)
    timeit(f"gather {nm} (n,5) i32 rows", g1, perm, mat5)
    g5 = jax.jit(lambda p, *xs: tuple(x[p] for x in xs))
    timeit(f"gather {nm} 5x(n,) i32 cols", g5, perm, *pays[:5])
    mat20 = jnp.repeat(mat5, 4, axis=1)
    timeit(f"gather {nm} (n,20) i32 rows", g1, perm, mat20)

    # scatter rows
    s5 = jax.jit(lambda p, x: jnp.zeros_like(x).at[p].set(x))
    timeit(f"scatter {nm} (n,5) i32 rows", s5, perm, mat5)

    # elementwise pass for reference (read+write 5 cols)
    e5 = jax.jit(lambda *xs: tuple(x + 1 for x in xs))
    timeit(f"elementwise {nm} 5x(n,) i32", e5, *pays[:5])
print("done", flush=True)
