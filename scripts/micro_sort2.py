"""Sort-cost scaling probes: size, batching, key count, payload width.

Decides whether segmented (batched-2D) sorts beat the single 6.8M-element
pair sorts. Run on the real TPU.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu.utils.platform import enable_compile_cache

enable_compile_cache()

rng = np.random.default_rng(0)


def timeit(name, fn, *args, iters=8):
    out = fn(*args)
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(jnp.ravel(leaf)[0])
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = np.asarray(jnp.ravel(leaf)[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{name:44s} {best*1e3:9.2f} ms", flush=True)
    return best


P = 6815744
key = jnp.asarray(rng.integers(0, 1 << 29, size=P).astype(np.int32))
pay = [jnp.asarray(rng.integers(-2**31, 2**31 - 1, size=P, dtype=np.int64)
                   .astype(np.int32)) for _ in range(5)]

s6 = jax.jit(lambda k, p: jax.lax.sort((k,) + tuple(p), dimension=0,
                                       is_stable=False, num_keys=1))
base = timeit("1D sort 6op n=6.8M nk=1", s6, key, pay)

s6b = jax.jit(lambda k, p: jax.lax.sort((k, p[0]) + tuple(p[1:]), dimension=0,
                                        is_stable=False, num_keys=2))
timeit("1D sort 6op n=6.8M nk=2", s6b, key, pay)

s2 = jax.jit(lambda k, p: jax.lax.sort((k, p[0]), dimension=0,
                                       is_stable=False, num_keys=1))
timeit("1D sort 2op n=6.8M nk=1", s2, key, pay)

for g in (2, 4, 8, 16):
    n = P // g
    kg = key[: g * n].reshape(g, n)
    pg = [q[: g * n].reshape(g, n) for q in pay]
    sg = jax.jit(lambda k, p: jax.lax.sort((k,) + tuple(p), dimension=1,
                                           is_stable=False, num_keys=1))
    timeit(f"2D sort 6op ({g}, {n})", sg, kg, pg)

# smaller 1D sizes (scaling curve)
for n in (851968, 1703936, 3407872):
    kn = key[:n]
    pn = [q[:n] for q in pay]
    timeit(f"1D sort 6op n={n}", s6, kn, pn)

# stability cost
st = jax.jit(lambda k, p: jax.lax.sort((k,) + tuple(p), dimension=0,
                                       is_stable=True, num_keys=1))
timeit("1D sort 6op n=6.8M STABLE", st, key, pay)

# cumsum probes
for n in (1048576, 2883584, 6815744):
    x = jnp.asarray(rng.integers(0, 3, size=n).astype(np.int32))
    cs = jax.jit(lambda a: jnp.cumsum(a))
    timeit(f"cumsum int32 n={n}", cs, x)

# searchsorted probe (tile ranges)
sk = jnp.sort(key)
q = jnp.arange(4294, dtype=jnp.int32) * (1 << 16)
ss = jax.jit(lambda a, b: jnp.searchsorted(a, b).astype(jnp.int32))
timeit("searchsorted 4294 queries over 6.8M", ss, sk, q)
