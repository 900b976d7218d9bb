"""Sort-cost probes at the bench operating point (queued-dispatch timing).

What exactly does lax.sort cost at ~7M elements as a function of operand
count and dtype on v5e? Decides the payload-packing strategy for the tile
sort and the gradient regroup sort.
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu.utils.platform import enable_compile_cache

enable_compile_cache("/root/repo/.jax_cache")

from scripts.mtime import timeit

rng = np.random.default_rng(0)
P = 6_815_744

key = jnp.asarray(rng.integers(0, 1 << 29, size=P).astype(np.int32))
pay32 = [
    jnp.asarray(
        rng.integers(-(2**31), 2**31 - 1, size=P, dtype=np.int64).astype(
            np.int32
        )
    )
    for _ in range(4)
]
pay64 = [
    jnp.asarray(rng.integers(0, 2**62, size=P, dtype=np.int64))
    for _ in range(2)
]


def mksort(n_keys):
    def f(*ops):
        return jax.lax.sort(ops, dimension=0, is_stable=False,
                            num_keys=n_keys)
    return jax.jit(f)


s = mksort(1)
timeit("sort 7M key only", s, key)
timeit("sort 7M key+1xi32", s, key, pay32[0])
timeit("sort 7M key+2xi32", s, key, *pay32[:2])
timeit("sort 7M key+3xi32", s, key, *pay32[:3])
timeit("sort 7M key+4xi32", s, key, *pay32[:4])
timeit("sort 7M key+2xi64", s, key, *pay64)
timeit("sort 7M key+1xi64", s, key, pay64[0])
# 2-key (tile sort shape): key + gid as tiebreak key + 4 payload
s2 = mksort(2)
timeit("sort 7M 2key+4xi32 (tile sort)", s2, key, pay32[0], *pay32[1:3],
       pay32[3], pay32[0])
# f32 payload (does dtype matter?)
pf = [jax.lax.bitcast_convert_type(p, jnp.float32) for p in pay32]
timeit("sort 7M key+4xf32", s, key, *pf)

# half-size: is sort superlinear?
h = P // 2
timeit("sort 3.4M key+4xi32", s, key[:h], *[p[:h] for p in pay32])
q = P // 4
timeit("sort 1.7M key+4xi32", s, key[:q], *[p[:q] for p in pay32])

# N-wide (1M): the depth pre-sort class
n = 1 << 20
timeit("sort 1M key+4xi32", s, key[:n], *[p[:n] for p in pay32])
