import sys

sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

P = 1 << 22
N = 1 << 20

rng = np.random.default_rng(0)
keys = jnp.asarray(rng.integers(0, 4284, P).astype(np.int32))
payload = jnp.asarray(rng.integers(0, N, P).astype(np.int32))
zf = jnp.asarray(rng.uniform(0, 100, N).astype(np.float32))
mat = jnp.asarray(rng.normal(size=(N, 16)).astype(np.float32))
gid = jnp.asarray(rng.integers(0, N, P).astype(np.int32))
dst = jnp.asarray(rng.permutation(P).astype(np.int32))
vals16 = jnp.asarray(rng.normal(size=(16, P)).astype(np.float32))


def timeit(name, fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:42s} {dt:9.2f} ms")
    return out


timeit("argsort f32 N=1M", jax.jit(lambda z: jnp.argsort(z)), zf)
timeit("lax.sort (i32 key + i32 payload) P=4M",
       jax.jit(lambda k, p: jax.lax.sort((k, p), dimension=0, is_stable=True, num_keys=1)),
       keys, payload)
timeit("lax.sort key-only i32 P=4M",
       jax.jit(lambda k: jax.lax.sort((k,), dimension=0, is_stable=True, num_keys=1)),
       keys)
timeit("cumsum i32 P=4M", jax.jit(lambda k: jnp.cumsum(k)), keys)
timeit("gather rows (P,16) from (N,16)", jax.jit(lambda m, g: m[g]), mat, gid)
timeit("gather 9 cols separately",
       jax.jit(lambda m, g: [m[g, i] for i in range(9)]), mat, gid)
timeit("take axis0 then transpose -> (16,P)",
       jax.jit(lambda m, g: m[g].T), mat, gid)
timeit("scatter set i32 P=4M", jax.jit(lambda d, p: jnp.zeros(P, jnp.int32).at[d].set(p)), dst, payload)
timeit("scatter-add f32 (P->N) seg-sum",
       jax.jit(lambda g, v: jnp.zeros((N,), jnp.float32).at[g].add(v[0])), gid, vals16)
timeit("scatter-add f32 rows (P,16)->(N,16)",
       jax.jit(lambda g, v: jnp.zeros((N, 16), jnp.float32).at[g].add(v.T)), gid, vals16)
timeit("segment_sum sorted keys P=4M->4284",
       jax.jit(lambda k: jax.ops.segment_sum(jnp.ones(P, jnp.float32), k, num_segments=4284)), keys)
timeit("cummax i32 P=4M", jax.jit(lambda k: jax.lax.cummax(k)), keys)
timeit("searchsorted 4284 in sorted P=4M",
       jax.jit(lambda k: jnp.searchsorted(k, jnp.arange(4285, dtype=jnp.int32))),
       jnp.sort(keys))
