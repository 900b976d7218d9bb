"""Honest micro-benchmarks (axon backend lies unless outputs are fetched)."""

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
mat8 = jnp.asarray(rng.normal(size=(N, 8)).astype(np.float32))
gid = jnp.asarray(rng.integers(0, N, P).astype(np.int32))
gid_sorted = jnp.sort(gid)
dst = jnp.asarray(rng.permutation(P).astype(np.int32))
vals16 = jnp.asarray(rng.normal(size=(P, 16)).astype(np.float32))
keys64 = jnp.asarray(
    (rng.integers(0, 4284, P).astype(np.int64) << 32)
    | rng.integers(0, 1 << 31, P).astype(np.int64)
)


def timeit(name, fn, *args, iters=3):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    jax.block_until_ready(out)
    # drain: force a real fetch so subsequent timings are honest
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf.ravel()[0])
    times = []
    for _i in range(iters):
        t0 = time.perf_counter()
        out = fn_j(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = np.asarray(leaf.ravel()[0])  # sync via 4-byte fetch
        times.append(time.perf_counter() - t0)
    print(f"{name:52s} {min(times)*1e3:9.2f} ms")
    return out


timeit("argsort f32 N=1M", lambda z: jnp.argsort(z), zf)
timeit("sort pairs (i32,i32) P=4M",
       lambda k, p: jax.lax.sort((k, p), dimension=0, is_stable=True, num_keys=1),
       keys, payload)
timeit("sort i64 single key P=4M", lambda k: jnp.sort(k), keys64)
timeit("row gather (P,16)<-(N,16) random", lambda m, g: m[g], mat, gid)
timeit("row gather (P,16)<-(N,16) sorted idx", lambda m, g: m[g], mat, gid_sorted)
timeit("row gather sorted idx + hint",
       lambda m, g: jax.lax.gather(
           m, g[:, None],
           jax.lax.GatherDimensionNumbers(
               offset_dims=(1,), collapsed_slice_dims=(0,),
               start_index_map=(0,)),
           slice_sizes=(1, 16), indices_are_sorted=True,
           mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS),
       mat, gid_sorted)
timeit("row gather (P,8)<-(N,8) random", lambda m, g: m[g], mat8, gid)
timeit("elem gather (P,)<-(N,) random", lambda m, g: m[:, 0][g], mat, gid)
timeit("row gather + transpose -> (16,P)", lambda m, g: m[g].T, mat, gid)
timeit("scatter rows (P,16)->(P,16) perm", lambda v, d: jnp.zeros((P, 16), jnp.float32).at[d].set(v), vals16, dst)
timeit("scatter elem i32 perm", lambda p, d: jnp.zeros((P,), jnp.int32).at[d].set(p), payload, dst)
timeit("scatter-add rows (P,16)->(N,16)", lambda v, g: jnp.zeros((N, 16), jnp.float32).at[g].add(v), vals16, gid)
timeit("take_along sorted->perm roundtrip gather i32", lambda p, d: p[d], payload, dst)
timeit("cumsum f32 P=4M", lambda k: jnp.cumsum(k.astype(jnp.float32)), keys)
timeit("transpose (P,16)->(16,P)", lambda v: v.T, vals16)
timeit("pack 9 cols -> (N,16)", lambda m: jnp.concatenate([m[:, :9], jnp.zeros((N, 7), jnp.float32)], 1), mat)
