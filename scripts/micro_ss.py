"""Pin down the fixed ~18ms in segment_expand: searchsorted vs records prep."""

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
    print(f"{name:48s} {best*1e3:9.2f} ms", flush=True)
    return best


R = 2_719_744
counts = rng.poisson(1.45, R).astype(np.int32) + 1
off = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
offs = jnp.asarray(off)

# null baseline: pure dispatch+fetch overhead
timeit("null (x+1 on 8 floats)", jax.jit(lambda x: x + 1),
       jnp.zeros(8, jnp.float32))

for nq in (1661, 26624):
    q = jnp.arange(nq, dtype=jnp.int32) * jnp.int32(256)
    f = jax.jit(lambda o, q: jnp.clip(
        jnp.searchsorted(o, q, side="right").astype(jnp.int32) - 1, 0, R - 1))
    timeit(f"searchsorted {nq}q over 2.7M", f, offs, q)

# records prep: split3 + pad + concat + tiled transpose (7 f32 + 8 b16)
from gsplat_tpu.kernels.expand import _split3, _tile_records

rec = jnp.asarray(rng.standard_normal((8, R)).astype(np.float32))
recb = jnp.asarray(rng.standard_normal((8, R)).astype(np.float32))


def prep(rec, recb, total):
    hi, mid, lo = _split3(rec)
    comb = jnp.concatenate([hi, mid, lo, recb.astype(jnp.bfloat16)], axis=0)
    return _tile_records(comb, (6, 14, 22), total, 4224)


timeit("records prep (split3+concat+tile)", jax.jit(prep), rec, recb,
       jnp.int32(R))

# strided slice toff
timeit("toff strided slice", jax.jit(lambda o: o[::128]), offs)
