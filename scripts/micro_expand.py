"""Expand-kernel + rasterize-kernel overhead probes at the bench operating
point. Run on the real TPU.

Measures:
- segment_expand at expand2's realistic shape (R rows -> P slots, x1.6)
- the same with an EMPTY workload (total=tiny) to expose fixed per-program
  grid overhead
- rasterize_forward with all-zero tile counts (pure grid overhead/program)
- int64-payload sort probe: does packing 4 int32 payload words into 2
  int64 operands move them cheaper through lax.sort?
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu.utils.platform import enable_compile_cache

enable_compile_cache()

from gsplat_tpu.kernels.expand import segment_expand

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


# ---- expand2-shaped workload: R=2.72M rows -> P=6.74M candidates ----
R = 2_719_744  # ~ bench row count, 128-aligned
P_CAP = 13 * (1 << 19)
counts = rng.poisson(1.45, R).astype(np.int32) + 1
total_np = counts.sum()
print("expand2 probe: R", R, "total", total_np, "cap", P_CAP)
assert total_np < P_CAP
off = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
rec_f32 = rng.standard_normal((6, R)).astype(np.float32)
rec_f32 = np.concatenate(
    [rec_f32, off[:-1].astype(np.float32)[None, :]], axis=0
)  # 7 rows, off_row=6
rec_b16 = rng.standard_normal((8, R)).astype(np.float32)

offs = jnp.asarray(off)
recs = jnp.asarray(rec_f32)
recsb = jnp.asarray(rec_b16)
total = jnp.int32(total_np)

off_e = np.zeros(R + 1, dtype=np.int32)
off_e[: 513] = np.arange(513)
off_e[513:] = 512
rec_e = rec_f32.copy()
rec_e[6] = off_e[:-1]
for sb in (4096, 8192, 16384, 32768):
    f = jax.jit(
        lambda r, rb, o, t, sb=sb: segment_expand(
            r, o, t, P_CAP, off_row=6, records_b16=rb, interpret=False,
            s_block_max=sb,
        )
    )
    timeit(f"segment_expand 6.8M sb={sb}", f, recs, recsb, offs, total)
    timeit(f"segment_expand EMPTY sb={sb}", f, jnp.asarray(rec_e), recsb,
           jnp.asarray(off_e), jnp.int32(512))

# ---- rasterize_forward pure grid overhead: zero counts ----
from gsplat_tpu.kernels.rasterize import rasterize_forward

NTX, NTY = 81, 53
T = NTX * NTY
stream = jnp.asarray(
    rng.integers(0, 1 << 20, size=(P_CAP // 128, 4, 128)).astype(np.int32)
)
ts = jnp.zeros((T,), jnp.int32)
tc = jnp.zeros((T,), jnp.int32)
fr = jax.jit(
    lambda s, a, c: rasterize_forward(
        s, a, c, jnp.float32(0.2), num_tiles_x=NTX, num_tiles=T, tile=16,
        k=128,
    )
)
timeit("fwd kernel ZERO counts (grid overhead)", fr, stream, ts, tc)

# ---- int64 payload sort probe ----
P = 6815744
key = jnp.asarray(rng.integers(0, 1 << 29, size=P).astype(np.int32))
pay32 = [
    jnp.asarray(
        rng.integers(-(2**31), 2**31 - 1, size=P, dtype=np.int64).astype(
            np.int32
        )
    )
    for _ in range(4)
]
s6 = jax.jit(
    lambda k, p: jax.lax.sort((k,) + tuple(p), dimension=0, is_stable=False,
                              num_keys=1)
)
timeit("sort 1key+4xi32", s6, key, pay32)
timeit("sort 1key+3xi32", s6, key, pay32[:3])
