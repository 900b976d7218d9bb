"""Microbenchmark: lax.sort cost vs element count and operand count on TPU.

Measures the exact shapes the binning/regroup pipeline pays for, so the
round-3 sort-wall attack optimizes against real numbers, not folklore.

Axon's block_until_ready can return before execution completes, so each
measurement chains K dependent copies of the op inside ONE jitted fn and
ends with a 4-byte host fetch; reported per-op time = (t_K - t_1) / (K-1),
which also cancels the ~30 ms tunnel overhead. Absolute times printed too.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

K_CHAIN = 16


def _measure(build_fn, args, k_lo=1, k_hi=K_CHAIN, reps=5):
    f_lo, f_hi = build_fn(k_lo), build_fn(k_hi)
    for f in (f_lo, f_hi):
        _ = float(f(*args))
    t = []
    for f in (f_lo, f_hi):
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = float(f(*args))
            best = min(best, time.perf_counter() - t0)
        t.append(best)
    per_op = (t[1] - t[0]) / (k_hi - k_lo) * 1e3
    return per_op, t[0] * 1e3, t[1] * 1e3


def bench_sort(n, n_payload, num_keys=2, key_bits=24):
    rng = np.random.default_rng(0)
    key0 = jnp.asarray(rng.integers(0, 1 << key_bits, size=n).astype(np.int32))
    iota = jnp.arange(n, dtype=jnp.int32)
    payloads = tuple(
        jnp.asarray(rng.standard_normal(n).astype(np.float32))
        for _ in range(n_payload)
    )

    def build(k):
        # Arrays are jit ARGUMENTS (closure constants would let XLA
        # constant-fold the whole chain at compile time).
        @jax.jit
        def f(key0, iota, *payloads):
            key = key0
            acc = jnp.int32(0)
            for i in range(k):
                out = jax.lax.sort((key, iota) + payloads, dimension=0,
                                   is_stable=False, num_keys=num_keys)
                acc = acc + out[1][i]
                # Serialize: next key depends on this sort's full output.
                key = key0 ^ (out[1][i + 1] & 3)
            return acc

        return f

    return _measure(build, (key0, iota) + payloads)


def bench_gather(n, n_src_rows):
    """Row gather of (n_src, rows) at n indices."""
    rng = np.random.default_rng(0)
    idx0 = jnp.asarray(rng.integers(0, n, size=n).astype(np.int32))
    src = jnp.asarray(
        rng.standard_normal((n, n_src_rows)).astype(np.float32))

    def build(k):
        @jax.jit
        def f(idx0, src):
            idx = idx0
            acc = jnp.float32(0)
            for i in range(k):
                out = jnp.take(src, idx, axis=0)
                acc = acc + out[i, 0]
                idx = idx0 ^ (out[i + 1, 0].astype(jnp.int32) & 3)
            return acc

        return f

    return _measure(build, (idx0, src))


def main():
    import os

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    print("== sort: elements x payload operands (key i32 24-bit + iota, "
          "num_keys=2) ==", flush=True)
    configs = [(6815744, 0), (6815744, 5)]
    if len(sys.argv) > 1 and sys.argv[1] == "full":
        configs = [(1 << 20, 5), (6815744, 0), (6815744, 3),
                   (6815744, 5), (6815744, 10), (1 << 23, 5)]
    for n, p in configs:
        ms, lo, hi = bench_sort(n, p)
        print(f"n={n:>9} payload={p:>2}  {ms:7.2f} ms/sort "
              f"[abs {lo:.1f} / {hi:.1f} ms]  "
              f"({ms*1e6/n:6.2f} ns/elem, "
              f"{ms*1e6/n/(p+2):5.2f} ns/elem/op)", flush=True)
    print("== row gather (n,5) f32 at n indices ==", flush=True)
    for n in (6815744,):
        ms, lo, hi = bench_gather(n, 5)
        print(f"n={n:>9}  {ms:7.2f} ms/gather [abs {lo:.1f} / {hi:.1f} ms] "
              f"({ms*1e6/n:6.2f} ns/idx)", flush=True)


if __name__ == "__main__":
    main()
