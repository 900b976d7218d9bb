"""Micro-timing helper for the remote-TPU (axon tunnel) environment.

A host fetch per iteration pays the full tunnel round-trip (~30 ms
measured) and swamps any sub-50ms op. Queue ALL iterations as async
dispatches and fetch ONE scalar at the end; the device executes them
back-to-back on its stream, so (total - overhead)/iters is the true
per-op time. A 1-iter warmup compile precedes the timed region.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, iters=20, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(jnp.ravel(leaf)[0])  # sync

    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = np.asarray(jnp.ravel(leaf)[0])  # one fetch ends the region
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name:48s} {best*1e3:9.3f} ms", flush=True)
    return best
