"""Backend selection helper shared by every entry point.

The remote-TPU plugin's site hook calls
``jax.config.update("jax_platforms", "<tpu>,cpu")`` at register time,
which OVERRIDES an explicit ``JAX_PLATFORMS=cpu`` environment request.
Entry points that must honor a cpu request (virtual-device DP/TP runs,
tests, smoke runs while the TPU tunnel is down) call this once before
using jax.
"""

from __future__ import annotations

import os


def enable_compile_cache(cache_dir: str | None = None) -> None:
    """Persistent compile cache shared by every entry point.

    Remote-TPU compiles run ~100 s each through the tunnel helper and the
    bench/driver entry points compile several graphs (growth re-jits,
    render, stage probes); cache hits across runs cut wall-clock from
    ~15 min to ~2 min. Default cache dir: <repo root>/.jax_cache.
    """
    import jax

    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
            ".jax_cache",
        )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def honor_cpu_platform_request() -> bool:
    """If the environment explicitly asks for cpu, pin jax to cpu.

    Returns True when the override was applied. Must be called before
    the first backend initialization (device queries, array creation).
    """
    if os.environ.get("JAX_PLATFORMS", "").strip().startswith("cpu"):
        import jax

        jax.config.update("jax_platforms", "cpu")
        return True
    return False
