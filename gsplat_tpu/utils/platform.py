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
