"""Checkpoint / resume (capability extension — the reference has none,
SURVEY §5): params + Adam moments + accumulators + iteration + SH degree in a
single .npz, restored into the same capacity bucket."""

from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..train.state import TrainState


def save_checkpoint(path, state: TrainState, iteration: int, l_max: int):
    arrays = {"_iter": np.int64(iteration), "_l_max": np.int64(l_max)}
    for group, tree in (
        ("params", state.params),
        ("adam_m", state.adam_m),
        ("adam_v", state.adam_v),
    ):
        for k, v in tree.items():
            arrays[f"{group}.{k}"] = np.asarray(v)
    arrays["alive"] = np.asarray(state.alive)
    arrays["uv_grad_accum"] = np.asarray(state.uv_grad_accum)
    arrays["accum_dur"] = np.asarray(state.accum_dur)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **arrays)


def load_checkpoint(path) -> tuple[TrainState, int, int]:
    data = np.load(path)
    groups: dict[str, dict] = {"params": {}, "adam_m": {}, "adam_v": {}}
    for name in data.files:
        if "." in name:
            group, key = name.split(".", 1)
            groups[group][key] = jnp.asarray(data[name])
    state = TrainState(
        params=groups["params"],
        adam_m=groups["adam_m"],
        adam_v=groups["adam_v"],
        alive=jnp.asarray(data["alive"]),
        uv_grad_accum=jnp.asarray(data["uv_grad_accum"]),
        accum_dur=jnp.asarray(data["accum_dur"]),
    )
    return state, int(data["_iter"]), int(data["_l_max"])
