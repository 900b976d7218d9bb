"""Checkpoint / resume (capability extension — the reference has none,
SURVEY §5): params + Adam moments + accumulators + iteration + SH degree +
pair capacity + config identity in a single .npz, restored into the same
capacity bucket.

Resume is bit-reproducible: the image loader draws camera indices from a
counter-based RNG (io/images.py) whose counter equals the iteration, so a
resumed run samples the same image sequence an uninterrupted run would; the
config hash guards against silently resuming under different settings.
"""

from __future__ import annotations

import dataclasses
import hashlib
from pathlib import Path
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..train.state import TrainState


class Checkpoint(NamedTuple):
    state: TrainState
    iteration: int
    l_max: int
    pair_cap: int  # 0 = unknown (legacy checkpoint)
    config_hash: str  # "" = unknown
    row_cap: int = 0  # 0 = unknown (pre-decoupling checkpoint)


def config_hash(config) -> str:
    """Identity hash over behavior-relevant config fields (paths excluded:
    a dataset legitimately moves between save and resume)."""
    skip = {"dataset_path", "output_dir"}
    items = sorted(
        (k, repr(v))
        for k, v in dataclasses.asdict(config).items()
        if k not in skip
    )
    return hashlib.sha256(repr(items).encode()).hexdigest()[:16]


def save_checkpoint(
    path,
    state: TrainState,
    iteration: int,
    l_max: int,
    pair_cap: int = 0,
    cfg_hash: str = "",
    row_cap: int = 0,
):
    arrays = {
        "_iter": np.int64(iteration),
        "_l_max": np.int64(l_max),
        "_pair_cap": np.int64(pair_cap),
        "_row_cap": np.int64(row_cap),
        "_config_hash": np.bytes_(cfg_hash.encode()),
    }
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


def load_checkpoint(path) -> Checkpoint:
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
    pair_cap = int(data["_pair_cap"]) if "_pair_cap" in data.files else 0
    row_cap = int(data["_row_cap"]) if "_row_cap" in data.files else 0
    cfg = (
        bytes(data["_config_hash"]).decode()
        if "_config_hash" in data.files
        else ""
    )
    return Checkpoint(
        state, int(data["_iter"]), int(data["_l_max"]), pair_cap, cfg,
        row_cap,
    )
