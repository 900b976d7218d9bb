"""Training configuration.

Mirrors the reference YAML schema exactly (all 40 keys of
/root/reference/include/gsplat/utils.hpp:10-70, parsed by
/root/reference/src/utils.cpp:16-86): every key is required and a missing key
raises, matching ``parseConfig``'s throw-on-missing behavior.

Fields that the reference parses but never reads (see SURVEY.md §5 "dead
config fields") are kept for schema parity and documented below; a few have
optional live extensions gated by ``strict_reference`` so default behavior is
bit-identical to the reference trainer:

- ``initial_opacity`` / ``initial_scale_num_neighbors`` /
  ``initial_scale_factor`` / ``max_initial_scale``: the reference hardcodes
  opacity=0.2, 3 neighbors, no factor/clamp (gaussian.cpp:71,95).  We honor
  them in :mod:`gsplat_tpu.train.init` only when ``strict_reference=False``.
- ``use_sh_precompute``: reference always precomputes per-Gaussian SH color
  (raster.cu:78); same here.
- ``use_split`` / ``use_clone`` / ``use_delete``: dead in the reference;
  honored when ``strict_reference=False``.
- ``test_eval_interval``: reference hardcodes eval every 3000 iters
  (trainer.cu:1388); honored when ``strict_reference=False``.
- ``use_background_end``: reference cycles the background forever
  (trainer.cu:1342-1343); honored when ``strict_reference=False``.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any

import yaml


@dataclasses.dataclass
class ConfigParameters:
    # File paths and directories
    dataset_path: str
    output_dir: str

    # General settings
    downsample_factor: int
    print_interval: int
    num_iters: int
    ssim_frac: float
    test_eval_interval: int
    test_split_ratio: int

    # Initial Gaussian properties
    initial_opacity: float
    initial_scale_num_neighbors: int
    initial_scale_factor: float
    max_initial_scale: float

    # Rendering thresholds
    near_thresh: float
    mh_dist: float
    cull_mask_padding: int

    # Learning rates
    base_lr: float
    xyz_lr_multiplier_init: float
    xyz_lr_multiplier_final: float
    quat_lr_multiplier: float
    scale_lr_multiplier: float
    opacity_lr_multiplier: float
    rgb_lr_multiplier: float
    sh_lr_multiplier: float

    # Background settings
    use_background: bool
    use_background_end: int

    # Opacity reset settings
    reset_opacity_interval: int
    reset_opacity_value: float
    reset_opacity_start: int
    reset_opacity_end: int

    # Spherical Harmonics settings
    use_sh_precompute: bool
    max_sh_band: int
    add_sh_band_interval: int

    # Densification control
    use_split: bool
    use_clone: bool
    use_delete: bool
    adaptive_control_start: int
    adaptive_control_end: int
    adaptive_control_interval: int
    max_gaussians: int
    delete_opacity_threshold: float
    uv_grad_threshold: float
    split_scale_factor: float

    # --- TPU-build extensions (not in the reference schema; all optional) ---
    # When True (default), scheduling matches the reference binary exactly,
    # including its dead config fields. When False, the dead fields above
    # become live.
    strict_reference: bool = True
    # Rasterizer tile size in pixels (reference: 16, render.cu:8).
    tile_size: int = 16
    # Pallas splat-chunk size (splats composited per VMEM block).
    chunk_size: int = 128
    # Initial capacity of the (gaussian, tile) pair stream; grows on overflow.
    pair_cap: int = 0  # 0 = auto
    # Data-parallel batch: cameras per optimizer step (reference: 1).
    cameras_per_step: int = 1
    # RNG seed for image sampling + split sampling.
    seed: int = 0

    def __post_init__(self) -> None:
        if self.tile_size % 4 != 0:
            raise ValueError("tile_size must be a multiple of 4")


_REQUIRED_KEYS = [
    f.name
    for f in dataclasses.fields(ConfigParameters)
    if f.default is dataclasses.MISSING
]

_TYPES = {f.name: f.type for f in dataclasses.fields(ConfigParameters)}


def parse_config(filename: str | Path) -> ConfigParameters:
    """Parse a YAML config; every reference key is required.

    Raises ``FileNotFoundError`` on a missing file and ``KeyError`` naming the
    first missing required key (utils.cpp:9-14 semantics).
    """
    path = Path(filename)
    if not path.is_file():
        raise FileNotFoundError(f"Config file not found: {path}")
    with open(path) as f:
        raw: dict[str, Any] = yaml.safe_load(f)
    if raw is None:
        raw = {}
    kwargs: dict[str, Any] = {}
    for key in _REQUIRED_KEYS:
        if key not in raw:
            raise KeyError(f"Missing required parameter in YAML file: {key}")
    for key, value in raw.items():
        if key in _TYPES:
            kwargs[key] = _coerce(key, value)
    return ConfigParameters(**kwargs)


def _coerce(key: str, value: Any) -> Any:
    """Coerce YAML scalars to the annotated field type.

    PyYAML implements YAML 1.1, where ``1e-3`` (no dot) parses as a string;
    the reference's yaml-cpp ``as<float>()`` accepts it, so we coerce here.
    """
    t = str(_TYPES[key])
    if t == "float" and not isinstance(value, float):
        return float(value)
    if t == "int" and not isinstance(value, int):
        return int(value)
    if t == "bool" and isinstance(value, str):
        return value.strip().lower() in ("true", "1", "yes", "on")
    return value
