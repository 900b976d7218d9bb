"""EXTENDED-schedule end-to-end run: configs/extended.yaml verbatim.

The one reference schedule shape never exercised end-to-end before round 5
(VERDICT r4 item 5): 30000 iterations with SH grown to band 3
(add_sh_band_interval 1000 / max_sh_band 3), opacity resets every 3000 to
iteration 15000, and densification windows 500..15000 every 100 —
extended.yaml's spans, NOT the base.yaml 7K spans (config/extended.yaml:12,37
in the reference). Dataset: the real-texture layers scene (the zero-egress
garden stand-in), TRUE holdout eval.

Usage: python scripts/extended_run.py [WxH] [views] [thresh_mul]
Writes RESULT_EXTENDED.json.
"""

import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import yaml

REPO = Path(__file__).resolve().parents[1]


def main() -> int:
    size = sys.argv[1] if len(sys.argv) > 1 else "648x420"
    views = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    thresh_mul = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0
    w, h = (int(x) for x in size.split("x"))

    from gsplat_tpu.config import parse_config
    from gsplat_tpu.tools.real_plane import write_real_layers_dataset
    from gsplat_tpu.train.init import initialize_gaussians
    from gsplat_tpu.train.trainer import Trainer

    root = Path("/tmp/extended_run")
    t0 = time.time()
    scene = write_real_layers_dataset(root, n_views=views, width=w, height=h)
    print(f"dataset: layers {views} views {w}x{h} in {time.time()-t0:.1f}s",
          flush=True)

    # extended.yaml VERBATIM schedule; only dataset/output/eval plumbing
    # and the densify threshold multiplier are overridden.
    ext = yaml.safe_load(open(REPO / "configs" / "extended.yaml"))
    cfg_path = root / "config.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(ext, f)
    cfg = parse_config(cfg_path)
    cfg = dataclasses.replace(
        cfg,
        dataset_path=scene.name, downsample_factor=1,
        print_interval=500, test_eval_interval=3000, test_split_ratio=8,
        output_dir=str(root / "out"), strict_reference=False, seed=0,
        uv_grad_threshold=cfg.uv_grad_threshold * thresh_mul,
    )
    assert cfg.num_iters == 30000 and cfg.max_sh_band == 3
    assert cfg.adaptive_control_end == 15000
    assert cfg.reset_opacity_end == 15000
    g = initialize_gaussians(scene.points_xyz, scene.points_rgb, cfg)
    print(f"init: {g.num} gaussians", flush=True)
    tr = Trainer(cfg, g, scene.images, scene.cameras)
    test_names = {im.name for im in tr.test_images}
    tr.train_images = [
        im for im in tr.train_images if im.name not in test_names
    ]
    print(f"split: {len(tr.train_images)} train / "
          f"{len(tr.test_images)} held-out", flush=True)
    t0 = time.time()
    tr.train()
    wall_s = time.time() - t0
    psnr = float(tr.evaluate())
    n_alive = int(tr.state.alive.sum())

    import jax

    out = {
        "schedule": "configs/extended.yaml (verbatim spans)",
        "dataset": {"layout": "layers", "views": views,
                    "width": w, "height": h},
        "num_iters": cfg.num_iters,
        "max_sh_band_reached": tr.l_max,
        "uv_grad_threshold": cfg.uv_grad_threshold,
        "backend": jax.default_backend(),
        "wall_s": round(wall_s, 1),
        "iters_per_second": round(cfg.num_iters / wall_s, 3),
        "initial_gaussians": int(g.num),
        "final_gaussians": n_alive,
        "eval_psnr_db_heldout": round(psnr, 3),
    }
    path = REPO / "RESULT_EXTENDED.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)
    print(f"wrote {path}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
