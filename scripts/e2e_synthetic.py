"""End-to-end convergence drive on the REAL TPU with a synthetic scene.

Builds a ground-truth Gaussian scene, renders K camera views with the
framework's own renderer, writes them to PNG, then trains a fresh model from
a noisy point cloud through the full Trainer (densify, SH schedule, opacity
resets) and reports eval PSNR over iterations. This is the no-dataset proxy
for the garden benchmark (zero-egress environment: Mip-NeRF 360 data cannot
be downloaded).

Usage: python scripts/e2e_synthetic.py [iters] [n_init]
"""

import sys

sys.path.insert(0, "/root/repo")

import tempfile
import time
from pathlib import Path

import numpy as np

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 600
N_INIT = int(sys.argv[2]) if len(sys.argv) > 2 else 4000
W, H = 384, 256
N_TRUE = 1200
N_VIEWS = 16


def rotmat_to_qvec(R):
    """Robust rotation-matrix -> (w,x,y,z) quaternion (Shepperd's method)."""
    tr = np.trace(R)
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        w, x = 0.25 * s, (R[2, 1] - R[1, 2]) / s
        y, z = (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s
    elif R[0, 0] > R[1, 1] and R[0, 0] > R[2, 2]:
        s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2
        w, x = (R[2, 1] - R[1, 2]) / s, 0.25 * s
        y, z = (R[0, 1] + R[1, 0]) / s, (R[0, 2] + R[2, 0]) / s
    elif R[1, 1] > R[2, 2]:
        s = np.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2
        w, x = (R[0, 2] - R[2, 0]) / s, (R[0, 1] + R[1, 0]) / s
        y, z = 0.25 * s, (R[1, 2] + R[2, 1]) / s
    else:
        s = np.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2
        w, x = (R[1, 0] - R[0, 1]) / s, (R[0, 2] + R[2, 0]) / s
        y, z = (R[1, 2] + R[2, 1]) / s, 0.25 * s
    return np.array([w, x, y, z], np.float64)


def make_cameras():
    """Cameras on a ring looking at the origin."""
    from gsplat_tpu.io.colmap import Camera, Image

    cams, imgs = {}, {}
    f = W * 0.9
    cams[1] = Camera(id=1, model="PINHOLE", width=W, height=H,
                     params=np.array([f, f, W / 2, H / 2], np.float64))
    for i in range(N_VIEWS):
        ang = 2 * np.pi * i / N_VIEWS
        # camera at radius 6 looking at origin
        cpos = np.array([6 * np.sin(ang), 0.8 * np.sin(2 * ang), -6 * np.cos(ang)])
        fwd = -cpos / np.linalg.norm(cpos)  # toward origin
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd); right /= np.linalg.norm(right)
        upv = np.cross(fwd, right)
        R = np.stack([right, upv, fwd], axis=0)  # world->cam rows
        t = -R @ cpos
        imgs[i + 1] = Image(id=i + 1, qvec=rotmat_to_qvec(R),
                            tvec=t, camera_id=1, name=f"view_{i:03d}.png",
                            xys=np.zeros((0, 2)), point3d_ids=np.zeros(0, np.int64))
    return cams, imgs


def main():
    from gsplat_tpu.train.init import GaussianData
    from gsplat_tpu.train.trainer import Trainer

    rng = np.random.default_rng(7)
    cams, imgs = make_cameras()

    # Ground-truth scene: colorful blob cluster
    true_xyz = rng.normal(size=(N_TRUE, 3)).astype(np.float32) * [1.6, 1.0, 1.6]
    true_rgb = ((rng.uniform(0.1, 0.9, (N_TRUE, 3)) - 0.5) / 0.28209479).astype(np.float32)
    true = GaussianData(
        xyz=true_xyz,
        rgb=true_rgb,
        opacity=rng.uniform(1.0, 3.0, N_TRUE).astype(np.float32),
        scale=np.log(rng.uniform(0.05, 0.2, (N_TRUE, 3))).astype(np.float32),
        quaternion=np.concatenate(
            [np.ones((N_TRUE, 1)), 0.3 * rng.normal(size=(N_TRUE, 3))], 1
        ).astype(np.float32),
    )

    tmp = Path(tempfile.mkdtemp(prefix="gsplat_e2e_"))
    for im in imgs.values():
        im.name = str(tmp / im.name)

    import dataclasses

    from gsplat_tpu.config import parse_config

    cfg = dataclasses.replace(
        parse_config("/root/repo/configs/base.yaml"),
        num_iters=ITERS, max_gaussians=200_000,
        print_interval=10 ** 9, test_eval_interval=10 ** 9,
        adaptive_control_start=150, adaptive_control_interval=100,
        adaptive_control_end=max(ITERS - 100, 151),
        reset_opacity_start=10 ** 9, reset_opacity_interval=10 ** 9,
        reset_opacity_end=10 ** 9,
        add_sh_band_interval=200, max_sh_band=2,
        use_background=False, output_dir=str(tmp / "out"),
        test_split_ratio=8, seed=3, strict_reference=False,
    )

    # Render GT views with a GT trainer (same renderer)
    gt_trainer = Trainer(cfg, true, imgs, cams)
    from PIL import Image as PILImage

    for im in imgs.values():
        cm = gt_trainer._matrices(im)
        img = np.asarray(gt_trainer.render(cm, bg=0.0))
        PILImage.fromarray(
            np.clip(img * 255, 0, 255).astype(np.uint8)
        ).save(im.name)
    print(f"GT views rendered: {N_VIEWS} x {W}x{H}")

    # Fresh model from noisy init: subsample + jitter GT points
    sel = rng.choice(N_TRUE, size=N_INIT, replace=True)
    init_xyz = true_xyz[sel] + rng.normal(size=(len(sel), 3)).astype(np.float32) * 0.15
    from gsplat_tpu.train.init import initialize_gaussians

    init = initialize_gaussians(
        init_xyz.astype(np.float64),
        np.clip((true_rgb[sel] * 0.28209479 + 0.5) * 255, 0, 255).astype(np.uint8),
    )
    trainer = Trainer(cfg, init, imgs, cams)
    p0 = trainer.evaluate(verbose=False)
    print(f"init: {init.num} gaussians, eval PSNR {p0:.2f} dB")
    t0 = time.time()
    trainer.train(verbose=False)
    dt = time.time() - t0
    p1 = trainer.evaluate(verbose=False)
    alive = int(np.asarray(trainer.state.alive).sum())
    print(f"after {ITERS} iters ({dt:.1f}s, {ITERS/dt:.1f} it/s): "
          f"eval PSNR {p1:.2f} dB, {alive} gaussians, l_max={trainer.l_max}")
    trainer.save_to_ply(tmp / "final.ply")
    print("PLY saved:", (tmp / "final.ply").stat().st_size, "bytes")
    assert p1 > p0 + 6.0, f"insufficient convergence: {p0:.2f} -> {p1:.2f}"
    print("E2E CONVERGENCE OK")


if __name__ == "__main__":
    main()
