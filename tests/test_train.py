"""Training-step integration tests on synthetic scenes (CPU interpret mode).

Reference strategy analogue: single-image overfit convergence (BASELINE.json
config 2) at miniature scale, plus Adam/density/state unit checks.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gsplat_tpu.ops.adam import B1, B2, EPS, masked_adam_update
from gsplat_tpu.ops.camera import build_camera_matrices
from gsplat_tpu.train.density import (
    DensityStatics, adaptive_density_step, morton_sort, reset_opacity,
)
from gsplat_tpu.train.init import GaussianData
from gsplat_tpu.train.state import init_state, num_active, to_gaussian_data
from gsplat_tpu.train.step import StepStatics, get_render_fn, get_train_step

W, H = 48, 32


def _synthetic_gaussians(rng, n):
    xyz = rng.normal(size=(n, 3)).astype(np.float32) * np.array(
        [1.2, 0.8, 0.3], np.float32
    ) + np.array([0, 0, 4.0], np.float32)
    return GaussianData(
        xyz=xyz,
        rgb=rng.normal(size=(n, 3)).astype(np.float32),
        opacity=rng.uniform(0.5, 2.0, size=n).astype(np.float32),
        scale=np.log(rng.uniform(0.05, 0.25, size=(n, 3))).astype(np.float32),
        quaternion=np.concatenate(
            [np.ones((n, 1)), 0.2 * rng.normal(size=(n, 3))], axis=1
        ).astype(np.float32),
    )


def _statics(l_max=0, pair_cap=2048):
    cm = build_camera_matrices(
        np.array([1.0, 0, 0, 0]), np.zeros(3), W, H, 40.0, 40.0
    )
    st = StepStatics(
        width=W, height=H, tile=16, chunk=128, pair_cap=pair_cap,
        l_max=l_max,
        focal_x=cm.focal_x, focal_y=cm.focal_y,
        tan_fovx=cm.tan_fovx, tan_fovy=cm.tan_fovy,
        near_thresh=0.3, mh_dist=3.0, cull_padding=100, ssim_frac=0.2,
        base_lr=1e-3, xyz_lr_init=0.16, xyz_lr_final=0.0016,
        quat_lr=1.0, scale_lr=5.0, opacity_lr=25.0, rgb_lr=2.5, sh_lr=0.125,
        scene_extent=2.0, num_iters=200,
    )
    return cm, st


def test_masked_adam_semantics(rng):
    n = 64
    p = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    g = g.at[3, 1].set(jnp.nan)  # NaN grads are scrubbed (optimizer.cu:15-16)
    m = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 0.1)
    v = jnp.abs(jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)))
    mask = jnp.asarray(rng.uniform(size=n) < 0.5)
    lr = 0.01
    it = 7
    bias1, bias2 = 1 - B1 ** (it + 1), 1 - B2 ** (it + 1)
    p2, m2, v2 = masked_adam_update(
        p, g, m, v, mask, lr, jnp.float32(bias1), jnp.float32(bias2)
    )
    # CPU reference loop (optimizer_test.cpp:104-138 strategy)
    pn, mn, vn = map(np.array, (p, m, v))
    gn = np.nan_to_num(np.array(g), nan=0.0)
    for i in range(n):
        if not bool(mask[i]):
            continue
        mn[i] = B1 * mn[i] + (1 - B1) * gn[i]
        vn[i] = B2 * vn[i] + (1 - B2) * gn[i] ** 2
        pn[i] += -lr * (mn[i] / bias1) / (np.sqrt(vn[i] / bias2) + EPS)
    np.testing.assert_allclose(np.asarray(p2), pn, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m2), mn, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(v2), vn, rtol=1e-5, atol=1e-7)
    # invisible rows untouched
    inv = ~np.array(mask)
    np.testing.assert_array_equal(np.asarray(p2)[inv], np.array(p)[inv])


def test_single_image_overfit_loss_decreases(rng):
    """Render GT from target params, train perturbed params toward it."""
    n = 24
    target = _synthetic_gaussians(rng, n)
    cm, st = _statics()
    state_t = init_state(target, n_cap=64)
    render = get_render_fn(st)
    gt = render(
        state_t.params, state_t.alive,
        jnp.asarray(cm.view), jnp.asarray(cm.proj), jnp.asarray(cm.campos),
        jnp.float32(0.0),
    )
    assert float(jnp.std(gt)) > 0.01  # scene actually renders something

    # Perturb and train.
    pert = GaussianData(
        xyz=target.xyz + rng.normal(size=(n, 3)).astype(np.float32) * 0.05,
        rgb=target.rgb + rng.normal(size=(n, 3)).astype(np.float32) * 0.3,
        opacity=target.opacity - 0.5,
        scale=target.scale,
        quaternion=target.quaternion,
    )
    state = init_state(pert, n_cap=64)
    step = get_train_step(st)
    losses = []
    for it in range(30):
        state, metrics = step(
            state,
            jnp.asarray(cm.view), jnp.asarray(cm.proj),
            jnp.asarray(cm.campos), gt, jnp.float32(0.0), jnp.int32(it),
        )
        losses.append(float(metrics.loss))
    assert losses[-1] < 0.7 * losses[0], losses[::6]
    assert int(metrics.overflow) <= st.pair_cap
    assert int(metrics.num_visible) > 0


def test_density_clone_split_prune(rng):
    n = 16
    g = _synthetic_gaussians(rng, n)
    state = init_state(g, n_cap=64)
    ds = DensityStatics(
        scene_extent=2.0, uv_grad_threshold=0.1,
        delete_opacity_threshold=0.02, split_scale_factor=1.6,
        max_gaussians=1000,
    )
    # Mark: gaussian 0 prune (low opacity), 1 clone (small scale, high grad),
    # 2 split (big grad, mid scale). Base scales kept below the
    # 0.1*scene_extent prune threshold so only #0 prunes.
    p = dict(state.params)
    op = np.array(p["opacity"])
    op[0] = -6.0  # sigmoid ~ 0.0025 < 0.02
    sc = np.array(p["scale"])
    sc[:] = np.log(0.05)  # well under the 0.2 scale-prune threshold
    sc[1] = np.log(0.005)  # max exp <= 0.01*2.0 -> clone candidate
    # split candidate: > clone threshold 0.02, and 0.3/1.6 <= 0.2 keeps it
    # densify-exempt from the scale prune (trainer.cu:460)
    sc[2] = np.log(0.3)
    p["opacity"] = jnp.asarray(op)
    p["scale"] = jnp.asarray(sc)
    state = state._replace(params=p)
    accum = np.zeros(64, np.float32)
    accum[1] = accum[2] = 5.0  # avg grad 0.5 > thr
    dur = np.zeros(64, np.int32)
    dur[:n] = 10
    state = state._replace(
        uv_grad_accum=jnp.asarray(accum), accum_dur=jnp.asarray(dur)
    )

    new_state, info = adaptive_density_step(state, jax.random.key(0), ds)
    assert bool(info.applied)
    assert int(info.num_pruned) == 1
    assert int(info.num_cloned) == 1
    assert int(info.num_split) == 1
    # new_total = keep(16 - prune1 - split1 = 14) + clone 1 + 2*split
    assert int(info.new_total) == 14 + 1 + 2
    assert num_active(new_state) == 17
    # clone is an exact copy
    new_xyz = np.asarray(new_state.params["xyz"])
    assert any(
        np.allclose(new_xyz[i], g.xyz[1]) for i in range(17)
    ), "clone copy missing"
    # split children have log(exp(s)/1.6) scales
    new_scale = np.asarray(new_state.params["scale"])
    want = np.log(np.exp(sc[2, 0]) / 1.6)
    matches = np.isclose(new_scale[:17], want, atol=1e-5).all(axis=1).sum()
    assert matches == 2
    # pruned gaussian's position no longer present
    assert not any(np.allclose(new_xyz[i], g.xyz[0]) for i in range(17))
    # moments zeroed for new rows, kept rows compacted
    assert float(jnp.sum(jnp.abs(new_state.adam_m["xyz"][14:]))) == 0.0
    # accumulators reset
    assert float(jnp.sum(new_state.uv_grad_accum)) == 0.0


def test_density_capacity_skip(rng):
    g = _synthetic_gaussians(rng, 8)
    state = init_state(g, n_cap=16)
    ds = DensityStatics(
        scene_extent=2.0, uv_grad_threshold=1e-9,
        delete_opacity_threshold=0.02, split_scale_factor=1.6,
        max_gaussians=9,  # any growth exceeds the limit -> skip
    )
    state = state._replace(
        uv_grad_accum=jnp.ones(16) * 10.0,
        accum_dur=jnp.ones(16, jnp.int32),
    )
    new_state, info = adaptive_density_step(state, jax.random.key(1), ds)
    assert not bool(info.applied)
    assert num_active(new_state) == 8
    np.testing.assert_allclose(
        np.asarray(new_state.params["xyz"]), np.asarray(state.params["xyz"])
    )


def test_morton_sort_preserves_set(rng):
    g = _synthetic_gaussians(rng, 20)
    state = init_state(g, n_cap=32)
    sorted_state = morton_sort(state)
    assert num_active(sorted_state) == 20
    # same set of positions, alive rows contiguous at the front
    alive = np.asarray(sorted_state.alive)
    assert alive[:20].all() and not alive[20:].any()
    a = np.sort(np.asarray(state.params["xyz"])[np.asarray(state.alive)], axis=0)
    b = np.sort(np.asarray(sorted_state.params["xyz"])[alive[:32]], axis=0)
    np.testing.assert_allclose(a, b)


def test_reset_opacity(rng):
    g = _synthetic_gaussians(rng, 8)
    state = init_state(g, n_cap=16)
    state = state._replace(
        adam_m={**state.adam_m, "opacity": jnp.ones(16)},
    )
    out = reset_opacity(state, 0.05)
    expect = np.log(0.05) - np.log(0.95)
    np.testing.assert_allclose(
        np.asarray(out.params["opacity"][:8]), expect, rtol=1e-5
    )
    assert float(jnp.sum(out.adam_m["opacity"])) == 0.0


def test_checkpoint_roundtrip(tmp_path, rng):
    from gsplat_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    g = _synthetic_gaussians(rng, 8)
    state = init_state(g, n_cap=16)
    save_checkpoint(tmp_path / "ck.npz", state, 123, 2, pair_cap=4096,
                    cfg_hash="abc")
    ck = load_checkpoint(tmp_path / "ck.npz")
    restored, it, l_max = ck.state, ck.iteration, ck.l_max
    assert it == 123 and l_max == 2
    assert ck.pair_cap == 4096 and ck.config_hash == "abc"
    np.testing.assert_allclose(
        np.asarray(restored.params["xyz"]), np.asarray(state.params["xyz"])
    )
    g2 = to_gaussian_data(restored, l_max=2)
    assert g2.num == 8 and g2.sh.shape == (8, 8, 3)


@pytest.mark.slow  # traces two full geometry families (~3 min on this
#                    1-core host). The growth DETECTION side stays fast
#                    (test_monitor_window_catches_midwindow_events); the
#                    growth loop also runs in every on-chip bench.
def test_trainer_pair_cap_growth(tmp_path, rng):
    """A deliberately tiny initial pair capacity must grow on overflow and
    training must proceed correctly afterwards."""
    import dataclasses

    import yaml

    from gsplat_tpu.config import parse_config
    from gsplat_tpu.tools.synthetic import write_synthetic_dataset
    from gsplat_tpu.train.init import initialize_gaussians
    from gsplat_tpu.train.trainer import Trainer

    scene = write_synthetic_dataset(
        tmp_path, name="scene", n_views=3, width=48, height=32,
        n_gaussians=120, n_points=200,  # camera layout matches test_cli's
        # dataset (extent is camera-only), so post-growth jitted programs
        # are shared within the pytest process
    )
    base = yaml.safe_load(open("configs/base.yaml"))
    cfg_path = tmp_path / "c.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(base, f)
    cfg = dataclasses.replace(
        parse_config(cfg_path),
        dataset_path="scene", downsample_factor=1, num_iters=16,
        print_interval=1,  # boundary (and growth check) every step
        test_eval_interval=10**9, test_split_ratio=0,
        adaptive_control_start=10**9, reset_opacity_start=10**9,
        adaptive_control_end=10**9, reset_opacity_end=10**9,
        max_sh_band=0, use_background=False,
        output_dir=str(tmp_path / "out"), strict_reference=False,
        pair_cap=1 << 20,
        max_gaussians=5000,
    )
    g = initialize_gaussians(scene.points_xyz, scene.points_rgb, cfg)
    tr = Trainer(cfg, g, scene.images, scene.cameras)
    # Force a tiny cap so the first boundary detects overflow and grows it;
    # a small growth floor keeps the regrown graphs toy-sized in interpret
    # mode (production keeps the 1M-pair floor). Inflate the splats ~2.7x
    # so the true PAIR count exceeds the 512 cap (the decoupled overflow
    # reports pairs only; rows have their own cap/monitor lane).
    tr.state = tr.state._replace(
        params={**tr.state.params,
                "scale": tr.state.params["scale"] + 1.0}
    )
    tr.pair_cap = 512
    tr.pair_cap_minimum = 2048
    tr.train(max_iters=4, verbose=False)
    assert tr.iter == 4
    assert tr.pair_cap > 512  # grew via round_pair_cap past the overflow


def test_monitor_window_catches_midwindow_events(rng):
    """The monitored step's on-device accumulators must surface overflow
    and non-finite losses that occur BETWEEN host boundaries (VERDICT r1
    weak #2/#3): a NaN injected at step 2 of 3 is still visible after
    step 3, and the overflow max covers every step in the window."""
    from gsplat_tpu.train.step import fresh_monitor, monitored_train_step

    g = _synthetic_gaussians(rng, 400)
    state = init_state(g, n_cap=512)
    cm, st = _statics(pair_cap=512)  # deliberately tiny: overflow certain
    gt_ok = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
    gt_nan = gt_ok.at[0, 0, 0].set(jnp.nan)
    args = (
        jnp.asarray(cm.view), jnp.asarray(cm.proj), jnp.asarray(cm.campos),
    )

    mon = fresh_monitor()
    overflow_seen = 0
    for i, gt in enumerate([gt_ok, gt_nan, gt_ok]):
        state, metrics, mon = monitored_train_step(
            state, *args, gt, jnp.float32(0.0), jnp.int32(i), mon, st
        )
        if i == 1:
            overflow_seen = int(metrics.overflow)
    # Step 3's own loss is finite again — only the window accumulator
    # still knows about step 2's NaN.
    assert np.isfinite(float(metrics.loss))
    mon_np = np.asarray(mon)
    assert mon_np[2] == 0.0, "NaN at step 2 must survive to the boundary"
    assert mon_np[0] >= overflow_seen > st.pair_cap, (
        "window overflow max must cover mid-window steps"
    )


@pytest.mark.slow  # ~70 s: pays the render-fn compile alone (the CLI
#                    tests never render). evaluate() runs on hardware in
#                    every scripts/train_real_plane run (RESULT_SCALE
#                    artifacts) and here under --runslow.
def test_evaluate_pipelined_and_skip_warning(tmp_path, rng):
    """evaluate() renders held-out views through the decode-prefetch
    pipeline (one stacked device fetch) and warns LOUDLY about unreadable
    test images instead of silently shrinking the eval set."""
    import dataclasses
    import warnings

    from gsplat_tpu.config import parse_config
    from gsplat_tpu.tools.synthetic import write_synthetic_dataset
    from gsplat_tpu.train.init import initialize_gaussians
    from gsplat_tpu.train.trainer import Trainer

    # Reuse test_cli's dataset + config construction VERBATIM: identical
    # geometry/caps means the jitted render program is already compiled
    # by the CLI tests within one pytest process.
    from test_cli import DATASET, _write_config

    scene = write_synthetic_dataset(tmp_path, **DATASET)
    cfg_path = tmp_path / "c.yaml"
    _write_config(cfg_path, "scene", tmp_path / "out", num_iters=4)
    cfg = dataclasses.replace(
        parse_config(cfg_path), test_split_ratio=2,
    )
    g = initialize_gaussians(scene.points_xyz, scene.points_rgb, cfg)
    tr = Trainer(cfg, g, scene.images, scene.cameras)
    assert tr.test_images, "split_ratio=2 must yield test views"
    psnr = tr.evaluate(verbose=False)
    assert psnr is not None and np.isfinite(psnr) and psnr > 0

    # Break one test image on disk: evaluate must warn, not hide it.
    import os

    victim = tr.test_images[0].name
    os.rename(victim, victim + ".gone")
    try:
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            tr.evaluate(verbose=False)
        assert any("skipped" in str(x.message) for x in w), [
            str(x.message) for x in w
        ]
    finally:
        os.rename(victim + ".gone", victim)
