"""Benchmark: fwd+bwd rasterize throughput (Mpixels/s/chip).

North-star metric per BASELINE.md: fwd+bwd rasterize Mpixels/s/chip at 100K
and 1M Gaussians. The reference publishes no numbers (BASELINE.json
"published": {}), so ``vs_baseline`` is reported against REFERENCE_TARGET — a
nominal 100 Mpix/s fwd+bwd at the 1M-Gaussian operating point, the rough
throughput class of the reference CUDA renderer on a mid-range GPU for this
workload.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mpix/s", "vs_baseline": N, ...}
"""

from __future__ import annotations

import dataclasses
import json
import time

import numpy as np

REFERENCE_TARGET_MPIX_S = 100.0  # nominal baseline (no published numbers)

WIDTH, HEIGHT = 1296, 840  # garden @ /4 scale (base.yaml operating point)


def _scene(n, seed=0):
    rng = np.random.default_rng(seed)
    from gsplat_tpu.train.init import GaussianData
    from gsplat_tpu.train.state import init_state, round_capacity

    # Cluster gaussians in front of the camera so most are visible.
    g = GaussianData(
        xyz=(rng.normal(size=(n, 3)) * [2.0, 1.4, 1.2] + [0, 0, 6.0]).astype(
            np.float32
        ),
        rgb=rng.normal(size=(n, 3)).astype(np.float32),
        opacity=rng.uniform(-1.0, 2.0, size=n).astype(np.float32),
        scale=np.log(
            rng.uniform(0.004, 0.04, size=(n, 3)) * (1e6 / n) ** 0.33
        ).astype(np.float32),
        quaternion=np.concatenate(
            [np.ones((n, 1)), 0.2 * rng.normal(size=(n, 3))], axis=1
        ).astype(np.float32),
    )
    return init_state(g, n_cap=round_capacity(n))


def bench_point(
    n_gaussians: int, iters: int = 30, pair_cap: int = 1 << 21,
    row_cap: int = 1 << 20, with_stages: bool = False,
):
    import jax
    import jax.numpy as jnp

    from gsplat_tpu.ops.camera import build_camera_matrices
    from gsplat_tpu.train.state import TrainState
    from gsplat_tpu.train.step import StepStatics, get_train_step

    import os

    state = _scene(n_gaussians)
    cm = build_camera_matrices(
        np.array([1.0, 0, 0, 0]), np.zeros(3), WIDTH, HEIGHT,
        WIDTH * 0.85, WIDTH * 0.85,
    )
    st = StepStatics(
        width=WIDTH, height=HEIGHT, tile=16,
        chunk=int(os.environ.get("BENCH_CHUNK", "128")), pair_cap=pair_cap,
        row_cap=row_cap, l_max=3,
        focal_x=cm.focal_x, focal_y=cm.focal_y,
        tan_fovx=cm.tan_fovx, tan_fovy=cm.tan_fovy,
        near_thresh=0.3, mh_dist=3.0, cull_padding=100, ssim_frac=0.2,
        base_lr=1e-3, xyz_lr_init=0.16, xyz_lr_final=0.0016,
        quat_lr=1.0, scale_lr=5.0, opacity_lr=25.0, rgb_lr=2.5, sh_lr=0.125,
        scene_extent=4.0, num_iters=7000,
    )
    rng = np.random.default_rng(1)
    gt = jnp.asarray(rng.uniform(0, 1, (HEIGHT, WIDTH, 3)).astype(np.float32))
    view = jnp.asarray(cm.view)
    proj = jnp.asarray(cm.proj)
    campos = jnp.asarray(cm.campos)

    # warmup / compile; grow the pair and row capacities until nothing is
    # dropped (mirrors the Trainer's overflow-driven growth). Tight sizing:
    # every pair-wide sort/kernel pays for the cap, so the bench sizes to
    # the 2^19/2^18 bucket just above the true counts (no headroom).
    while True:
        step = get_train_step(st)

        def run(state, it):
            return step(state, view, proj, campos, gt, jnp.float32(0.2),
                        jnp.int32(it))

        state, metrics = run(state, 0)
        jax.block_until_ready(state.params["xyz"])
        overflow = int(metrics.overflow)
        row_overflow = int(metrics.row_overflow)
        num_pairs = int(metrics.num_pairs)
        if overflow <= st.pair_cap and row_overflow <= st.row_cap:
            break
        from gsplat_tpu.train.state import round_pair_cap, round_row_cap

        st = dataclasses.replace(
            st,
            pair_cap=round_pair_cap(max(overflow, st.pair_cap)),
            row_cap=round_row_cap(max(row_overflow, st.row_cap)),
        )
    _ = float(metrics.loss)  # host fetch: forces a true device sync
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = run(state, i + 1)
    # A host fetch (not just block_until_ready) ends the timed region: the
    # remote backend can otherwise report readiness before execution ends.
    loss = float(metrics.loss)
    dt = (time.perf_counter() - t0) / iters
    mpix_s = WIDTH * HEIGHT / dt / 1e6

    # Forward-only render throughput (eval / inference path).
    from gsplat_tpu.train.step import get_render_fn

    render = get_render_fn(st)
    img = render(state.params, state.alive, view, proj, campos,
                 jnp.float32(0.2))
    _ = float(img[0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        img = render(state.params, state.alive, view, proj, campos,
                     jnp.float32(0.2))
    _ = float(img[0, 0, 0])
    fwd_dt = (time.perf_counter() - t0) / iters

    result = {
        "mpix_s": mpix_s,
        "step_ms": dt * 1e3,
        "render_ms": fwd_dt * 1e3,
        "render_mpix_s": WIDTH * HEIGHT / fwd_dt / 1e6,
        "num_pairs": num_pairs,
        "overflow": overflow,
        "pair_cap": st.pair_cap,
        "row_overflow": row_overflow,
        "row_cap": st.row_cap,
        "loss": loss,
    }
    if not with_stages:
        return result

    # Per-stage breakdown by truncated-graph diffs: per-Gaussian+binning
    # (expand kernels + tile sort), forward rasterize (= render - binning -
    # image assembly, approximately), backward+regroup+Adam (= step -
    # render). One extra compile (the binning-only graph).
    from gsplat_tpu.ops.binning import build_tile_tables
    from gsplat_tpu.ops.render import pack_attrs
    from gsplat_tpu.train.step import _per_gaussian

    def binning_only(params, alive):
        uv, conic, rgb, mask, radius, z = _per_gaussian(
            params, alive, view, proj, campos, st
        )
        t = build_tile_tables(
            uv, z, radius, mask,
            attrs=pack_attrs(uv, conic, rgb, params["opacity"]),
            num_tiles_x=st.num_tiles_x, num_tiles_y=st.num_tiles_y,
            tile_size=st.tile, pair_cap=st.pair_cap, chunk_size=st.chunk,
            row_cap=st.row_cap or None,
        )
        return t.num_pairs + t.stream[0, 0, 0].astype(jnp.int32)

    binf = jax.jit(binning_only)
    _ = int(binf(state.params, state.alive))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = binf(state.params, state.alive)
    _ = int(out)
    bin_dt = (time.perf_counter() - t0) / iters

    result["stages_ms"] = {
        "per_gaussian+binning": round(bin_dt * 1e3, 2),
        "fwd_rasterize+assembly": round((fwd_dt - bin_dt) * 1e3, 2),
        "bwd+regroup+loss+adam": round((dt - fwd_dt) * 1e3, 2),
    }
    result["roofline"] = _roofline(
        st, n_gaussians, num_pairs, int(metrics.row_overflow), result
    )
    return result


# v5e public peaks (one chip): bf16 MXU TFLOPS, HBM GB/s, and the VPU's
# f32 elementwise rate (8 sublanes x 128 lanes x 4 ALUs x ~0.94 GHz).
V5E_MXU_TFLOPS = 197.0
V5E_HBM_GBS = 819.0
V5E_VPU_TOPS = 3.85


def _roofline(st, n, num_pairs, num_rows, result):
    """Analytic bytes/flops per stage vs v5e peaks (VERDICT r3 task 2).

    Each stage gets its dominant-resource model:
    - HBM-bound stages: minimal one-pass traffic -> pct_of_hbm_roofline =
      (ideal ms at peak BW) / measured ms.
    - The Pallas rasterize kernels are VPU-bound: per-chunk elementwise op
      counts (the CostEstimates in kernels/rasterize.py model DMA+exp;
      the VPU model here is the measured-binding resource).
    - Sorts: lax.sort is a multi-pass comparator network; the model
      reports how many ideal HBM passes the measured time equals
      (sort_equiv_hbm_passes) — the distance to a single-pass scatter,
      which is the reference's CUB radix bound (culling.cu:455-470).
    """
    cap = st.pair_cap
    rcap = st.row_cap
    pix = st.tile * st.tile
    tiles = st.num_tiles_x * st.num_tiles_y
    k = st.chunk
    s = result["stages_ms"]
    hbms = V5E_HBM_GBS * 1e9

    def pct(ideal_ms, measured_ms):
        return round(100.0 * ideal_ms / max(measured_ms, 1e-9), 1)

    # --- binning bucket: expands (HBM window DMA) + tile sort (passes) ---
    exp1_bytes = (rcap / 8192) * 8320 * 16 * 2 + rcap * 16 * 4
    exp2_bytes = (cap / 8192) * 8320 * 13 * 2 + cap * 13 * 4
    sort_bytes_pass = cap * 6 * 4 * 2  # 6 operands, read+write once
    records_bytes = rcap * 14 * 4 * 2 + cap * 4 * 4
    bin_bytes = exp1_bytes + exp2_bytes + records_bytes + sort_bytes_pass
    bin_ms_ideal = bin_bytes / hbms * 1e3
    # --- fwd kernel: VPU model ---
    chunks = num_pairs / k + tiles  # per-tile ceil slack ~ 1 chunk/tile
    fwd_ops = chunks * pix * k * 30  # alpha+cumprod+accum chain
    fwd_ms_vpu = fwd_ops / (V5E_VPU_TOPS * 1e12) * 1e3
    fwd_bytes = chunks * k * 4 * 4 + tiles * 8 * pix * 4
    # --- bwd kernel: ~1.6x fwd ops (moment extraction + replay) but only
    # tile_maxn-deep chunks; grads out 4 words/pair ---
    bwd_ops = chunks * pix * k * 45
    bwd_ms_vpu = bwd_ops / (V5E_VPU_TOPS * 1e12) * 1e3
    # --- regroup sort + segsum ---
    reg_bytes_pass = cap * 5 * 4 * 2
    seg_bytes = cap * 5 * 4 + n * 9 * 4
    seg_flops = cap * 512 * 10 * 2  # one-hot matmul vs 512-gid blocks
    seg_ms_mxu = seg_flops / (V5E_MXU_TFLOPS * 1e12) * 1e3
    seg_ms_hbm = seg_bytes / hbms * 1e3
    # --- loss: blocked band convs ---
    h, w = st.height, st.width
    loss_flops = 2 * 2 * 15 * h * w * (266 + 266) * 2
    loss_ms_mxu = loss_flops / (V5E_MXU_TFLOPS * 1e12 / 6) * 1e3  # HIGHEST
    # --- adam: pure HBM ---
    adam_bytes = n * 59 * 4 * 6
    adam_ms = adam_bytes / hbms * 1e3

    bwd_bucket = s["bwd+regroup+loss+adam"]
    return {
        "per_gaussian+binning": {
            "measured_ms": s["per_gaussian+binning"],
            "ideal_hbm_ms": round(bin_ms_ideal, 2),
            "pct_of_hbm_roofline": pct(
                bin_ms_ideal, s["per_gaussian+binning"]
            ),
            "note": "tile sort modeled at ONE read+write pass (radix "
                    "bound); lax.sort is a multi-pass network — the gap "
                    "IS the sort cost",
        },
        "fwd_rasterize": {
            "measured_ms": s["fwd_rasterize+assembly"],
            "vpu_model_ms": round(fwd_ms_vpu, 2),
            "hbm_ms": round(fwd_bytes / hbms * 1e3, 2),
            "pct_of_vpu_roofline": pct(
                fwd_ms_vpu, s["fwd_rasterize+assembly"]
            ),
        },
        "bwd_bucket": {
            "measured_ms": bwd_bucket,
            "bwd_kernel_vpu_model_ms": round(bwd_ms_vpu, 2),
            "regroup_sort_1pass_hbm_ms": round(
                reg_bytes_pass / hbms * 1e3, 2
            ),
            "segsum_ms_models": {
                "mxu": round(seg_ms_mxu, 2), "hbm": round(seg_ms_hbm, 2),
            },
            "loss_mxu_model_ms": round(loss_ms_mxu, 2),
            "adam_hbm_ms": round(adam_ms, 2),
        },
        "sort_equiv_hbm_passes": round(
            (s["per_gaussian+binning"] * 1e-3 * hbms) / max(bin_bytes, 1), 1
        ),
        "peaks": {"mxu_tflops_bf16": V5E_MXU_TFLOPS,
                  "hbm_gbs": V5E_HBM_GBS, "vpu_tops_f32": V5E_VPU_TOPS},
    }


def _wait_for_backend(max_wait_s: float = 5400.0):
    """Wait out remote-TPU tunnel outages ("Unable to initialize backend
    'axon': UNAVAILABLE", can last minutes to hours) before touching jax
    in this process: a failed in-process init is cached by jax, so the
    probe runs in a SUBPROCESS until the backend comes up."""
    import subprocess
    import sys

    deadline = time.time() + max_wait_s
    while True:
        try:
            # Require the TPU specifically: during an outage jax can fall
            # back to cpu, and a CPU number published as the Mpix/s metric
            # would be junk. BENCH_ALLOW_CPU=1 overrides (debug only).
            probe = subprocess.run(
                [sys.executable, "-c",
                 "import os, jax; assert (jax.default_backend() == 'tpu'"
                 " or os.environ.get('BENCH_ALLOW_CPU') == '1'),"
                 " jax.default_backend()"],
                capture_output=True, timeout=240,
            )
            ok, err = probe.returncode == 0, probe.stderr.decode()[-2000:]
        except subprocess.TimeoutExpired:
            ok, err = False, "probe timed out"
        if ok:
            return
        if time.time() > deadline:
            sys.stderr.write(err)
            raise RuntimeError("TPU backend never came up within "
                               "max_wait_s; refusing to bench on cpu")
        print("# backend init failed; retrying in 30s...", flush=True)
        time.sleep(30)


def _enable_compile_cache():
    import os

    from gsplat_tpu.utils.platform import enable_compile_cache

    enable_compile_cache(
        os.path.join(os.path.dirname(__file__), ".jax_cache")
    )


def _bench_point_retry(*args, attempts: int = 4, **kwargs):
    """Run bench_point, retrying transient remote-TPU failures.

    Round 3's official artifact was lost to ONE mid-run tunnel hiccup
    (`remote_compile: read body` -> JaxRuntimeError) even though the bench
    re-ran fine minutes later. Each retry waits the backend out again and
    restarts the point from scratch (its compiles are disk-cached, so a
    retry is cheap)."""
    last = None
    for attempt in range(attempts):
        try:
            return bench_point(*args, **kwargs)
        except Exception as e:  # noqa: BLE001 — any transient runtime error
            last = e
            print(f"# bench_point attempt {attempt + 1} failed: "
                  f"{type(e).__name__}: {str(e)[:300]}", flush=True)
            time.sleep(20)
            _wait_for_backend()
    raise last


def main():
    import jax

    _wait_for_backend()
    _enable_compile_cache()
    r100k = _bench_point_retry(100_000)
    r1m = _bench_point_retry(1_000_000, with_stages=True)
    value = r1m["mpix_s"]
    result = {
        "metric": "fwd+bwd rasterize+train-step Mpixels/s/chip @1M gaussians "
                  "(1296x840, SH deg 3, SSIM+L1, fused Adam)",
        "value": round(value, 2),
        "unit": "Mpix/s",
        "vs_baseline": round(value / REFERENCE_TARGET_MPIX_S, 3),
        "detail": {
            "backend": jax.default_backend(),
            "100k": {k: round(v, 3) if isinstance(v, float) else v
                     for k, v in r100k.items()},
            "1m": {k: round(v, 3) if isinstance(v, float) else v
                   for k, v in r1m.items()},
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
