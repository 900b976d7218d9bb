"""On-TPU numeric-parity gate: packed pipeline vs exact-f32 pipeline.

Runs ONLY on the real chip (jax.default_backend() == 'tpu'); this is the
regression net for XLA:TPU-specific rewrites (precision folding, denormal
flush, DMA alignment) that interpret-mode CPU tests can never see — the
class of bug that silently zeroed the expand kernel's Dekker splits in
round 3 (commit 275672d) while every CPU test stayed green.

Checks, at a mid-size synthetic scene (50K Gaussians, 320x240):
  1. pair-set equality: the packed binning must produce the SAME
     (tile, gaussian) pair set as the exact-f32 binning.
  2. forward image PSNR(packed vs exact) > 45 dB, both chunk k=128 and 256.
  3. gradient agreement: per-parameter-group cosine similarity > 0.999 and
     norm ratio within 2% between packed-grad and exact-f32-grad paths.

Writes PARITY_TPU.json and exits nonzero on failure, so drivers/CI can
record the artifact. Semantics spec: /root/reference/cuda/render.cu:49-107.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_scene(n=50_000, seed=3):
    from gsplat_tpu.train.init import GaussianData
    from gsplat_tpu.train.state import init_state, round_capacity

    rng = np.random.default_rng(seed)
    g = GaussianData(
        xyz=(rng.normal(size=(n, 3)) * [1.5, 1.0, 0.9] + [0, 0, 5.0]).astype(
            np.float32
        ),
        rgb=rng.normal(size=(n, 3)).astype(np.float32),
        opacity=rng.uniform(-1, 2, size=n).astype(np.float32),
        scale=np.log(rng.uniform(0.004, 0.04, size=(n, 3)) * 2.7).astype(
            np.float32
        ),
        quaternion=np.concatenate(
            [np.ones((n, 1)), 0.2 * rng.normal(size=(n, 3))], axis=1
        ).astype(np.float32),
    )
    return init_state(g, n_cap=round_capacity(n))


def main():
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        print("parity_tpu: requires the real TPU backend; got",
              jax.default_backend())
        return 2

    from gsplat_tpu.utils.platform import enable_compile_cache

    enable_compile_cache(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache")
    )

    from gsplat_tpu.ops.binning import build_tile_tables
    from gsplat_tpu.ops.camera import build_camera_matrices
    from gsplat_tpu.ops.loss import fused_loss
    from gsplat_tpu.ops.render import pack_attrs, rasterize
    from gsplat_tpu.train.step import StepStatics, _per_gaussian

    W, H = 320, 240
    state = build_scene()
    cm = build_camera_matrices(
        np.array([1.0, 0, 0, 0]), np.zeros(3), W, H, W * 0.9, W * 0.9
    )
    st = StepStatics(
        width=W, height=H, tile=16, chunk=128, pair_cap=1 << 19,
        row_cap=1 << 18, l_max=3,
        focal_x=cm.focal_x, focal_y=cm.focal_y,
        tan_fovx=cm.tan_fovx, tan_fovy=cm.tan_fovy,
        near_thresh=0.3, mh_dist=3.0, cull_padding=100, ssim_frac=0.2,
        base_lr=1e-3, xyz_lr_init=0.16, xyz_lr_final=0.0016, quat_lr=1.0,
        scale_lr=5.0, opacity_lr=25.0, rgb_lr=2.5, sh_lr=0.125,
        scene_extent=4.0, num_iters=7000,
    )
    view = jnp.asarray(cm.view)
    proj = jnp.asarray(cm.proj)
    campos = jnp.asarray(cm.campos)
    rng = np.random.default_rng(7)
    gt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))

    result = {"scene": {"n": 50_000, "w": W, "h": H}, "checks": {}}
    ok = True

    def run_variant(packed: bool, k: int):
        """loss + image + grads + pair set for one pipeline variant."""

        def loss_fn(params):
            uv, conic, rgb, mask, radius, z = _per_gaussian(
                params, state.alive, view, proj, campos, st
            )
            sg = jax.lax.stop_gradient
            attrs = pack_attrs(uv, conic, rgb, params["opacity"])
            tables = build_tile_tables(
                sg(uv), sg(z), radius, mask, attrs=sg(attrs),
                num_tiles_x=st.num_tiles_x, num_tiles_y=st.num_tiles_y,
                tile_size=st.tile, pair_cap=st.pair_cap,
                chunk_size=k, row_cap=st.row_cap,
                interpret=False, bf16_colors=packed,
            )
            out = rasterize(
                uv, conic, rgb, params["opacity"], tables, jnp.float32(0.2),
                width=W, height=H, tile=st.tile, chunk=k, interpret=False,
                bf16_grads=packed,
            )
            loss = fused_loss(out.image, gt, st.ssim_frac)
            return loss, (out.image, tables.splat_gid, tables.tile_start,
                          tables.num_pairs)

        (loss, (img, gid, tstart, npairs)), grads = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True)
        )(state.params)
        return (float(loss), np.asarray(img), np.asarray(gid),
                np.asarray(tstart), int(npairs),
                {kk: np.asarray(v) for kk, v in grads.items()})

    loss_e, img_e, gid_e, ts_e, np_e, g_e = run_variant(False, 128)

    for k in (128, 256):
        loss_p, img_p, gid_p, ts_p, np_p, g_p = run_variant(True, k)

        # 1. pair-set equality: same count, same tile boundaries, same
        # multiset of gids within each tile (order may differ inside equal
        # quantized-depth ties — compare sorted within tile ranges).
        pair_ok = (np_p == np_e) and bool((ts_p == ts_e).all())
        if pair_ok:
            # segment-sorted comparison over valid region
            def tile_sorted(gid, tstart, n):
                out = gid[:n].copy()
                bounds = list(tstart) + [n]
                for i in range(len(tstart)):
                    lo, hi = bounds[i], bounds[i + 1]
                    out[lo:hi] = np.sort(out[lo:hi])
                return out

            pair_ok = bool(
                (tile_sorted(gid_p, ts_p, np_p)
                 == tile_sorted(gid_e, ts_e, np_e)).all()
            )
        mse = float(np.mean((img_p - img_e) ** 2))
        psnr = float(-10 * np.log10(max(mse, 1e-12)))
        gstats = {}
        grads_ok = True
        for name in g_e:
            a, b = g_e[name].ravel(), g_p[name].ravel()
            # Culled/masked Gaussians carry NaN grads by design in the dense
            # pipeline (scrubbed by Adam, reference optimizer.cu:15-16); the
            # packed and exact paths must agree on WHICH entries those are,
            # and on the values of all finite entries.
            fin_a, fin_b = np.isfinite(a), np.isfinite(b)
            same_nan_set = bool((fin_a == fin_b).all())
            both = fin_a & fin_b
            a, b = a[both], b[both]
            na, nb = float(np.linalg.norm(a)), float(np.linalg.norm(b))
            cos = float(a @ b / max(na * nb, 1e-30))
            ratio = nb / max(na, 1e-30)
            gstats[name] = {"cos": round(cos, 6), "norm_ratio": round(ratio, 4),
                            "same_nan_set": same_nan_set,
                            "n_masked": int((~fin_a).sum())}
            # Geometry groups ride bf16-pair words (cos ~0.9998 measured);
            # rgb/sh ride the e5s9 shared-exponent triple whose designed
            # error is <= amax/256 of the LARGEST channel (cos ~0.9983
            # measured) — the looser gate still catches Dekker-class
            # collapse (cos ~0) while tolerating the designed rounding.
            cos_gate = 0.995 if name in ("rgb", "sh") else 0.999
            if cos < cos_gate or not (0.98 < ratio < 1.02) or not same_nan_set:
                grads_ok = False
        check = {
            "pair_set_equal": pair_ok,
            "num_pairs": np_p,
            "psnr_db": round(psnr, 2),
            "loss_packed": loss_p,
            "loss_exact": loss_e,
            "grads": gstats,
            "grads_ok": grads_ok,
        }
        this_ok = pair_ok and psnr > 45.0 and grads_ok
        check["ok"] = this_ok
        ok = ok and this_ok
        result["checks"][f"k{k}"] = check
        print(f"k={k}: pair_set_equal={pair_ok} psnr={psnr:.1f}dB "
              f"grads_ok={grads_ok}", flush=True)

    result["ok"] = ok
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PARITY_TPU.json",
    )
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({"parity_tpu_ok": ok}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
