"""Fine-grained stage attribution at the bench operating point (1M, 1296x840).

Times successive truncations of build_tile_tables (_stop_after probes) and
standalone backward components; successive DIFFS cancel the ~30 ms tunnel
fetch overhead. Run on the real TPU.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu.utils.platform import enable_compile_cache

enable_compile_cache()

from gsplat_tpu.ops.binning import build_tile_tables
from gsplat_tpu.ops.render import pack_attrs
from gsplat_tpu.train.step import StepStatics, _per_gaussian
from gsplat_tpu.train.init import GaussianData
from gsplat_tpu.train.state import init_state, round_capacity
from gsplat_tpu.ops.camera import build_camera_matrices

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
PAIR_CAP = int(sys.argv[2]) if len(sys.argv) > 2 else 13 * (1 << 19)
ROW_CAP = int(sys.argv[3]) if len(sys.argv) > 3 else 17 * (1 << 18)
W, H = 1296, 840

rng = np.random.default_rng(0)
g = GaussianData(
    xyz=(rng.normal(size=(N, 3)) * [2.0, 1.4, 1.2] + [0, 0, 6.0]).astype(np.float32),
    rgb=rng.normal(size=(N, 3)).astype(np.float32),
    opacity=rng.uniform(-1.0, 2.0, size=N).astype(np.float32),
    scale=np.log(rng.uniform(0.004, 0.04, size=(N, 3)) * (1e6 / N) ** 0.33).astype(np.float32),
    quaternion=np.concatenate([np.ones((N, 1)), 0.2 * rng.normal(size=(N, 3))], axis=1).astype(np.float32),
)
state = init_state(g, n_cap=round_capacity(N))
cm = build_camera_matrices(np.array([1.0, 0, 0, 0]), np.zeros(3), W, H,
                           W * 0.85, W * 0.85)
st = StepStatics(
    width=W, height=H, tile=16, chunk=128, pair_cap=PAIR_CAP,
    row_cap=ROW_CAP, l_max=3,
    focal_x=cm.focal_x, focal_y=cm.focal_y, tan_fovx=cm.tan_fovx,
    tan_fovy=cm.tan_fovy,
    near_thresh=0.3, mh_dist=3.0, cull_padding=100, ssim_frac=0.2,
    base_lr=1e-3, xyz_lr_init=0.16, xyz_lr_final=0.0016,
    quat_lr=1.0, scale_lr=5.0, opacity_lr=25.0, rgb_lr=2.5, sh_lr=0.125,
    scene_extent=4.0, num_iters=7000, interpret=False,
)
view = jnp.asarray(cm.view)
proj = jnp.asarray(cm.proj)
campos = jnp.asarray(cm.campos)


def timeit(name, fn, *args, iters=12, reps=3):
    """Queued-dispatch timing: one host fetch per rep (the per-fetch tunnel
    round-trip measured ~30 ms and would swamp every sub-50ms op)."""
    out = fn(*args)
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(jnp.ravel(leaf)[0])
    best = 1e9
    for _i in range(reps):
        t0 = time.perf_counter()
        for _j in range(iters):
            out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = np.asarray(jnp.ravel(leaf)[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name:32s} {best*1e3:9.2f} ms", flush=True)
    return out, best


pg = jax.jit(lambda p, a: _per_gaussian(p, a, view, proj, campos, st))
(uv, conic, rgb, mask, radius, z), t_pg = timeit(
    "per_gaussian", pg, state.params, state.alive)
attrs = jax.jit(pack_attrs)(uv, conic, rgb, state.params["opacity"])
jax.block_until_ready(attrs)

prev = 0.0
for stage in ("expand1", "strip", "expand2", "tile_sort", None):
    f = jax.jit(lambda uv, z, radius, mask, attrs, _s=stage: build_tile_tables(
        uv, z, radius, mask, attrs=attrs,
        num_tiles_x=st.num_tiles_x, num_tiles_y=st.num_tiles_y,
        tile_size=st.tile, pair_cap=st.pair_cap, chunk_size=st.chunk,
        row_cap=st.row_cap, _stop_after=_s))
    out, t = timeit(f"binning..{stage or 'FULL'}", f, uv, z, radius, mask,
                    attrs)
    print(f"    stage delta: {(t - prev)*1e3:9.2f} ms", flush=True)
    prev = t
tables = out
print("num_pairs", int(tables.num_pairs), "row_overflow",
      int(tables.row_overflow), "overflow", int(tables.overflow), flush=True)

# ---- backward components, standalone with realistic data ----
from gsplat_tpu.kernels import rasterize as _k
from gsplat_tpu.kernels.segsum import segment_sum_by_gid

num_tiles = st.num_tiles_x * st.num_tiles_y
bg = jnp.float32(0.2)

fwd = jax.jit(lambda s, ts, tc: _k.rasterize_forward(
    s, ts, tc, bg, num_tiles_x=st.num_tiles_x, num_tiles=num_tiles,
    tile=st.tile, k=st.chunk))
out_f, t_fwd = timeit("fwd kernel", fwd, tables.stream, tables.tile_start,
                      tables.tile_count)

def bwd_fn(stream, out_t, ts, tc):
    di = out_t[:, 0:3, :] * 1e-3
    tfin = out_t[:, 3:4, :]
    nspl = out_t[:, 4:5, :]
    bgdot = bg * jnp.sum(di, axis=1, keepdims=True)
    pix_stream = jnp.concatenate(
        [di, tfin, nspl, bgdot, jnp.zeros_like(di[:, :2, :])], axis=1)
    tile_maxn = jnp.max(out_t[:, 4, :], axis=1).astype(jnp.int32)
    g, side = _k.rasterize_backward(
        stream, pix_stream, ts, tc, tile_maxn,
        num_tiles_x=st.num_tiles_x, num_tiles=num_tiles, tile=st.tile,
        k=st.chunk, pack_grads=True, grad_scale=(0.5 * W, 0.5 * H))
    return g[0, 0, 0] + side[0, 0, 0]

bwdj = jax.jit(bwd_fn)
_, t_bwd = timeit("bwd kernel", bwdj, tables.stream, out_f,
                  tables.tile_start, tables.tile_count)

# regroup sort: 1 gid key + 5 packed grad words at pair cap
cap = st.pair_cap
n_cap = state.alive.shape[0]
gw = jnp.asarray(rng.integers(-2**30, 2**30, size=(_k.GRAD_PACKED_ROWS, cap)).astype(np.int32))
gk = jnp.where(tables.splat_gid < 0, jnp.int32(1 << 23), tables.splat_gid)
reg = jax.jit(lambda c, g: jax.lax.sort(
    (c,) + tuple(g[i] for i in range(_k.GRAD_PACKED_ROWS)), dimension=0, is_stable=False,
    num_keys=1))
out_r, t_reg = timeit("regroup sort (1key+pay)", reg, gk, gw)

segs = jax.jit(lambda g, v, n=n_cap: segment_sum_by_gid(v, g, n))
_, t_seg = timeit("segsum by gid", segs, out_r[0],
                  jnp.stack(out_r[1:], axis=0))

# loss fwd+bwd
from gsplat_tpu.ops.loss import fused_loss

img = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
gt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
lossg = jax.jit(jax.grad(lambda a, b: fused_loss(a, b, 0.2)))
_, t_loss = timeit("loss fwd+bwd", lossg, img, gt)

# full step for reference (the step donates its state argument, so thread
# the returned state through instead of reusing the donated buffers)
from gsplat_tpu.train.step import get_train_step

step = get_train_step(st)
gt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
state, _m = step(state, view, proj, campos, gt, bg, jnp.int32(0))
_ = np.asarray(_m.loss)
best = 1e9
for r in range(3):
    t0 = time.perf_counter()
    for i in range(12):
        state, _m = step(state, view, proj, campos, gt, bg, jnp.int32(i + 1))
    _ = np.asarray(_m.loss)
    best = min(best, (time.perf_counter() - t0) / 12)
print(f"{'FULL train step':32s} {best*1e3:9.2f} ms", flush=True)
