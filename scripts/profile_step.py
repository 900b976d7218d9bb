"""Stage-wise timing of the training step at the bench operating point.

NOTE: on the axon backend block_until_ready can return before execution
completes; every timed iteration fetches 4 bytes to host to force a sync.
Fixed per-call tunnel overhead is ~30 ms — subtract it mentally.
"""

import sys

sys.path.insert(0, "/root/repo")

import time

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu.ops.binning import build_tile_tables
from gsplat_tpu.ops.render import pack_attrs, _get_raster_op
from gsplat_tpu.train.step import (
    StepStatics, _per_gaussian, compute_loss_and_grads, train_step,
)
from gsplat_tpu.train.init import GaussianData
from gsplat_tpu.train.state import init_state, round_capacity

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
PAIR_CAP = 13 * (1 << 19)
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

from gsplat_tpu.ops.camera import build_camera_matrices

cm = build_camera_matrices(np.array([1.0, 0, 0, 0]), np.zeros(3), W, H, W * 0.8, W * 0.8)
st = StepStatics(
    width=W, height=H, tile=16, chunk=128, pair_cap=PAIR_CAP, l_max=3,
    focal_x=cm.focal_x, focal_y=cm.focal_y, tan_fovx=cm.tan_fovx, tan_fovy=cm.tan_fovy,
    near_thresh=0.3, mh_dist=3.0, cull_padding=100, ssim_frac=0.2,
    base_lr=1e-3, xyz_lr_init=0.16, xyz_lr_final=0.0016,
    quat_lr=1.0, scale_lr=5.0, opacity_lr=25.0, rgb_lr=2.5, sh_lr=0.125,
    scene_extent=2.0, num_iters=7000, interpret=False,
)

view = jnp.asarray(cm.view)
proj = jnp.asarray(cm.proj)
campos = jnp.asarray(cm.campos)
bg = jnp.float32(0.0)
gt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))


def timeit(name, fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(jnp.ravel(leaf)[0])
    times = []
    for _i in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = np.asarray(jnp.ravel(leaf)[0])
        times.append(time.perf_counter() - t0)
    print(f"{name:35s} {min(times)*1e3:9.2f} ms")
    return out


pg = jax.jit(lambda p, a: _per_gaussian(p, a, view, proj, campos, st))
uv, conic, rgb, mask, radius, z = timeit("per_gaussian", pg, state.params, state.alive)

attrs = jax.jit(pack_attrs)(uv, conic, rgb, state.params["opacity"])
binf = jax.jit(lambda uv, z, radius, mask, attrs: build_tile_tables(
    uv, z, radius, mask, attrs=attrs,
    num_tiles_x=st.num_tiles_x, num_tiles_y=st.num_tiles_y,
    tile_size=st.tile, pair_cap=st.pair_cap, chunk_size=st.chunk))
tables = timeit("build_tile_tables (incl stream)", binf, uv, z, radius, mask, attrs)
print("   num_pairs:", int(tables.num_pairs), "overflow:", int(tables.overflow))

num_tiles = st.num_tiles_x * st.num_tiles_y
op = _get_raster_op(st.num_tiles_x, num_tiles, st.tile, st.chunk, False)
fwdf = jax.jit(lambda a, t, b: op(a, t, b))
out = timeit("raster op fwd (pallas)", fwdf, attrs, tables, bg)


def fb(attrs, tables, b):
    o = op(attrs, tables, b)
    return jnp.sum(o[:, 0:3, :] ** 2)


fbf = jax.jit(jax.grad(fb))
timeit("raster op fwd+bwd (attr grad)", fbf, attrs, tables, bg)

clg = jax.jit(lambda p, a: compute_loss_and_grads(p, a, view, proj, campos, gt, bg, st))
timeit("compute_loss_and_grads (full)", clg, state.params, state.alive)

ts_f = jax.jit(lambda s, it: train_step(s, view, proj, campos, gt, bg, it, st))
timeit("full train_step", ts_f, state, jnp.int32(0))
