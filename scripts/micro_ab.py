"""A/B probes at the bench operating point: chunk size k for the rasterize
kernels, s_block for the expand kernels, and 2-D (column-vectorized)
lax.sort shapes. Queued-dispatch timing (scripts/mtime.py)."""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu.utils.platform import enable_compile_cache

enable_compile_cache("/root/repo/.jax_cache")

from scripts.mtime import timeit
from gsplat_tpu.ops.binning import build_tile_tables
from gsplat_tpu.ops.render import pack_attrs
from gsplat_tpu.train.step import StepStatics, _per_gaussian
from gsplat_tpu.train.init import GaussianData
from gsplat_tpu.train.state import init_state, round_capacity
from gsplat_tpu.ops.camera import build_camera_matrices
from gsplat_tpu.kernels import rasterize as _k

N = 1_000_000
PAIR_CAP = 11 * (1 << 19)
ROW_CAP = 10 * (1 << 18)
W, H = 1296, 840

rng = np.random.default_rng(0)
g = GaussianData(
    xyz=(rng.normal(size=(N, 3)) * [2.0, 1.4, 1.2] + [0, 0, 6.0]).astype(np.float32),
    rgb=rng.normal(size=(N, 3)).astype(np.float32),
    opacity=rng.uniform(-1.0, 2.0, size=N).astype(np.float32),
    scale=np.log(rng.uniform(0.004, 0.04, size=(N, 3))).astype(np.float32),
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

pg = jax.jit(lambda p, a: _per_gaussian(p, a, view, proj, campos, st))
uv, conic, rgb, mask, radius, z = pg(state.params, state.alive)
attrs = jax.jit(pack_attrs)(uv, conic, rgb, state.params["opacity"])

binf = jax.jit(lambda: build_tile_tables(
    uv, z, radius, mask, attrs=attrs,
    num_tiles_x=st.num_tiles_x, num_tiles_y=st.num_tiles_y,
    tile_size=st.tile, pair_cap=st.pair_cap, chunk_size=st.chunk,
    row_cap=st.row_cap))
tables = binf()
jax.block_until_ready(tables.stream)
print("num_pairs", int(tables.num_pairs), flush=True)

num_tiles = st.num_tiles_x * st.num_tiles_y
bg = jnp.float32(0.2)

for k in (128, 256, 512):
    fwd = jax.jit(lambda s, ts, tc, k=k: _k.rasterize_forward(
        s, ts, tc, bg, num_tiles_x=st.num_tiles_x, num_tiles=num_tiles,
        tile=st.tile, k=k))
    out_f, _ = (fwd(tables.stream, tables.tile_start, tables.tile_count),
                None)
    jax.block_until_ready(out_f)
    timeit(f"fwd kernel k={k}", fwd, tables.stream, tables.tile_start,
           tables.tile_count)

    def bwd_fn(stream, out_t, ts, tc, k=k):
        di = out_t[:, 0:3, :] * 1e-3
        tfin = out_t[:, 3:4, :]
        nspl = out_t[:, 4:5, :]
        bgdot = bg * jnp.sum(di, axis=1, keepdims=True)
        pix_stream = jnp.concatenate(
            [di, tfin, nspl, bgdot, jnp.zeros_like(di[:, :2, :])], axis=1)
        tile_maxn = jnp.max(out_t[:, 4, :], axis=1).astype(jnp.int32)
        gg, side = _k.rasterize_backward(
            stream, pix_stream, ts, tc, tile_maxn,
            num_tiles_x=st.num_tiles_x, num_tiles=num_tiles, tile=st.tile,
            k=k, pack_grads=True, grad_scale=(0.5 * W, 0.5 * H))
        return gg[0, 0, 0] + side[0, 0, 0]

    timeit(f"bwd kernel k={k}", jax.jit(bwd_fn), tables.stream, out_f,
           tables.tile_start, tables.tile_count)

# ---- 2-D sort shapes: vectorized column sorts ----
P = PAIR_CAP
key = jnp.asarray(rng.integers(0, 1 << 29, size=P).astype(np.int32))
pay = [jnp.asarray(rng.integers(-(2**31), 2**31 - 1, size=P, dtype=np.int64)
                   .astype(np.int32)) for _ in range(4)]
sort1 = jax.jit(lambda *o: jax.lax.sort(o, dimension=0, is_stable=False,
                                        num_keys=1))
timeit("sort flat 5.77M 1key+4pay", sort1, key, *pay)
for cols in (8, 64, 128, 512):
    rows = P // cols
    k2 = key.reshape(rows, cols)
    p2 = [p.reshape(rows, cols) for p in pay]
    s2 = jax.jit(lambda *o: jax.lax.sort(o, dimension=0, is_stable=False,
                                         num_keys=1))
    timeit(f"sort ({rows}, {cols}) dim0 1key+4pay", s2, k2, *p2)
