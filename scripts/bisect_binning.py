import sys

sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu.ops import binning as B

N = 1 << 20
PAIR_CAP = 1 << 22
NTX, NTY, TILE = 81, 53, 16
CHUNK = 256

rng = np.random.default_rng(0)
uv = jnp.asarray(rng.uniform(0, [NTX * TILE, NTY * TILE], (N, 2)).astype(np.float32))
z = jnp.asarray(rng.uniform(0.3, 50, N).astype(np.float32))
r_major = rng.uniform(2, 30, N).astype(np.float32)
r_minor = r_major * rng.uniform(0.3, 1.0, N).astype(np.float32)
theta = rng.uniform(0, np.pi, N)
radius = jnp.asarray(
    np.stack([r_major, r_minor, np.sin(theta), np.cos(theta)], 1).astype(np.float32)
)
mask = jnp.asarray(rng.uniform(size=N) < 0.6)


def timeit(name, fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:42s} {dt:9.2f} ms")
    return out


def upto(stage):
    def fn(uv, z, radius, mask):
        n = uv.shape[0]
        num_tiles = NTX * NTY
        zkey = jnp.where(mask, z, jnp.inf)
        order = jnp.argsort(zkey, stable=True).astype(jnp.int32)
        uv_d = uv[order]
        radius_d = radius[order]
        mask_d = mask[order]
        if stage == 0:
            return uv_d, radius_d, mask_d
        tx0, ty0, num_x, num_y, counts = B.tile_spans(
            uv_d, radius_d, mask_d, NTX, NTY, TILE
        )
        offsets = jnp.cumsum(counts) - counts
        total_cand = offsets[-1] + counts[-1]
        if stage == 1:
            return offsets, total_cand
        cap = PAIR_CAP
        slot = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0).squeeze(-1)
        gid_d = B._segment_ids(offsets, counts, cap)
        gid_d = jnp.clip(gid_d, 0, n - 1)
        if stage == 2:
            return gid_d
        within = slot - offsets[gid_d]
        cand_valid = slot < jnp.minimum(total_cand, cap)
        ny_g = jnp.maximum(num_y[gid_d], 1)
        tile_x = tx0[gid_d] + within // ny_g
        tile_y = ty0[gid_d] + within % ny_g
        if stage == 3:
            return tile_x, tile_y
        hits = B.obb_tile_intersects(
            uv_d[gid_d, 0], uv_d[gid_d, 1], radius_d[gid_d], tile_x, tile_y, TILE
        )
        valid = cand_valid & hits & mask_d[gid_d]
        if stage == 4:
            return valid
        tile_idx = tile_y * NTX + tile_x
        key = jnp.where(valid, tile_idx, num_tiles).astype(jnp.int32)
        gid_orig = order[gid_d]
        key_sorted, gid_sorted = jax.lax.sort(
            (key, gid_orig), dimension=0, is_stable=True, num_keys=1
        )
        if stage == 5:
            return key_sorted, gid_sorted
        bounds = jnp.searchsorted(
            key_sorted, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
        ).astype(jnp.int32)
        tile_start_raw = bounds[:-1]
        tile_count = bounds[1:] - bounds[:-1]
        if stage == 6:
            return tile_count
        padded = ((tile_count + CHUNK - 1) // CHUNK) * CHUNK
        tile_start = jnp.cumsum(padded) - padded
        t_of_pair = key_sorted
        safe_t = jnp.clip(t_of_pair, 0, num_tiles - 1)
        dst = tile_start[safe_t] + (slot - tile_start_raw[safe_t])
        in_range = (t_of_pair < num_tiles) & (dst < cap)
        dst = jnp.where(in_range, dst, cap)
        splat_gid = jnp.full((cap,), -1, jnp.int32)
        splat_gid = splat_gid.at[dst].set(
            jnp.where(in_range, gid_sorted, -1), mode="drop"
        )
        return splat_gid

    return jax.jit(fn)


for s in range(8):
    timeit(f"stage<={s}", upto(s), uv, z, radius, mask)
