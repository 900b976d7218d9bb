"""Differentiable tile rasterization op (custom VJP around the Pallas kernels).

Architecture: the only custom-gradient boundary is the (splat stream) ->
(tile pixels) compositing pair from kernels/rasterize.py. Everything around
it — gathering per-Gaussian attributes into the sorted pair stream and
scattering per-pair gradients back — is plain ``jnp.take``/AD, so XLA derives
the scatter-add that replaces the reference's atomicAdd accumulation
(render_backward.cu:207-220).

Gradient conventions (reference parity, SURVEY §2.4 D11):
- uv cotangents are scaled by 0.5*W / 0.5*H inside the backward
  (render_backward.cu:186-187). Projection AD then applies the full W/2 chain
  again, reproducing the reference's double-scaled xyz gradient path, and the
  densification accumulator consumes these scaled uv grads.
- the 0.99 alpha clamp and the power<=0 clamp are ignored in the backward,
  as in the reference.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels import rasterize as _k
from .binning import TileTables


def default_interpret() -> bool:
    return jax.default_backend() != "tpu"


class RenderOutput(NamedTuple):
    image: jnp.ndarray  # (H, W, 3) cropped
    t_final: jnp.ndarray  # (T, PIX)
    n_splats: jnp.ndarray  # (T, PIX) float32 counts


@functools.lru_cache(maxsize=32)
def _get_raster_op(num_tiles_x, num_tiles, tile, k, interpret):
    """Build the custom-VJP op for a static (grid, tile, chunk) geometry."""

    @jax.custom_vjp
    def op(stream, tile_start, tile_count, bg):
        return _k.rasterize_forward(
            stream, tile_start, tile_count, bg,
            num_tiles_x=num_tiles_x, num_tiles=num_tiles, tile=tile, k=k,
            interpret=interpret,
        )

    def fwd(stream, tile_start, tile_count, bg):
        out = op(stream, tile_start, tile_count, bg)
        return out, (stream, tile_start, tile_count, bg, out)

    def bwd(res, ct):
        stream, tile_start, tile_count, bg, out = res
        pix = tile * tile
        di = ct[:, 0:3, :]  # (T, 3, PIX) image cotangent
        tfin = out[:, 3:4, :]
        nspl = out[:, 4:5, :]
        bgdot = bg * jnp.sum(di, axis=1, keepdims=True)
        pix_stream = jnp.concatenate(
            [di, tfin, nspl, bgdot, jnp.zeros_like(di[:, :2, :])], axis=1
        )
        tile_maxn = jnp.max(out[:, 4, :], axis=1).astype(jnp.int32)
        grad_stream = _k.rasterize_backward(
            stream, pix_stream, tile_start, tile_count, tile_maxn,
            num_tiles_x=num_tiles_x, num_tiles=num_tiles, tile=tile, k=k,
            interpret=interpret,
        )
        # The kernel only writes tile-owned chunk blocks; the stream tail past
        # the last tile's padded block is uninitialized memory. Zero it so
        # downstream scatter-adds (which multiply by the pad-validity mask)
        # never see garbage/NaN (0 * NaN = NaN).
        p_cap = stream.shape[1]
        last_padded = ((tile_count[-1] + k - 1) // k) * k
        total_padded = tile_start[-1] + last_padded
        written = (
            jax.lax.broadcasted_iota(jnp.int32, (1, p_cap), 1) < total_padded
        )
        grad_stream = jnp.where(written, grad_stream, 0.0)
        # Reference uv-gradient convention: x(0.5*W), x(0.5*H)
        # (render_backward.cu:186-187).
        w_img = num_tiles_x * tile
        h_img = (num_tiles // num_tiles_x) * tile
        scale = jnp.ones((_k.STREAM_ROWS, 1), jnp.float32)
        scale = scale.at[0, 0].set(0.5 * w_img).at[1, 0].set(0.5 * h_img)
        d_stream = grad_stream * scale
        f0 = lambda x: np.zeros(x.shape, jax.dtypes.float0)  # noqa: E731
        return (d_stream, f0(tile_start), f0(tile_count), jnp.zeros_like(bg))

    op.defvjp(fwd, bwd)
    return op


def build_splat_stream(
    uv: jnp.ndarray,
    conic: jnp.ndarray,
    rgb: jnp.ndarray,
    opacity_logit: jnp.ndarray,
    splat_gid: jnp.ndarray,
) -> jnp.ndarray:
    """Gather per-Gaussian attributes into the sorted (16, P) pair stream.

    Differentiable: AD through the takes yields the per-Gaussian scatter-add
    of pair gradients. Padding slots (gid < 0) read zeros.
    """
    valid = (splat_gid >= 0).astype(uv.dtype)
    gid = jnp.maximum(splat_gid, 0)
    opa = jax.nn.sigmoid(opacity_logit)
    rows = [
        uv[gid, 0] * valid,
        uv[gid, 1] * valid,
        conic[gid, 0] * valid,
        conic[gid, 1] * valid,
        conic[gid, 2] * valid,
        opa[gid] * valid,
        rgb[gid, 0] * valid,
        rgb[gid, 1] * valid,
        rgb[gid, 2] * valid,
    ]
    stream = jnp.stack(rows, axis=0)
    pad = jnp.zeros((_k.STREAM_ROWS - len(rows), stream.shape[1]), stream.dtype)
    return jnp.concatenate([stream, pad], axis=0)


def tiles_to_image(
    out_tiles: jnp.ndarray,
    num_tiles_x: int,
    num_tiles_y: int,
    tile: int,
    width: int,
    height: int,
) -> jnp.ndarray:
    """(T, 3, PIX) tile pixels -> cropped (H, W, 3) image."""
    x = out_tiles.reshape(num_tiles_y, num_tiles_x, 3, tile, tile)
    x = x.transpose(0, 3, 1, 4, 2)  # (ty, py, tx, px, 3)
    x = x.reshape(num_tiles_y * tile, num_tiles_x * tile, 3)
    return x[:height, :width, :]


def rasterize(
    uv: jnp.ndarray,
    conic: jnp.ndarray,
    rgb: jnp.ndarray,
    opacity_logit: jnp.ndarray,
    tables: TileTables,
    bg: jnp.ndarray,
    *,
    width: int,
    height: int,
    tile: int,
    chunk: int,
    interpret: bool | None = None,
) -> RenderOutput:
    """Render the image; differentiable w.r.t. (uv, conic, rgb, opacity)."""
    if interpret is None:
        interpret = default_interpret()
    num_tiles_x = (width + tile - 1) // tile
    num_tiles_y = (height + tile - 1) // tile
    num_tiles = num_tiles_x * num_tiles_y

    stream = build_splat_stream(uv, conic, rgb, opacity_logit, tables.splat_gid)
    op = _get_raster_op(num_tiles_x, num_tiles, tile, chunk, bool(interpret))
    out = op(
        stream, tables.tile_start, tables.tile_count,
        jnp.asarray(bg, jnp.float32),
    )
    image = tiles_to_image(
        out[:, 0:3, :], num_tiles_x, num_tiles_y, tile, width, height
    )
    t_final = jax.lax.stop_gradient(out[:, 3, :])
    n_splats = jax.lax.stop_gradient(out[:, 4, :])
    return RenderOutput(image=image, t_final=t_final, n_splats=n_splats)
