"""16-bit pair packing shared by binning, render, and the Pallas kernels.

ONE home for the bit format: several stages (sort-payload pack in
ops/binning.py, packed grad words in kernels/rasterize.py, head-chunk
side-add repack in ops/render.py) must produce/consume bit-identical
words, so the pack/unpack pairs live here and everything imports them.

All packing stays in the INTEGER domain end to end (bf16/f16 patterns
ride int32 operands): the TPU flushes denormal f32 to zero even in data
movement, so bit patterns must never ride f32 lanes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pack_bf16_pair(hi: jnp.ndarray, lo: jnp.ndarray) -> jnp.ndarray:
    """Two f32 arrays -> one int32 of packed bf16 halves (rounded).

    Sort cost is per payload operand, and DMA bytes are halved, so pair
    packing is the workhorse of the pair-stream pipeline. A bf16-exact
    f32 has zero low mantissa bits, so its bf16 pattern IS the high half
    — packing bf16-exact values is lossless and idempotent."""
    h = jax.lax.bitcast_convert_type(
        hi.astype(jnp.bfloat16).astype(jnp.float32), jnp.uint32
    )
    l = jax.lax.bitcast_convert_type(
        lo.astype(jnp.bfloat16).astype(jnp.float32), jnp.uint32
    )
    return jax.lax.bitcast_convert_type(
        (h & jnp.uint32(0xFFFF0000)) | (l >> 16), jnp.int32
    )


def unpack_bf16_pair(packed: jnp.ndarray):
    """Inverse of pack_bf16_pair: int32 -> (hi, lo) f32 arrays."""
    u = jax.lax.bitcast_convert_type(packed, jnp.uint32)
    hi = jax.lax.bitcast_convert_type(
        u & jnp.uint32(0xFFFF0000), jnp.float32
    )
    lo = jax.lax.bitcast_convert_type(u << 16, jnp.float32)
    return hi, lo


def pack_f16_pair(hi: jnp.ndarray, lo: jnp.ndarray) -> jnp.ndarray:
    """Two f32 arrays -> one int32 of packed IEEE f16 halves.

    Used for TILE-RELATIVE screen positions, where magnitude is bounded
    by the splat's reach from the tile: sub-0.01px rounding inside the
    tile, ~2^-11-relative at distance. Callers must keep inputs within
    f16 range (+-65504); see the clamp at the tile-sort pack site."""
    h = jax.lax.bitcast_convert_type(
        hi.astype(jnp.float16), jnp.uint16
    ).astype(jnp.uint32)
    l = jax.lax.bitcast_convert_type(
        lo.astype(jnp.float16), jnp.uint16
    ).astype(jnp.uint32)
    return jax.lax.bitcast_convert_type((h << 16) | l, jnp.int32)


def unpack_f16_pair(packed: jnp.ndarray):
    """Inverse of pack_f16_pair: int32 -> (hi, lo) f32 arrays."""
    u = jax.lax.bitcast_convert_type(packed, jnp.uint32)
    hi = jax.lax.bitcast_convert_type(
        (u >> 16).astype(jnp.uint16), jnp.float16
    ).astype(jnp.float32)
    lo = jax.lax.bitcast_convert_type(
        u.astype(jnp.uint16), jnp.float16
    ).astype(jnp.float32)
    return hi, lo


def f16_bits_to_f32(h: jnp.ndarray) -> jnp.ndarray:
    """IEEE f16 bit pattern (uint32, low 16 bits) -> f32 value, PURE BIT
    MATH (usable inside Pallas kernels with no hardware f16 dependency).

    Exact for normals; subnormals/zeros flush to 0 (< 6.1e-5 px for the
    tile-relative uv use). Inf/NaN inputs cannot occur: the pack site
    clamps to +-16384, so the f16 exponent field is <= 30."""
    sign = (h & jnp.uint32(0x8000)) << 16
    expmant = h & jnp.uint32(0x7FFF)
    bits = sign | ((expmant + jnp.uint32(112 << 10)) << 13)
    val = jax.lax.bitcast_convert_type(bits, jnp.float32)
    return jnp.where(expmant < jnp.uint32(1 << 10), 0.0, val)
