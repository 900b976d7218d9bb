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


# Shared-exponent triple word: [E:5 | qa:9 | qb:9 | qc:9], one int32. Each
# channel is a signed 9-bit code q in [-255, 255] (stored offset-256) at
# scale 2^(E - bias) / 128, E chosen from the largest |channel|: rounding
# error <= amax/256 (0.2-0.4% of the largest channel — the same absolute
# scale as per-channel bf16 on the largest channel, traded for one fewer
# sort operand / 4 fewer DMA bytes per pair). Covers amax in
# [2^-bias, 2^(31-bias)]; larger clamps, smaller flushes to 0. Every
# unpacked value is q * 2^k — BF16-EXACT (|q| <= 255 is 8 significant
# bits), which the segment-sum kernel's single bf16 MXU pass relies on.
#
# ACCEPTED TRADEOFF: a channel much smaller than its siblings carries
# large relative error (or flushes) because the shared exponent follows
# the largest channel — per-pair error is amax-relative, not per-channel.
# The consumer is the per-Gaussian SUM over pairs, where the error stays
# bounded by n_pairs * amax/512 (tests/test_kernels.py skewed-channel
# test); this is traded for one fewer sort operand / 4 fewer DMA bytes
# per pair vs per-channel bf16.
#
# Two instances share the format, differing only in the bias window:
# - colors (bias 20, |c| in [2^-20, 2^11]): far outside any real color
#   (reference colors are DC*Y0 + 0.5 + higher SH terms).
# - color GRADIENTS (bias 24, |g| in [2^-24, 2^7]): per-pair dL/drgb
#   carries the loss's 1/(H*W*3) pixel normalization (ops/loss.py), so
#   magnitudes sit around 2^-14..2^-30; the 2^-24 floor flushes pairs
#   contributing < ~0.1% of a typical per-Gaussian sum, and the 2^7
#   ceiling keeps O(1) user-supplied cotangents safe.
_RGB_BIAS = 20
GRAD_E5_BIAS = 24


def pack_rgb_e5(r: jnp.ndarray, g: jnp.ndarray, b: jnp.ndarray,
                bias: int = _RGB_BIAS):
    """Three f32 arrays -> one int32 shared-exponent triple word."""
    amax = jnp.maximum(jnp.maximum(jnp.abs(r), jnp.abs(g)), jnp.abs(b))
    # Exponent of amax via bit math (amax >= 0; zero -> exponent field 0
    # -> e clamps to 0 and all q round to 0).
    ebits = (
        jax.lax.bitcast_convert_type(amax, jnp.uint32) >> 23
    ).astype(jnp.int32) - 127
    e = jnp.clip(ebits + bias, 0, 31)
    # inv_scale = 2^(7 - (e - bias)) built directly from exponent bits.
    inv_scale = jax.lax.bitcast_convert_type(
        ((134 - e + bias) << 23).astype(jnp.uint32), jnp.float32
    )

    def q(c):
        qi = jnp.clip(
            jnp.round(c * inv_scale), -255.0, 255.0
        ).astype(jnp.int32)
        return (qi + 256).astype(jnp.uint32)

    word = (
        (e.astype(jnp.uint32) << 27) | (q(r) << 18) | (q(g) << 9) | q(b)
    )
    return jax.lax.bitcast_convert_type(word, jnp.int32)


def unpack_rgb_e5(word: jnp.ndarray, bias: int = _RGB_BIAS):
    """Inverse of pack_rgb_e5: int32 -> (r, g, b) f32 arrays.

    Pure bit math (usable inside Pallas kernels)."""
    u = jax.lax.bitcast_convert_type(word, jnp.uint32)
    e = (u >> 27).astype(jnp.int32)
    scale = jax.lax.bitcast_convert_type(
        ((120 + e - bias) << 23).astype(jnp.uint32), jnp.float32
    )

    def c(shift):
        qi = ((u >> shift) & jnp.uint32(0x1FF)).astype(jnp.int32) - 256
        return qi.astype(jnp.float32) * scale

    return c(18), c(9), c(0)


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
