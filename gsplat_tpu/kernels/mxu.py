"""MXU helpers shared by the Pallas kernels.

``dot_f32_bf16x3``: an f32-grade matmul from three full-rate bf16 MXU
passes. Mosaic supports only DEFAULT (inputs demoted to bf16 — corrupts
integer payloads) and HIGHEST (6 passes) dot precisions; the expand/segsum
kernels need exact integer selection but not 6-pass precision.

The trick: split the f32 operand into three terms that are each EXACTLY
bf16-representable by TRUNCATING mantissa bits with integer masks (hi =
x with the low 16 mantissa bits cleared, mid = the same truncation of
x - hi, lo = the final remainder; see ``dot_f32_bf16x3`` below for why
truncation, not round-to-nearest-bf16 — XLA's excess-precision rewrite
folds f32->bf16->f32 convert pairs and would zero the residues), keep
them as f32 arrays (avoiding bf16 vector layouts, which Mosaic cannot
always relayout from f32-tiled masks), and issue three DEFAULT-precision
dots — the MXU's input demotion rounds each term to itself, so every pass
is lossless. The f32 accumulation of the three partials gives 24 mantissa
bits:

- integers |x| < 2^24 are reconstructed EXACTLY (hi's truncation leaves a
  residue below 2^16 at hi's scale, mid's a residue below 2^8, and the
  final lo has <= 8 significant bits — all exactly bf16; the f32 sum
  hi+mid+lo re-sums to x without rounding);
- floats come back with ~2^-24-relative error — f32-grade.

The other operand must be bf16-exact as an f32 array (the 0/1 one-hot
matrices the kernels use).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dot_f32_bf16x3(a_f32, b_f32, dimension_numbers):
    """dot_general(a, b) with f32-grade precision from 3 bf16 MXU passes.

    a_f32: f32 operand (split into bf16-exact hi/mid/lo terms).
    b_f32: operand whose values are bf16-exact (e.g. a 0/1 one-hot matrix),
      as f32.
    """
    # Split by INTEGER mantissa masking, not x - bf16(x): compilers with
    # excess-precision rewrites (XLA HLO does this to jitted graphs; see
    # kernels/expand._split3) can fold the f32->bf16->f32 convert pair,
    # zeroing the residual terms. Bitcast/mask has no such rewrite.
    mask16 = jnp.int32(-65536)  # 0xFFFF0000

    def _trunc(v):
        vi = jax.lax.bitcast_convert_type(v, jnp.int32)
        return jax.lax.bitcast_convert_type(vi & mask16, jnp.float32)

    hi = _trunc(a_f32)
    r1 = a_f32 - hi
    mid = _trunc(r1)
    lo = r1 - mid  # <= 8 significant bits: bf16-exact on MXU input
    out = None
    for part in (hi, mid, lo):
        d = jax.lax.dot_general(
            part, b_f32,
            dimension_numbers=dimension_numbers,
            preferred_element_type=jnp.float32,
        )
        out = d if out is None else out + d
    return out
