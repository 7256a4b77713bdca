"""Batched quantization / dequantization (HEVC spec 8.6.3, Table 8-10).

QP may be a Python int or a traced scalar (so one compiled program
serves all 52 QPs).  All arithmetic is int32 with documented exactness
bounds: |coeff| <= 65,000 for quantize (65000*26214 + 2^27/3 < 2^31)
and |level| <= 2^20 for dequantize — both far above what the bounded
transform output can produce for 8/10-bit video.  The unbounded
public API (arbitrary int32) is served by the int64 numpy oracle.
Parity: /root/reference/nano_hevc/quant.py:41-123.
"""

from __future__ import annotations

import jax.numpy as jnp

from nanohevc_tpu.tables import DEQUANT_SCALE, QUANT_SCALE

_QUANT_SCALE = tuple(QUANT_SCALE)
_DEQUANT_SCALE = tuple(DEQUANT_SCALE)


def _qp_params(qp):
    qp = jnp.clip(jnp.asarray(qp, dtype=jnp.int32), 0, 51)
    return qp // 6, qp % 6


def quantize(
    coeffs: jnp.ndarray, qp, n: int | None = None, is_intra: bool = True
) -> jnp.ndarray:
    """level = sign(c) * ((|c| * MF + deadzone) >> (14 + qp//6 + log2 N))."""
    if n is None:
        n = coeffs.shape[-1]
    qp_per, qp_rem = _qp_params(qp)
    mf = jnp.asarray(_QUANT_SCALE, dtype=jnp.int32)[qp_rem]
    shift = 14 + qp_per + (n.bit_length() - 1)
    offset = jnp.left_shift(1, shift) // (3 if is_intra else 6)
    c = coeffs.astype(jnp.int32)
    level = jnp.right_shift(jnp.abs(c) * mf + offset, shift)
    return jnp.sign(c) * level


def dequantize(
    levels: jnp.ndarray, qp, n: int | None = None, rescale: bool = False
) -> jnp.ndarray:
    """coeff = (level*scale + rnd) >> (4 - qp//6)  or  << (qp//6 - 4).

    Default (rescale=False) matches the reference, whose dequant shift
    ignores the block size (parity: quant.py:110-121) — exact inverse
    gain only at 4x4.  rescale=True restores the spec-correct size
    term: shift = 6 - log2 N - qp//6 (negative -> left shift), the
    inverse of the forward 14 + qp//6 + log2 N against MF*DS ~= 2^20.
    """
    if n is None:
        n = levels.shape[-1]
    shift_base = 6 - (n.bit_length() - 1) if rescale else 4
    qp_per, qp_rem = _qp_params(qp)
    base = levels.astype(jnp.int32) * jnp.asarray(_DEQUANT_SCALE, jnp.int32)[qp_rem]
    shift = shift_base - qp_per
    sh = jnp.maximum(shift, 1)
    down = jnp.right_shift(base + jnp.left_shift(1, sh - 1), sh)
    up = jnp.left_shift(base, jnp.maximum(-shift, 0))
    return jnp.where(shift >= 1, down, up)
