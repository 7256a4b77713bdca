"""Rate-distortion optimized quantization (RDOQ), batched and jittable.

Plain deadzone quantization (ops/quant.py, parity with the reference's
quant.py:41-79) picks each level independently of what it costs to
code.  RDOQ re-decides the levels under the true objective
``D + lambda * R``: distortion measured in the pixel domain through the
transform gain, rate priced by the calibrated static-context model of
the shipped range coder (ops/rate.py).  The adjustment is encoder-only
— the decoder just dequantizes whatever levels arrive, so no syntax
changes and every stream stays decodable.

Two stages, both pure batched array algebra (no per-block loops):

* **Stage A — level trim.**  For every nonzero level ``l`` the deadzone
  rounding can only overshoot, so the competitive candidate is
  ``l - 1`` (HM's RDOQ considers the same pair).  Each coefficient
  picks the candidate with smaller ``D + lambda * r`` where ``r`` is the
  separable part of the residual syntax (sig / gt1 / gt2 / EG0 /
  sign).  A ``1 -> 0`` trim is allowed only before the block's last
  significant position so stage B keeps a consistent candidate set.

* **Stage B — last-position choice.**  For every candidate "last
  significant coefficient" position ``p`` (and the all-zero block),
  the exact model cost ``lambda * (cbf + last-position + prefix syntax)
  + sum of distortion deltas from zeroing the tail`` is evaluated with
  prefix/suffix cumulative sums — one vectorized sweep over scan
  positions, then an argmin per block.  This prices the coder's
  last-position syntax (truncated-unary prefix + bypass suffix +
  full-block escape) exactly as ops/rate.model_bits does, so dropping
  a straggler nonzero high-frequency coefficient is chosen whenever
  the bits it frees outweigh its reconstruction value.

Distortion scale: a coefficient error ``delta`` at position (i, j)
becomes pixel-domain SSE ``delta^2 * |t_i|^2 |t_j|^2 / 2^(4*shift)``
through the two inverse-transform passes (ops/transform.py), so the
per-position gain matrix puts coefficient-domain deltas on the same
scale as the SSE used by the rdo_cbf decision — one lambda serves
both.  The reference has no RDOQ (its quant.py is plain deadzone);
this implements the feature the HEVC encoders it is modeled on use.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax.numpy as jnp

from nanohevc_tpu.ops import quant
from nanohevc_tpu.ops import rate as rate_mod
from nanohevc_tpu.tables import transform_matrix


@lru_cache(maxsize=None)
def _gain_matrix(n: int, use_dst: bool) -> np.ndarray:
    """(N, N) float32: pixel SSE per unit squared coefficient error.

    Exact for the linear part of the inverse transform; the per-pass
    rounding adds at most +-0.5 per pixel which is negligible against
    the costs being compared.
    """
    t = np.asarray(transform_matrix(n, use_dst), dtype=np.float64)
    row_norm2 = (t * t).sum(axis=1)                      # |t_i|^2
    shift = (n.bit_length() - 1) + 5                     # per pass
    g = np.outer(row_norm2, row_norm2) / float(2 ** (4 * shift))
    return g.astype(np.float32)


def rdoq_gain(n: int, use_dst: bool) -> jnp.ndarray:
    """Device copy of the (N, N) transform-gain matrix."""
    return jnp.asarray(_gain_matrix(n, use_dst))


def rd_lambda_calibrated(
    qp, n: int, use_dst: bool, dequant_rescale: bool, scale: float = 1.0
):
    """Lambda matched to THIS codec's true quantization step.

    HM's lambda = 0.57 * 2^((QP-12)/3) assumes the HEVC normalization
    where the pixel-domain step is 2^((QP-4)/6); equivalently
    lambda = 0.57 * 2^(-8/3) * step_pix^2 ~= 0.0897 * step_pix^2.
    This codec's transform/quant shift convention (ops/transform.py
    forward shift 2*(log2 N + 5); reference-parity dequant that omits
    the size term unless dequant_rescale) puts the effective step a
    constant factor off the nominal one, which is why the nominal
    formula barely binds (the round-2 review's weak item 5).  Derive
    the true step instead: step_coeff = dequantize(1) under the actual
    parameters, mapped to pixel SSE through the mean transform gain.
    Traced-QP safe; returns a float32 scalar.
    """
    step_c = quant.dequantize(
        jnp.ones((1, 1), jnp.int32), qp, n, rescale=dequant_rescale
    ).astype(jnp.float32)[0, 0]
    g_mean = float(_gain_matrix(n, use_dst).mean())
    step_pix2 = g_mean * step_c * step_c
    return jnp.float32(scale) * jnp.float32(0.57 * 2.0 ** (-8.0 / 3.0)) * step_pix2


@lru_cache(maxsize=None)
def _last_cost_vec(ncoef: int, table_key: tuple) -> np.ndarray:
    """(ncoef,) model bits of coding 'last significant index = p'.

    Mirrors ops/rate.model_bits: position ncoef-1 takes the full-block
    escape bin; otherwise escape=0 + truncated-unary prefix of
    klen = bit_length(p+1) - 1 + klen bypass suffix bits.
    """
    lastfull0, lastfull1, lastp0, lastp1 = table_key
    max_len = int(np.floor(np.log2(max(ncoef - 1, 2))))
    out = np.empty(ncoef, np.float32)
    for p in range(ncoef):
        if p == ncoef - 1:
            out[p] = lastfull1
            continue
        klen = (p + 1).bit_length() - 1
        c = lastfull0 + sum(lastp1[:klen]) + klen
        if klen < max_len:
            c += lastp0[klen]
        out[p] = c
    return out


def rdoq_levels(
    packed_coeff: jnp.ndarray,
    packed_levels: jnp.ndarray,
    packed_gain: jnp.ndarray,
    qp,
    n: int,
    lam,
    *,
    dequant_rescale: bool = False,
    table: rate_mod.RateTable | None = None,
) -> jnp.ndarray:
    """RD-adjust scan-ordered levels.  All inputs scan-packed.

    packed_coeff  (nb, ncoef) int32  true transform coefficients
    packed_levels (nb, ncoef) int32  deadzone-quantized levels
    packed_gain   (nb, ncoef) f32    transform gain per scan position
    lam                               pixel-SSE lambda (HEVC 0.57*2^..)

    Returns (nb, ncoef) int32 adjusted levels; never increases the
    stage-B candidate-set model cost vs keeping the stage-A levels.

    Rate model: the static calibrated table (ops/rate.default_table)
    is INTENTIONAL here even when the downstream rdo_cbf decision uses
    model_bits_adaptive.  This stage needs position-SEPARABLE per-
    coefficient prices (stage A compares l vs l-1 per position; stage
    B's prefix/suffix cumsums assume additive costs), which only the
    static table provides — the adaptive model's price for one
    coefficient depends on the running context state across the whole
    preceding block sequence and cannot be decomposed per position
    without serializing the sweep.  The two stages still share one
    lambda and one distortion scale, so their decisions compose; the
    table is calibrated against the same shipped coder the adaptive
    model tracks (tools/calibrate_rates.py), keeping the absolute
    scales within a few percent.
    """
    ncoef = packed_levels.shape[-1]
    if table is None:
        table = rate_mod.default_table(ncoef)
    lam = jnp.asarray(lam, jnp.float32)

    c = packed_coeff.astype(jnp.float32)
    g = packed_gain.astype(jnp.float32)
    lv = packed_levels.astype(jnp.int32)
    sgn = jnp.sign(lv)
    a = jnp.abs(lv)

    pos = jnp.minimum(jnp.arange(ncoef), 31)
    sig0 = jnp.asarray(table.sig0, jnp.float32)[pos]     # (ncoef,)
    sig1 = jnp.asarray(table.sig1, jnp.float32)[pos]

    def gt_cost(aa):
        eg = 2.0 * jnp.floor(
            jnp.log2(jnp.maximum(aa - 2, 1).astype(jnp.float32))
        ) + 1.0
        return jnp.where(
            aa > 1,
            table.gt1_1 + jnp.where(aa > 2, table.gt2_1 + eg, table.gt2_0),
            table.gt1_0,
        )

    def coef_rate(aa):
        # separable syntax cost at an emitted-sig position
        return jnp.where(aa > 0, sig1 + 1.0 + gt_cost(aa), sig0)

    def dist(aa):
        deq = quant.dequantize(sgn * aa, qp, n, rescale=dequant_rescale)
        d = c - deq.astype(jnp.float32)
        return g * d * d

    # ---- stage A: per-coefficient level trim (l vs l-1) ----
    sig = a > 0
    lastidx = ncoef - 1 - jnp.argmax(sig[:, ::-1], axis=-1)
    before_last = jnp.arange(ncoef)[None, :] < lastidx[:, None]
    down = jnp.maximum(a - 1, 0)
    better = dist(down) + lam * coef_rate(down) < dist(a) + lam * coef_rate(a)
    allow = sig & ((a > 1) | before_last)
    a = jnp.where(allow & better, down, a)

    # ---- stage B: optimal last position / all-zero block ----
    dist_keep = dist(a)
    dist_zero = g * c * c
    zero_gain = dist_zero - dist_keep                    # D delta if zeroed
    ccoef = coef_rate(a)

    total_zero = zero_gain.sum(axis=-1, keepdims=True)
    suffix = total_zero - jnp.cumsum(zero_gain, axis=-1)  # sum_{i > p}
    prefix = jnp.cumsum(ccoef, axis=-1) - ccoef           # sum_{i < p}

    key = (
        float(table.lastfull0), float(table.lastfull1),
        tuple(float(x) for x in table.lastp0),
        tuple(float(x) for x in table.lastp1),
    )
    lastvec = jnp.asarray(_last_cost_vec(ncoef, key))

    # sig at p itself is inferred, not coded: subtract its sig1 price
    rate_p = table.cbf1 + lastvec + prefix + (ccoef - sig1)
    cost_p = jnp.where(a > 0, lam * rate_p + suffix, jnp.inf)
    best_p = jnp.argmin(cost_p, axis=-1)
    best_cost = jnp.min(cost_p, axis=-1)
    cost_zero = lam * table.cbf0 + total_zero[:, 0]
    all_zero = cost_zero <= best_cost

    keep = (jnp.arange(ncoef)[None, :] <= best_p[:, None]) & ~all_zero[:, None]
    return jnp.where(keep, sgn * a, 0)
