"""Jittable quality metrics (parity: /root/reference/nano_hevc/metrics.py).

Per-block variants operate over the (nb, N, N) block tensor and return
(nb,) vectors; frame-level mse/psnr reduce in float32 (TPU has no
float64 — PSNR is a float metric, the <1e-4 dB difference vs the
float64 oracle is irrelevant and covered by test tolerances).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from nanohevc_tpu.ref.metrics import hadamard_matrix


def mse(original: jnp.ndarray, reconstructed: jnp.ndarray) -> jnp.ndarray:
    d = original.astype(jnp.float32) - reconstructed.astype(jnp.float32)
    return jnp.mean(d * d)


def psnr(original: jnp.ndarray, reconstructed: jnp.ndarray, peak: int = 255) -> jnp.ndarray:
    err = mse(original, reconstructed)
    return jnp.where(
        err == 0, jnp.inf, 10.0 * jnp.log10((peak * peak) / err)
    )


def sad_blocks(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Sum of absolute differences per block: (nb, N, N) x2 -> (nb,)."""
    d = a.astype(jnp.int32) - b.astype(jnp.int32)
    return jnp.abs(d).sum(axis=(-2, -1))


def satd_blocks(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hadamard-transformed SAD per block: (nb, N, N) x2 -> (nb,).

    Uses the Sylvester Hadamard basis; SATD is invariant to the row
    order difference vs the reference's sequency-ordered 4x4 H
    (metrics.py:35-42) because row/column permutations only permute
    the summed absolute values.  Generalizes beyond 4x4 to all block
    sizes (the reference supports 4x4 only).
    """
    n = a.shape[-1]
    h = jnp.asarray(hadamard_matrix(n), dtype=jnp.int32)
    d = a.astype(jnp.int32) - b.astype(jnp.int32)
    t = jnp.einsum("ik,bkj->bij", h, d, preferred_element_type=jnp.int32)
    t = jnp.einsum("bik,jk->bij", t, h, preferred_element_type=jnp.int32)
    return jnp.abs(t).sum(axis=(-2, -1))


def residual_energy_blocks(residual: jnp.ndarray) -> jnp.ndarray:
    """Sum of squared residuals per block: (nb, N, N) -> (nb,) int32.

    Exact for 8/10-bit video (32*32*1023^2 < 2^31).
    """
    r = residual.astype(jnp.int32)
    return (r * r).sum(axis=(-2, -1))
