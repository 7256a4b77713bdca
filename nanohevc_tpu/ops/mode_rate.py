"""Device-side MPM intra-mode rate model (spec 8.4.2.2 bin counts).

The bitstream codes each block's intra mode with MPM prediction
(runtime/native/nanohevc_runtime.cpp encode_modes_impl): a context bin
for prev_intra_pred_flag, a 1-2 bin truncated-unary mpm_idx on hit, or
5 fixed bins of rem_intra_pred_mode on miss.  The static bin counts —
2 bits for MPM index 0, 3 for indexes 1/2, 6 for a miss — are the
classic HEVC RDO mode-rate approximation (the shipped coder's adaptive
contexts only ever price coherent fields *below* these counts, so the
approximation is a safe upper bound for the decision).

This module computes those counts fully batched on device so the RD
mode decision (models/all_intra.py decide_modes, decision="rd") can
charge each candidate mode its true signalling cost: a (nb, 35) bits
tensor from the left/above neighbor modes, derived with the identical
candModeList algebra as the C++ coder (mirrored in tests against a
host oracle and against encode_modes actuals).

The reference has no mode syntax at all (its roadmap names cabac.py,
reference README.md:97-100); mode numbering is the spec's 0=planar,
1=DC, 2-34 angular (reference intra.py:24).
"""

from __future__ import annotations

import jax.numpy as jnp

# Unavailable neighbors read as INTRA_DC (the spec rule, mirrored at
# encode_modes_impl's `x > 0 ? ... : 1`).
_UNAVAIL = 1

MPM_HIT0_BITS = 2.0   # prev flag + mpm_idx bin0
MPM_HIT12_BITS = 3.0  # prev flag + 2 truncated-unary bins
MPM_MISS_BITS = 6.0   # prev flag + 5 fixed rem bins


def mpm_lists(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """candModeList per spec 8.4.2.2, batched.

    a (left) and b (above) neighbor modes, any shape -> (..., 3) int32.
    Same algebra as mpm_list (nanohevc_runtime.cpp:401-415).
    """
    a = jnp.asarray(a, jnp.int32)
    b = jnp.asarray(b, jnp.int32)
    # a == b branch
    eq_nonang = jnp.stack(
        [jnp.zeros_like(a), jnp.ones_like(a), jnp.full_like(a, 26)], -1
    )
    eq_ang = jnp.stack(
        [a, 2 + ((a + 29) % 32), 2 + ((a - 1) % 32)], -1
    )
    eq = jnp.where((a < 2)[..., None], eq_nonang, eq_ang)
    # a != b branch: planar if absent, else DC, else vertical
    third = jnp.where(
        (a != 0) & (b != 0),
        jnp.zeros_like(a),
        jnp.where(a + b < 2, jnp.full_like(a, 26), jnp.ones_like(a)),
    )
    ne = jnp.stack([a, b, third], -1)
    return jnp.where((a == b)[..., None], eq, ne)


def mpm_mode_bits(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Static signalling cost of every candidate mode, per block.

    a/b: (nb,) left/above neighbor modes (use _UNAVAIL=1 where the
    neighbor is outside the plane).  Returns (nb, 35) float32 bits.
    """
    m = mpm_lists(a, b)                                   # (nb, 3)
    cand = jnp.arange(35, dtype=jnp.int32)[None, :]       # (1, 35)
    hit0 = cand == m[:, 0:1]
    hit1 = cand == m[:, 1:2]
    hit2 = cand == m[:, 2:3]
    return jnp.where(
        hit0,
        MPM_HIT0_BITS,
        jnp.where(hit1 | hit2, MPM_HIT12_BITS, MPM_MISS_BITS),
    ).astype(jnp.float32)


def neighbor_modes_grid(modes_grid: jnp.ndarray):
    """Left/above neighbor mode planes for a raster (nby, nbx) grid.

    Returns (a, b) each (nby, nbx): a = mode of the block to the left
    (col 0 -> DC), b = the block above (row 0 -> DC) — the coding-order
    neighbors the mode coder conditions on.
    """
    g = jnp.asarray(modes_grid, jnp.int32)
    a = jnp.concatenate(
        [jnp.full_like(g[:, :1], _UNAVAIL), g[:, :-1]], axis=1
    )
    b = jnp.concatenate(
        [jnp.full_like(g[:1, :], _UNAVAIL), g[:-1, :]], axis=0
    )
    return a, b


def mode_bits_for_grid(modes_grid: jnp.ndarray) -> jnp.ndarray:
    """(nby, nbx) decided modes -> (nby*nbx, 35) candidate bits.

    Neighbors come from the given (e.g. first-pass) decision; the
    decoder re-derives its lists from the *final* modes, so this is the
    standard one-step RDO approximation, not a decode contract.
    """
    a, b = neighbor_modes_grid(modes_grid)
    return mpm_mode_bits(a.reshape(-1), b.reshape(-1))
