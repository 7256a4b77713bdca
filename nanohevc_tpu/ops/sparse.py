"""Sparse device->host transfer of quantized level tensors.

The sequence encoder's end-to-end wall is NOT the device compute and
NOT the host entropy coder — it is the device->host fetch of the dense
`(B, nb, ncoef)` int32 level tensor (~66 MB per 8-frame 1080p batch)
through a link measured at ~35 MB/s (round-5 profiling).

Levels are scan-packed per block (DC first), so at production QPs the
occupied coefficients concentrate in a short prefix of the scan order.
The transfer scheme exploits exactly that, with zero scatters (TPU
scatter over a 16M-element axis measured 0.5 s/batch to run and 60+ s
to compile — worse than the fetch it replaced):

  device:  compact_levels()  — ONE pair of reductions producing an
           8-byte header [prefix_len, max_abs] where prefix_len is
           1 + the last scan position occupied by ANY block.
  host:    fetch_levels()    — reads the header, rounds the prefix up
           to a power-of-two bucket (so the number of distinct slice
           programs stays logarithmic), fetches `levels[..., :P]` as
           int16 (HEVC levels are bounded well inside int16: |coeff|
           <= 2^15, MF <= 26214, shift >= 17 gives |level| <~ 6554;
           the header's max-abs field guards the cast anyway), and
           zero-pads back to the dense ndarray.

Lossless by construction at every QP: every nonzero lives inside the
fetched prefix by the definition of prefix_len, and if the header
reports values outside int16 (cannot happen for spec-bounded inputs,
but the contract is checked, not assumed) the fetch falls back to the
dense int32 transfer.

No reference counterpart: the reference is single-process numpy with
no device boundary (SURVEY §2 "no native code anywhere").
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["compact_levels", "fetch_levels"]

# Smallest fetch prefix (scan positions).  DC-dominated content fetches
# 4 int16 per block; each doubling is one more compiled slice program.
_MIN_PREFIX = 4


def compact_levels(levels: jnp.ndarray):
    """Device-side header for the prefix fetch.

    `levels` is (..., ncoef) with the last axis scan-packed (DC first).
    Returns {"header": (2,) int32 [prefix_len, max_abs]}: prefix_len is
    1 + the highest scan position any block occupies (0 when the tensor
    is all zero), so `levels[..., :prefix_len]` contains every nonzero.
    Two reductions, static shapes, compiles in seconds — runs inside or
    next to the encoder jit.
    """
    ncoef = levels.shape[-1]
    flat = levels.reshape(-1, ncoef)
    occupied = jnp.any(flat != 0, axis=0)                      # (ncoef,)
    last = jnp.max(
        jnp.where(occupied, jnp.arange(ncoef, dtype=jnp.int32), -1)
    )
    max_abs = jnp.max(jnp.abs(flat))
    return {"header": jnp.stack([last + 1, max_abs]).astype(jnp.int32)}


def _bucket(need: int, ncoef: int) -> int:
    b = _MIN_PREFIX
    while b < need:
        b *= 2
    return min(b, ncoef)


@functools.lru_cache(maxsize=None)
def _prefix_fn(p: int):
    """Compiled `levels[..., :p] -> int16` slice (one program per p)."""
    return jax.jit(lambda lv: lv[..., :p].astype(jnp.int16))


def fetch_levels(sparse: dict, shape, dense=None) -> np.ndarray:
    """Fetch a level tensor to a dense host ndarray via its prefix.

    `sparse` is compact_levels' output (device header); `dense` is the
    dense device tensor the prefix is sliced from (required).
    Transfers 8 bytes of header + 2 bytes x prefix x blocks instead of
    4 bytes per coefficient; the (spec-impossible) int16 overflow falls
    back to the full int32 transfer.
    """
    if dense is None:
        raise ValueError(
            "fetch_levels requires the dense device tensor to slice "
            "the occupied prefix from"
        )
    header = np.asarray(sparse["header"])
    need, max_abs = int(header[0]), int(header[1])
    if max_abs > np.iinfo(np.int16).max:
        return np.asarray(dense, np.int32).reshape(shape)
    if need <= 0:
        return np.zeros(shape, np.int32)
    ncoef = int(shape[-1])
    p = _bucket(need, ncoef)
    pre = np.asarray(_prefix_fn(p)(dense), dtype=np.int16)
    if p >= ncoef:
        return pre.astype(np.int32).reshape(shape)
    out = np.zeros(shape, np.int32)
    out.reshape(-1, ncoef)[:, :p] = pre.reshape(-1, p)
    return out
