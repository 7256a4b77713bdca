"""Coefficient scan packing for the host entropy stage (spec 6.5.3).

The reference declares scan.py but never implements it
(/root/reference/README.md:19, docs roadmap); BASELINE.json config 5
requires a zig-zag scan-packing stage feeding host-side entropy
coding.  Implemented as a static permutation gather over the flattened
block tensor — free on TPU (fuses into whatever produced the levels).
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from nanohevc_tpu.tables import (
    diag_scan_order,
    horizontal_scan_order,
    vertical_scan_order,
)

_ORDERS = {
    "diag": diag_scan_order,
    "horizontal": horizontal_scan_order,
    "vertical": vertical_scan_order,
}


@lru_cache(maxsize=None)
def _order_and_inverse(n: int, kind: str) -> tuple[np.ndarray, np.ndarray]:
    order = _ORDERS[kind](n)
    inverse = np.argsort(order).astype(np.int32)
    return order, inverse


def scan_pack(levels: jnp.ndarray, kind: str = "diag") -> jnp.ndarray:
    """(nb, N, N) -> (nb, N*N) in scan order (position 0 = DC)."""
    nb, n, _ = levels.shape
    order, _ = _order_and_inverse(n, kind)
    return levels.reshape(nb, n * n)[:, jnp.asarray(order)]


def scan_unpack(packed: jnp.ndarray, kind: str = "diag") -> jnp.ndarray:
    """(nb, N*N) scan-ordered -> (nb, N, N) raster blocks."""
    nb, sq = packed.shape
    n = int(round(sq ** 0.5))
    _, inverse = _order_and_inverse(n, kind)
    return packed[:, jnp.asarray(inverse)].reshape(nb, n, n)
