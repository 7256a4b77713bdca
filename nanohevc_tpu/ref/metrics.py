"""Quality metrics oracle (parity: /root/reference/nano_hevc/metrics.py)."""

from __future__ import annotations

import numpy as np

__all__ = ["mse", "psnr", "sad", "satd_4x4", "hadamard_matrix", "residual_energy"]


def mse(original: np.ndarray, reconstructed: np.ndarray) -> float:
    """Mean squared error in float64."""
    d = original.astype(np.float64) - reconstructed.astype(np.float64)
    return float(np.mean(d * d))


def psnr(original: np.ndarray, reconstructed: np.ndarray, peak: int = 255) -> float:
    """Peak signal-to-noise ratio in dB; +inf for identical inputs."""
    err = mse(original, reconstructed)
    if err == 0:
        return float("inf")
    return float(10.0 * np.log10(peak * peak / err))


def sad(a: np.ndarray, b: np.ndarray) -> int:
    """Sum of absolute differences."""
    return int(np.abs(a.astype(np.int32) - b.astype(np.int32)).sum())


def hadamard_matrix(n: int) -> np.ndarray:
    """Sylvester-ordered {-1, +1} Hadamard matrix, n a power of two.

    The n == 4 case matches the reference's hard-coded H
    (metrics.py:35-40) up to a row permutation, which leaves the SATD
    sum unchanged; satd_4x4 uses the exact reference row order.
    """
    h = np.array([[1]], dtype=np.int32)
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    return h


# Reference row order: sequency-style [++++, ++--, +--+, +-+-].
_H4 = np.array(
    [[1, 1, 1, 1], [1, 1, -1, -1], [1, -1, -1, 1], [1, -1, 1, -1]], dtype=np.int32
)


def satd_4x4(a: np.ndarray, b: np.ndarray) -> int:
    """Sum of absolute transformed (4x4 Hadamard) differences."""
    d = (a.astype(np.int32) - b.astype(np.int32)).reshape(4, 4)
    return int(np.abs(_H4 @ d @ _H4.T).sum())


def residual_energy(residual: np.ndarray) -> int:
    """Sum of squared residuals (int64 accumulation)."""
    r = residual.astype(np.int64)
    return int((r * r).sum())
