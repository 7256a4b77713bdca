"""Sparse device->host level transfer (ops/sparse.py).

The sequence encoder's fetch stage compacts the quantized level tensor
on device and expands it on the host; these tests pin the lossless
round-trip contract at every density, the int16-overflow fallback, and
the bucket-rounding fetch shapes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nanohevc_tpu.ops.sparse import (
    _MIN_BUCKET,
    _bucket,
    compact_levels,
    expand_levels,
    fetch_levels,
)


def _roundtrip(levels_np):
    sparse = jax.jit(compact_levels)(jnp.asarray(levels_np))
    return fetch_levels(sparse, levels_np.shape, dense=jnp.asarray(levels_np))


class TestRoundTrip:
    @pytest.mark.parametrize("density", [0.0, 0.01, 0.3, 1.0])
    def test_lossless_at_any_density(self, density):
        rng = np.random.default_rng(42)
        lv = rng.integers(-800, 800, (3, 50, 16)).astype(np.int32)
        lv[rng.random(lv.shape) >= density] = 0
        assert np.array_equal(_roundtrip(lv), lv)

    def test_all_zero(self):
        lv = np.zeros((2, 10, 16), np.int32)
        out = _roundtrip(lv)
        assert out.shape == lv.shape and not out.any()

    def test_single_nonzero_at_each_end(self):
        lv = np.zeros((1, 4, 16), np.int32)
        lv.flat[0] = -5
        lv.flat[-1] = 7
        assert np.array_equal(_roundtrip(lv), lv)

    def test_int16_extremes_survive(self):
        lv = np.zeros((1, 2, 16), np.int32)
        lv[0, 0, 0] = 32767
        lv[0, 1, 3] = -32767
        assert np.array_equal(_roundtrip(lv), lv)

    def test_2d_shape(self):
        rng = np.random.default_rng(0)
        lv = (rng.integers(0, 9, (40, 64)) *
              (rng.random((40, 64)) < 0.1)).astype(np.int32)
        assert np.array_equal(_roundtrip(lv), lv)


class TestHeader:
    def test_nnz_and_max_abs(self):
        lv = np.zeros((2, 3, 4), np.int32)
        lv[0, 0, 0] = -9
        lv[1, 2, 3] = 4
        sparse = compact_levels(jnp.asarray(lv))
        nnz, max_abs = np.asarray(sparse["header"])
        assert nnz == 2 and max_abs == 9

    def test_values_keep_original_order(self):
        lv = np.array([[0, 3, 0, -1, 2, 0]], np.int32)
        sparse = compact_levels(jnp.asarray(lv))
        nnz = int(np.asarray(sparse["header"])[0])
        assert list(np.asarray(sparse["vals"][:nnz])) == [3, -1, 2]
        assert list(np.asarray(sparse["locs"][:nnz])) == [1, 3, 4]


class TestOverflowFallback:
    def test_overflow_uses_dense(self):
        lv = np.zeros((1, 2, 16), np.int32)
        lv[0, 0, 0] = 40000          # outside int16
        sparse = compact_levels(jnp.asarray(lv))
        out = fetch_levels(sparse, lv.shape, dense=jnp.asarray(lv))
        assert np.array_equal(out, lv)

    def test_overflow_without_dense_raises(self):
        lv = np.zeros((1, 1, 4), np.int32)
        lv[0, 0, 0] = -40000
        sparse = compact_levels(jnp.asarray(lv))
        with pytest.raises(ValueError, match="int16"):
            fetch_levels(sparse, lv.shape)


class TestBuckets:
    def test_bucket_rounding(self):
        assert _bucket(1, 10**9) == _MIN_BUCKET
        assert _bucket(_MIN_BUCKET, 10**9) == _MIN_BUCKET
        assert _bucket(_MIN_BUCKET + 1, 10**9) == 2 * _MIN_BUCKET
        assert _bucket(10**9, 5000) == 5000   # capped at tensor size

    def test_dense_beyond_min_bucket(self):
        rng = np.random.default_rng(3)
        lv = rng.integers(1, 5, (2, 200, 16)).astype(np.int32)  # nnz=6400
        assert np.array_equal(_roundtrip(lv), lv)


class TestExpand:
    def test_expand_direct(self):
        vals = np.array([5, -2], np.int16)
        locs = np.array([1, 6], np.int32)
        out = expand_levels(vals, locs, 2, (2, 4))
        want = np.array([[0, 5, 0, 0], [0, 0, -2, 0]], np.int32)
        assert np.array_equal(out, want)
