"""Sparse device->host level transfer (ops/sparse.py).

The sequence encoder's fetch stage reads an 8-byte device header and
fetches only the occupied scan prefix of the level tensor as int16;
these tests pin the lossless round-trip contract at every density and
prefix length, the int16-overflow fallback, and the bucket rounding.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nanohevc_tpu.ops.sparse import (
    _MIN_PREFIX,
    _bucket,
    compact_levels,
    fetch_levels,
)


def _roundtrip(levels_np):
    dense = jnp.asarray(levels_np)
    sparse = jax.jit(compact_levels)(dense)
    return fetch_levels(sparse, levels_np.shape, dense=dense)


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

    @pytest.mark.parametrize("lastpos", [0, 3, 4, 5, 15, 63])
    def test_every_prefix_bucket(self, lastpos):
        # one nonzero pinned at each bucket boundary region: the fetch
        # must pick a prefix covering it and pad the tail with zeros
        lv = np.zeros((2, 6, 64), np.int32)
        lv[1, 3, lastpos] = -9
        lv[0, 0, 0] = 2
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
    def test_prefix_and_max_abs(self):
        lv = np.zeros((2, 3, 8), np.int32)
        lv[0, 0, 0] = -9
        lv[1, 2, 5] = 4
        sparse = compact_levels(jnp.asarray(lv))
        prefix, max_abs = np.asarray(sparse["header"])
        assert prefix == 6 and max_abs == 9      # last occupied pos 5

    def test_all_zero_header(self):
        sparse = compact_levels(jnp.zeros((3, 4), jnp.int32))
        prefix, max_abs = np.asarray(sparse["header"])
        assert prefix == 0 and max_abs == 0


class TestOverflowFallback:
    def test_overflow_uses_dense(self):
        lv = np.zeros((1, 2, 16), np.int32)
        lv[0, 0, 0] = 40000          # outside int16
        sparse = compact_levels(jnp.asarray(lv))
        out = fetch_levels(sparse, lv.shape, dense=jnp.asarray(lv))
        assert np.array_equal(out, lv)

    def test_missing_dense_raises(self):
        lv = np.zeros((1, 1, 4), np.int32)
        sparse = compact_levels(jnp.asarray(lv))
        with pytest.raises(ValueError, match="dense"):
            fetch_levels(sparse, lv.shape)


class TestBuckets:
    def test_bucket_rounding(self):
        assert _bucket(1, 1024) == _MIN_PREFIX
        assert _bucket(_MIN_PREFIX, 1024) == _MIN_PREFIX
        assert _bucket(_MIN_PREFIX + 1, 1024) == 2 * _MIN_PREFIX
        assert _bucket(10**9, 64) == 64       # capped at ncoef

    def test_full_prefix_is_dense(self):
        rng = np.random.default_rng(3)
        lv = rng.integers(1, 5, (2, 20, 16)).astype(np.int32)
        assert np.array_equal(_roundtrip(lv), lv)
