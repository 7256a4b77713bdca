"""DC intra prediction + residual/reconstruct/clip contract tests.

Golden values derive from the HEVC spec DC formula
(behavioral parity with reference tests/test_intra_dc.py).
"""

import numpy as np
import pytest

from nanohevc_tpu import (
    clip_to_pixel_range,
    intra_dc_predict,
    intra_dc_predict_4x4,
    reconstruct_block,
    residual_block,
)

ORIG_4X4 = np.array(
    [[102, 101, 100, 100],
     [103, 102, 101, 100],
     [103, 102, 100, 99],
     [104, 101, 99, 98]],
    dtype=np.int16,
)
TOP = np.array([102, 98, 100, 101], dtype=np.int16)
LEFT = np.array([103, 102, 101, 99], dtype=np.int16)
RES_4X4 = np.array(
    [[1, 0, -1, -1], [2, 1, 0, -1], [2, 1, -1, -2], [3, 0, -2, -3]],
    dtype=np.int16,
)


class TestDC:
    def test_spec_example(self):
        # DC = floor((401 + 405 + 4) / 8) = 101
        pred = intra_dc_predict_4x4(TOP, LEFT)
        assert pred.shape == (4, 4) and pred.dtype == np.int16
        assert np.all(pred == 101)

    @pytest.mark.parametrize(
        "top,left,expected",
        [
            (np.full(4, 100, np.int16), np.full(4, 100, np.int16), 100),
            (np.ones(4, np.int16), np.array([1, 1, 1, 0], np.int16), 1),
            (np.zeros(4, np.int16), np.zeros(4, np.int16), 0),
        ],
    )
    def test_4x4_variants(self, top, left, expected):
        assert np.all(intra_dc_predict_4x4(top, left) == expected)

    @pytest.mark.parametrize("size,value", [(8, 100), (16, 50), (32, 77)])
    def test_uniform_sizes(self, size, value):
        pred = intra_dc_predict(
            np.full(size, value, np.int16), np.full(size, value, np.int16), size
        )
        assert pred.shape == (size, size)
        assert np.all(pred == value)


class TestResidualReconstruct:
    def test_residual_golden(self):
        res = residual_block(ORIG_4X4, np.full((4, 4), 101, np.int16))
        assert res.dtype == np.int16
        assert np.array_equal(res, RES_4X4)

    def test_perfect_prediction_zero_residual(self):
        blk = np.full((2, 2), 100, np.int16)
        assert np.all(residual_block(blk, blk) == 0)

    def test_reconstruct_roundtrip(self):
        pred = np.full((4, 4), 101, np.int16)
        assert np.array_equal(reconstruct_block(pred, residual_block(ORIG_4X4, pred)), ORIG_4X4)


class TestClip:
    @pytest.mark.parametrize(
        "bit_depth,vals,expected",
        [
            (8, [-10, 0, 128, 255, 300], [0, 0, 128, 255, 255]),
            (10, [-10, 0, 512, 1023, 2000], [0, 0, 512, 1023, 1023]),
        ],
    )
    def test_clip(self, bit_depth, vals, expected):
        out = clip_to_pixel_range(np.array([vals], np.int16), bit_depth=bit_depth)
        assert np.array_equal(out, np.array([expected], np.int16))


class TestPipeline:
    def test_dc_predict_residual_reconstruct(self):
        pred = intra_dc_predict_4x4(TOP, LEFT)
        assert np.all(pred == 101)
        res = residual_block(ORIG_4X4, pred)
        assert np.array_equal(res, RES_4X4)
        assert np.array_equal(reconstruct_block(pred, res), ORIG_4X4)
