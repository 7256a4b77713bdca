"""Planar intra prediction contract tests (HEVC spec 8.4.4.2.4)."""

import numpy as np
import pytest

from nanohevc_tpu import intra_planar_predict, reconstruct_block, residual_block


class TestPlanar:
    @pytest.mark.parametrize("size,value", [(4, 100), (8, 128), (16, 200), (32, 50)])
    def test_uniform(self, size, value):
        top = np.full(size, value, np.int16)
        left = np.full(size, value, np.int16)
        pred = intra_planar_predict(top, left, value, value, size)
        assert pred.shape == (size, size) and pred.dtype == np.int16
        assert np.all(pred == value)

    def test_corner_golden(self):
        # top=left=0, top_right=bottom_left=255:
        # pred[0,0] = ((3*0+255) + (3*0+255) + 4) >> 3 = 64
        # pred[3,3] = ((4*255) + (4*255) + 4) >> 3 = 255
        pred = intra_planar_predict(np.zeros(4, np.int16), np.zeros(4, np.int16), 255, 255, 4)
        assert pred[0, 0] == 64
        assert pred[3, 3] == 255

    def test_horizontal_gradient_monotone(self):
        pred = intra_planar_predict(np.zeros(4, np.int16), np.zeros(4, np.int16), 255, 0, 4)
        for y in range(4):
            assert np.all(np.diff(pred[y, :]) > 0)

    def test_vertical_gradient_monotone(self):
        pred = intra_planar_predict(np.zeros(4, np.int16), np.zeros(4, np.int16), 0, 255, 4)
        for x in range(4):
            assert np.all(np.diff(pred[:, x]) > 0)

    def test_pipeline_roundtrip(self):
        orig = np.array(
            [[102, 101, 100, 100], [103, 102, 101, 100],
             [103, 102, 100, 99], [104, 101, 99, 98]],
            dtype=np.int16,
        )
        pred = intra_planar_predict(
            np.full(4, 100, np.int16), np.full(4, 100, np.int16), 100, 100, 4
        )
        assert np.all(pred == 100)
        assert np.array_equal(reconstruct_block(pred, residual_block(orig, pred)), orig)
