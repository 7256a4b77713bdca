"""Angular intra prediction contract tests (HEVC spec 8.4.4.2.6).

Golden walkthroughs (mode 26/10 copy, mode 34/2 diagonal, mode 18
negative-angle matrix) derive from the spec projection formula.
"""

import numpy as np
import pytest

from nanohevc_tpu import INTRA_PRED_ANGLE, intra_angular_predict
from nanohevc_tpu import reconstruct_block, residual_block


class TestAngleTable:
    def test_spec_values(self):
        assert len(INTRA_PRED_ANGLE) == 33
        assert INTRA_PRED_ANGLE[10 - 2] == 0      # pure horizontal
        assert INTRA_PRED_ANGLE[26 - 2] == 0      # pure vertical
        assert INTRA_PRED_ANGLE[2 - 2] == 32      # 45 deg
        assert INTRA_PRED_ANGLE[34 - 2] == 32     # 45 deg
        assert INTRA_PRED_ANGLE[18 - 2] == -32    # diagonal


class TestPureCopyModes:
    @pytest.mark.parametrize("size", [4, 8])
    def test_mode_26_copies_top(self, size):
        top = np.array([99, 100, 110, 120, 130] + [0] * (2 * size - 4), np.int16)
        left = np.array([99, 50, 50, 50, 50] + [0] * (2 * size - 4), np.int16)
        pred = intra_angular_predict(top, left, 99, mode=26, size=size)
        assert pred.shape == (size, size)
        for col, want in enumerate([100, 110, 120, 130]):
            assert np.all(pred[:, col] == want)

    def test_mode_10_copies_left(self):
        top = np.array([99, 50, 50, 50, 50, 0, 0, 0, 0], np.int16)
        left = np.array([99, 100, 110, 120, 130, 0, 0, 0, 0], np.int16)
        pred = intra_angular_predict(top, left, 99, mode=10, size=4)
        for row, want in enumerate([100, 110, 120, 130]):
            assert np.all(pred[row, :] == want)


class TestDiagonalModes:
    def test_mode_34_shifts_top(self):
        # ref index at (x, y) = x + 1 + (y + 1) for angle 32
        top = np.arange(0, 90, 10, dtype=np.int16)  # [0,10,...,80]
        left = np.zeros(9, np.int16)
        pred = intra_angular_predict(top, left, 0, mode=34, size=4)
        assert pred[0, 0] == 20 and pred[0, 3] == 50
        assert pred[1, 0] == 30 and pred[3, 3] == 80

    def test_mode_2_shifts_left(self):
        top = np.zeros(9, np.int16)
        left = np.arange(0, 90, 10, dtype=np.int16)
        pred = intra_angular_predict(top, left, 0, mode=2, size=4)
        assert pred[0, 0] == 20 and pred[3, 0] == 50
        assert pred[0, 1] == 30 and pred[3, 3] == 80

    def test_mode_18_negative_extension(self):
        # angle -32 walks back into the left reference via INV_ANGLE
        top = np.arange(0, 90, 10, dtype=np.int16)
        left = np.array([0] + [5] * 8, np.int16)
        pred = intra_angular_predict(top, left, 0, mode=18, size=4)
        expected = np.array(
            [[0, 10, 20, 30], [0, 0, 10, 20], [5, 0, 0, 10], [5, 5, 0, 0]],
            dtype=np.int16,
        )
        assert np.array_equal(pred, expected)


class TestInterpolation:
    def test_uniform_reference_stays_uniform_all_modes(self):
        for size in (4, 8, 16):
            top = np.full(2 * size + 1, 128, np.int16)
            left = np.full(2 * size + 1, 128, np.int16)
            for mode in range(2, 35):
                pred = intra_angular_predict(top, left, 128, mode=mode, size=size)
                assert pred.shape == (size, size) and pred.dtype == np.int16
                assert np.all(pred == 128), f"mode {mode} size {size}"

    def test_mode_26_gradient_exact_copy(self):
        top = np.array([0, 0, 32, 64, 96, 128, 160, 192, 224], np.int16)
        pred = intra_angular_predict(top, np.zeros(9, np.int16), 0, mode=26, size=4)
        assert list(pred[0]) == [0, 32, 64, 96]


class TestPipeline:
    def test_angular_predict_residual_reconstruct(self):
        orig = np.array(
            [[102, 101, 100, 100], [103, 102, 101, 100],
             [103, 102, 100, 99], [104, 101, 99, 98]],
            dtype=np.int16,
        )
        refs = np.full(9, 100, np.int16)
        pred = intra_angular_predict(refs, refs, 100, mode=26, size=4)
        assert np.all(pred == 100)
        assert np.array_equal(reconstruct_block(pred, residual_block(orig, pred)), orig)
