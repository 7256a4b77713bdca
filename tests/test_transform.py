"""Integer transform contract tests (HEVC spec 8.6, Tables 8-8/8-9)."""

import numpy as np
import pytest

from nanohevc_tpu import (
    DCT4,
    DCT8,
    DCT16,
    DCT32,
    DST4,
    forward_transform,
    forward_transform_4x4,
    forward_transform_8x8,
    inverse_transform,
    inverse_transform_4x4,
    inverse_transform_8x8,
)


class TestMatrices:
    def test_spec_spot_values(self):
        """Generated matrices must reproduce the spec tables exactly."""
        assert list(DCT4[0]) == [64, 64, 64, 64]
        assert list(DCT4[1]) == [83, 36, -36, -83]
        assert list(DCT8[3]) == [75, -18, -89, -50, 50, 89, 18, -75]
        assert list(DCT16[1][:4]) == [90, 87, 80, 70]
        assert list(DCT32[1][:8]) == [90, 90, 88, 85, 82, 78, 73, 67]
        assert DCT32[31][0] == 4 and DCT32[31][31] == -4
        assert list(DST4[0]) == [29, 55, 74, 84]
        assert list(DST4[2]) == [84, -29, -74, 55]

    @pytest.mark.parametrize("mat", [DCT4, DCT8, DCT16, DCT32, DST4])
    def test_near_orthogonality(self, mat):
        g = mat.astype(np.int64) @ mat.astype(np.int64).T
        diag = np.diag(g)
        assert np.all(diag > 0)
        off = g - np.diag(diag)
        assert np.max(np.abs(off)) < np.max(diag) * 0.1


class TestForward:
    @pytest.mark.parametrize("size,use_dst", [(4, False), (4, True), (8, False)])
    def test_zeros_map_to_zeros(self, size, use_dst):
        out = forward_transform(np.zeros((size, size), np.int16), use_dst=use_dst)
        assert out.shape == (size, size)
        assert np.all(out == 0)

    def test_dc_concentration(self):
        coeff = forward_transform_4x4(np.full((4, 4), 16, np.int16))
        ac = coeff.copy()
        ac[0, 0] = 0
        assert coeff[0, 0] != 0
        assert np.max(np.abs(ac)) <= abs(coeff[0, 0]) * 0.05

    def test_matches_matrix_expression(self):
        """Guard against shift/scaling regressions via explicit formula."""
        x = np.array(
            [[1, 2, 3, 4], [5, 6, 7, 8], [9, 0, -1, -2], [4, 3, 2, 1]], np.int16
        )
        t = DCT4.astype(np.int64)
        shift, rnd = 7, 64
        want = (((((t @ x.astype(np.int64)) + rnd) >> shift) @ t.T) + rnd) >> shift
        assert np.array_equal(forward_transform_4x4(x), want)

    def test_dst_differs_from_dct(self):
        x = np.add.outer(np.arange(4), np.arange(1, 5)).astype(np.int16)
        assert not np.array_equal(
            forward_transform_4x4(x, use_dst=False), forward_transform_4x4(x, use_dst=True)
        )

    def test_unsupported_size_raises(self):
        with pytest.raises(ValueError):
            forward_transform(np.zeros((5, 5), np.int16))


class TestInverse:
    @pytest.mark.parametrize("size", [4, 8])
    def test_zeros(self, size):
        out = inverse_transform(np.zeros((size, size), np.int32))
        assert out.shape == (size, size)
        assert np.all(out == 0)


class TestRoundTrip:
    @pytest.mark.parametrize("use_dst", [False, True])
    def test_4x4(self, use_dst):
        x = np.array(
            [[5, 3, -2, 1], [2, 4, 1, -3], [-1, 2, 3, 2], [0, -1, 2, 4]], np.int16
        )
        back = inverse_transform_4x4(forward_transform_4x4(x, use_dst), use_dst)
        assert np.max(np.abs(back - x)) <= 2

    @pytest.mark.parametrize(
        "size,amp,mean_bound,max_bound",
        [(8, 50, 25, 50), (16, 50, 30, 60), (32, 30, 20, 40)],
    )
    def test_larger_sizes(self, size, amp, mean_bound, max_bound):
        rng = np.random.default_rng(42)
        x = rng.integers(-amp, amp, (size, size)).astype(np.int16)
        err = np.abs(inverse_transform(forward_transform(x)) - x)
        assert np.mean(err) < mean_bound
        assert np.max(err) <= max_bound


class TestEnergyCompaction:
    def test_4x4_smooth_gradient(self):
        x = np.add.outer(np.arange(10, 14), np.arange(4)).astype(np.int16)
        c = forward_transform_4x4(x).astype(np.int64)
        assert np.sum(c[:2, :2] ** 2) > np.sum(c[2:, 2:] ** 2)

    def test_8x8_smooth_gradient(self):
        x = np.add.outer(np.arange(8), np.arange(8)).astype(np.int16)
        c = forward_transform_8x8(x).astype(np.int64)
        assert np.sum(c[:4, :4] ** 2) > 0.9 * np.sum(c ** 2)


class TestPipeline:
    def test_predict_transform_roundtrip(self):
        from nanohevc_tpu import intra_dc_predict, reconstruct_block, residual_block

        orig = np.array(
            [[102, 101, 100, 100], [103, 102, 101, 100],
             [103, 102, 100, 99], [104, 101, 99, 98]],
            dtype=np.int16,
        )
        pred = intra_dc_predict(
            np.array([102, 98, 100, 101], np.int16),
            np.array([103, 102, 101, 99], np.int16),
            4,
        )
        res = residual_block(orig, pred)
        back = inverse_transform_4x4(forward_transform_4x4(res))
        recon = reconstruct_block(pred, back.astype(np.int16))
        assert np.max(np.abs(recon - orig)) <= 2
