"""Quantization contract tests (HEVC spec 8.6.3, Table 8-10)."""

import numpy as np
import pytest

from nanohevc_tpu import dequantize, dequantize_block, quantize, quantize_block
from nanohevc_tpu.ref.quant import count_nonzero, get_qp_params, is_all_zero


class TestQPParams:
    @pytest.mark.parametrize("qp,per,rem", [(0, 0, 0), (5, 0, 5), (6, 1, 0), (11, 1, 5), (51, 8, 3)])
    def test_split(self, qp, per, rem):
        assert get_qp_params(qp) == (per, rem)

    def test_clamped(self):
        assert get_qp_params(-5) == (0, 0)
        assert get_qp_params(100) == (8, 3)


class TestQuantize:
    def test_zeros(self):
        out = quantize(np.zeros((4, 4), np.int32), qp=20, size=4)
        assert out.shape == (4, 4)
        assert np.all(out == 0)

    def test_dead_zone_kills_small_values(self):
        assert np.all(quantize(np.full((4, 4), 5, np.int32), qp=40, size=4) == 0)

    def test_sign_preserved(self):
        c = np.array(
            [[100, -100, 50, -50], [-200, 200, -25, 25],
             [75, -75, 150, -150], [-10, 10, 5, -5]],
            dtype=np.int32,
        )
        level = quantize(c, qp=20, size=4)
        nz = level != 0
        assert np.all(np.sign(level[nz]) == np.sign(c[nz]))

    def test_higher_qp_more_zeros(self):
        rng = np.random.default_rng(1)
        c = rng.integers(-100, 100, (4, 4)).astype(np.int32)
        c[0, 0] = 500
        assert count_nonzero(quantize(c, 40, 4)) <= count_nonzero(quantize(c, 10, 4))

    def test_plus_six_qp_halves_magnitude(self):
        c = np.full((4, 4), 256, np.int32)
        lo, hi = quantize(c, 10, 4), quantize(c, 16, 4)
        assert count_nonzero(hi) <= count_nonzero(lo)
        assert abs(hi[0, 0]) * 2 <= abs(lo[0, 0]) + 1

    def test_intra_dead_zone_smaller_than_inter(self):
        c = np.full((4, 4), 50, np.int32)
        intra = quantize(c, 30, 4, is_intra=True)
        inter = quantize(c, 30, 4, is_intra=False)
        assert count_nonzero(intra) >= count_nonzero(inter)

    @pytest.mark.parametrize("size", [8, 16, 32])
    def test_sizes(self, size):
        rng = np.random.default_rng(2)
        c = rng.integers(-200, 200, (size, size)).astype(np.int32)
        level = quantize(c, qp=20, size=size)
        assert level.shape == (size, size) and level.dtype == np.int32


class TestDequantize:
    def test_zeros(self):
        assert np.all(dequantize(np.zeros((4, 4), np.int32), 20, 4) == 0)

    def test_nonzero_survive(self):
        level = np.diag([10, 5, 3, 1]).astype(np.int32)
        coeff = dequantize(level, 20, 4)
        assert np.all(np.diag(coeff) != 0)

    @pytest.mark.parametrize("qp", [0, 10, 23, 24, 30, 51])
    def test_both_shift_branches(self, qp):
        """qp//6 < 4 uses a rounded right shift; >= 4 a left shift."""
        level = np.array([[7, -7], [1, -1]], np.int32)
        out = dequantize(level, qp, 4)
        assert out.dtype == np.int32
        assert np.all(np.sign(out) == np.sign(level))


class TestRoundTrip:
    def test_structure_preserved(self):
        c = np.array(
            [[500, 100, 50, 20], [100, 80, 30, 10], [50, 30, 20, 5], [20, 10, 5, 2]],
            dtype=np.int32,
        )
        back = dequantize(quantize(c, 20, 4), 20, 4)
        assert abs(back[0, 0] - c[0, 0]) < c[0, 0] * 0.5

    def test_low_qp_accurate(self):
        c = np.array(
            [[200, 100, 50, 25], [100, 80, 40, 20], [50, 40, 30, 15], [25, 20, 15, 10]],
            dtype=np.int32,
        )
        back = dequantize(quantize(c, 5, 4), 5, 4)
        assert np.mean(np.abs(back - c)) < 50

    def test_high_qp_sign_survives(self):
        c = np.full((4, 4), 100, np.int32)
        back = dequantize(quantize(c, 45, 4), 45, 4)
        if back[0, 0] != 0:
            assert np.sign(back[0, 0]) == 1


class TestWrappers:
    def test_quantize_block_infers_size(self):
        rng = np.random.default_rng(3)
        c = rng.integers(-100, 100, (8, 8)).astype(np.int32)
        assert np.array_equal(quantize_block(c, 20), quantize(c, 20, 8))

    def test_dequantize_block_infers_size(self):
        rng = np.random.default_rng(4)
        l = rng.integers(-10, 10, (8, 8)).astype(np.int32)
        assert np.array_equal(dequantize_block(l, 20), dequantize(l, 20, 8))


class TestUtilities:
    def test_count_nonzero(self):
        level = np.diag([10, 5, 0, 1]).astype(np.int32)
        assert count_nonzero(level) == 3

    def test_is_all_zero(self):
        assert is_all_zero(np.zeros((4, 4), np.int32))
        assert not is_all_zero(np.array([[1, 0], [0, 0]], np.int32))


class TestPipeline:
    def test_full_block_pipeline(self):
        from nanohevc_tpu import (
            forward_transform_4x4,
            intra_dc_predict,
            inverse_transform_4x4,
            reconstruct_block,
            residual_block,
        )

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
        coeff = forward_transform_4x4(res)
        level = quantize(coeff, qp=20, size=4)
        rec_res = inverse_transform_4x4(dequantize(level, qp=20, size=4))
        recon = reconstruct_block(pred, rec_res.astype(np.int16))
        assert np.max(np.abs(recon - orig)) < 20


class TestDequantRescale:
    """Spec-correct size rescale (config flag; default preserves parity)."""

    @pytest.mark.parametrize("size,gain", [(4, 1), (8, 2), (16, 4), (32, 8)])
    def test_rescale_gain_vs_parity(self, size, gain):
        """rescale multiplies the parity dequant by 2^(log2 N - 2)."""
        level = np.full((size, size), 64, np.int32)
        for qp in (0, 10, 25, 40, 51):
            parity = dequantize(level, qp, size)
            resc = dequantize(level, qp, size, rescale=True)
            # use a level large enough that shift rounding is negligible
            ratio = resc.astype(np.int64).sum() / max(1, parity.astype(np.int64).sum())
            assert abs(ratio - gain) <= 0.02, (qp, ratio)

    @pytest.mark.parametrize("size", [8, 16, 32])
    def test_rescale_round_trip_unbiased(self, size):
        """quantize -> rescaled dequantize approximates identity (the
        parity chain attenuates by 2^(log2 N - 2) instead)."""
        rng = np.random.default_rng(size)
        c = rng.integers(-2000, 2000, (size, size)).astype(np.int32)
        qp = 10
        back = dequantize(quantize(c, qp, size), qp, size, rescale=True)
        # coeff-domain quant step ~ 2^((qp-4)/6) * N/4 (the forward
        # shift carries log2 N, so the step doubles per size octave)
        step = 2 ** ((qp - 4) / 6) * size * 0.8
        assert np.abs(back - c).max() <= step, np.abs(back - c).max()
        # and the PARITY chain attenuates: round trip lands near c / gain
        par = dequantize(quantize(c, qp, size), qp, size)
        gain = size // 4
        assert np.abs(par - c // gain).max() <= step, "parity attenuation"

    def test_rescale_identical_at_4x4(self):
        rng = np.random.default_rng(4)
        lv = rng.integers(-500, 500, (4, 4)).astype(np.int32)
        for qp in range(0, 52, 7):
            assert np.array_equal(
                dequantize(lv, qp, 4), dequantize(lv, qp, 4, rescale=True)
            )

    def test_ops_matches_oracle_with_rescale(self):
        import jax.numpy as jnp
        from nanohevc_tpu import ops

        rng = np.random.default_rng(7)
        for n in (4, 8, 16, 32):
            lv = rng.integers(-1000, 1000, (3, n, n)).astype(np.int32)
            for qp in (0, 13, 29, 47):
                want = np.stack([dequantize(b, qp, n, rescale=True) for b in lv])
                got = np.asarray(ops.dequantize(jnp.asarray(lv), qp, n, rescale=True))
                assert np.array_equal(got, want), (n, qp)

    def test_encode_psnr_improves_with_rescale(self):
        """The config flag improves recon quality at N > 4 (the parity
        chain feeds back attenuated residuals)."""
        import jax.numpy as jnp
        from nanohevc_tpu import ops
        from nanohevc_tpu.models.all_intra import encode_plane_full

        rng = np.random.default_rng(0)
        yy, xx = np.mgrid[0:32, 0:64]
        img = (yy * 1.5 + xx * 0.7 + 30 * np.sin(xx / 7)
               + rng.normal(0, 10, (32, 64))).clip(0, 255)
        plane = jnp.asarray(img.astype(np.int32))
        base = encode_plane_full(plane, jnp.int32(12), n=8)
        resc = encode_plane_full(plane, jnp.int32(12), n=8, dequant_rescale=True)
        p0 = float(ops.psnr(plane, base["recon"]))
        p1 = float(ops.psnr(plane, resc["recon"]))
        assert p1 > p0 + 0.5, (p0, p1)
