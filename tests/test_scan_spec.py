"""Spec 6.5.3 scan orders and the 7.4.9.11 mode-dependent scan rule.

Golden vectors are hand-derived from the spec's two-level construction
(4x4 coefficient groups traversed in the scan order, positions inside
each group in the same order) — the reference declares scan.py but
never implements it (/root/reference/README.md:98).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from nanohevc_tpu.tables import (
    diag_scan_order,
    horizontal_scan_order,
    vertical_scan_order,
)
from nanohevc_tpu.ops.scan import mode_scan_idx, scan_pack, scan_unpack


class TestGroupScanGolden:
    def test_horizontal_8x8_hand_derived(self):
        # groups row-major: G(0,0) G(0,1) G(1,0) G(1,1); within: raster
        want = [
            (gy * 4 + sy) * 8 + (gx * 4 + sx)
            for gy, gx in [(0, 0), (0, 1), (1, 0), (1, 1)]
            for sy in range(4)
            for sx in range(4)
        ]
        assert horizontal_scan_order(8).tolist() == want

    def test_vertical_8x8_hand_derived(self):
        # groups column-major; within each group column-major
        want = [
            (gy * 4 + sy) * 8 + (gx * 4 + sx)
            for gy, gx in [(0, 0), (1, 0), (0, 1), (1, 1)]
            for sx in range(4)
            for sy in range(4)
        ]
        assert vertical_scan_order(8).tolist() == want

    def test_horizontal_16x16_first_group_then_next(self):
        order = horizontal_scan_order(16)
        # first 16 positions: the top-left 4x4 group in raster order
        want_g0 = [y * 16 + x for y in range(4) for x in range(4)]
        assert order[:16].tolist() == want_g0
        # next 16: the group to its right (groups are row-major)
        want_g1 = [y * 16 + x for y in range(4) for x in range(4, 8)]
        assert order[16:32].tolist() == want_g1

    def test_vertical_32x32_first_two_groups(self):
        order = vertical_scan_order(32)
        want_g0 = [y * 32 + x for x in range(4) for y in range(4)]
        assert order[:16].tolist() == want_g0
        # second group is BELOW the first (column-major group walk)
        want_g1 = [y * 32 + x for x in range(4) for y in range(4, 8)]
        assert order[16:32].tolist() == want_g1

    def test_4x4_degenerates_to_plain_scans(self):
        assert horizontal_scan_order(4).tolist() == list(range(16))
        assert (
            vertical_scan_order(4).tolist()
            == np.arange(16).reshape(4, 4).T.reshape(-1).tolist()
        )

    @pytest.mark.parametrize("size", [4, 8, 16, 32])
    def test_all_orders_are_permutations(self, size):
        for fn in (diag_scan_order, horizontal_scan_order, vertical_scan_order):
            assert sorted(fn(size).tolist()) == list(range(size * size))

    def test_horizontal_is_not_plain_raster_above_4x4(self):
        # the round-2 bug this replaces: plain row-major called "HEVC"
        assert horizontal_scan_order(8).tolist() != list(range(64))


class TestModeDependentRule:
    def test_spec_rule_8x8(self):
        modes = jnp.asarray([0, 1, 2, 5, 6, 10, 14, 15, 21, 22, 26, 30, 31, 34])
        got = np.asarray(mode_scan_idx(modes, 8)).tolist()
        #                  0  1  2  5  6  10 14 15 21 22 26 30 31 34
        assert got == [0, 0, 0, 0, 2, 2, 2, 0, 0, 1, 1, 1, 0, 0]

    @pytest.mark.parametrize("n", [16, 32])
    def test_large_blocks_always_diag(self, n):
        modes = jnp.asarray([6, 10, 22, 26])
        assert np.asarray(mode_scan_idx(modes, n)).tolist() == [0, 0, 0, 0]

    @pytest.mark.parametrize("n", [4, 8])
    def test_pack_matches_per_block_scalar_kind(self, n):
        rng = np.random.default_rng(7)
        nb = 16
        x = jnp.asarray(rng.integers(-99, 99, (nb, n, n), dtype=np.int32))
        modes = jnp.asarray(rng.integers(0, 35, (nb,), dtype=np.int32))
        p = np.asarray(scan_pack(x, "mode", modes=modes))
        sel = np.asarray(mode_scan_idx(modes, n))
        names = {0: "diag", 1: "horizontal", 2: "vertical"}
        for i in range(nb):
            want = np.asarray(scan_pack(x[i : i + 1], names[sel[i]]))[0]
            assert np.array_equal(p[i], want), (n, i)

    @pytest.mark.parametrize("n", [4, 8, 16])
    def test_mode_pack_unpack_roundtrip(self, n):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.integers(-99, 99, (10, n, n), dtype=np.int32))
        modes = jnp.asarray(rng.integers(0, 35, (10,), dtype=np.int32))
        back = scan_unpack(scan_pack(x, "mode", modes=modes), "mode", modes=modes)
        assert np.array_equal(np.asarray(back), np.asarray(x))

    def test_mode_pack_requires_modes(self):
        x = jnp.zeros((2, 8, 8), jnp.int32)
        with pytest.raises(ValueError):
            scan_pack(x, "mode")


class TestModeScanEndToEnd:
    def _frame(self, h=48, w=64, kind="vert_edges"):
        from nanohevc_tpu.frame import Frame

        y, x = np.mgrid[0:h, 0:w]
        if kind == "vert_edges":   # vertical stripes -> near-vertical modes
            data = ((x // 3) * 37 % 256).astype(np.uint8)
        else:
            data = ((x * 5 + y * 3) % 256).astype(np.uint8)
        fr = Frame.zeros(h, w, dtype=np.int16)
        fr.y.data[...] = data
        fr.u.data[...] = 128
        fr.v.data[...] = 128
        return fr

    @pytest.mark.slow   # ~35 s full-frame closed loop; per-block scan spec checks stay fast
    def test_closed_loop_mode_scan_decodes_pixel_exact(self):
        from nanohevc_tpu.config import EncoderConfig
        from nanohevc_tpu.models.wavefront import (
            decode_frame,
            encode_frame_closed_loop,
        )

        cfg = EncoderConfig(
            block_size=8, qp=26, scan="mode", mode_set="all", decision="satd"
        )
        frame = self._frame()
        recon, bs = encode_frame_closed_loop(frame, cfg)
        dec = decode_frame(bs)
        assert np.array_equal(dec.y.data, recon.y.data)
        assert np.array_equal(dec.u.data, recon.u.data)
        assert np.array_equal(dec.v.data, recon.v.data)

    def test_bitstream_mode_scan_requires_modes(self):
        from nanohevc_tpu.runtime.bitstream import assemble_bitstream

        levels = {"Y": (np.zeros((4, 64), np.int32), 8)}
        with pytest.raises(ValueError, match="mode"):
            assemble_bitstream(64, 32, 22, levels, None, scan="mode")

    @pytest.mark.slow   # ~41 s full-frame mode-scan encode; scan-table spec checks stay fast
    def test_mode_scan_not_larger_on_directional_content(self):
        """Spec motivation: scanning along the prediction direction
        groups the residual's nonzeros, so the mode-dependent scan
        should not cost bits on strongly directional content."""
        from nanohevc_tpu.config import EncoderConfig
        from nanohevc_tpu.models.wavefront import encode_frame_closed_loop

        frame = self._frame(kind="vert_edges")
        sizes = {}
        for scan in ("diag", "mode"):
            cfg = EncoderConfig(
                block_size=8, qp=30, scan=scan, mode_set="all",
                decision="satd",
            )
            _, bs = encode_frame_closed_loop(frame, cfg)
            sizes[scan] = len(bs)
        assert sizes["mode"] <= sizes["diag"]
