"""Native entropy runtime tests: build, round-trips, compression, NAL."""

import numpy as np
import pytest

from nanohevc_tpu.runtime import (
    assemble_bitstream,
    decode_levels,
    encode_levels,
    parse_bitstream,
    wrap_nal,
    write_params,
)
from nanohevc_tpu.runtime.entropy import CorruptBitstreamError


def sparse_levels(rng, nb, ncoef, density=0.1, amp=10):
    x = rng.integers(-amp, amp + 1, (nb, ncoef)).astype(np.int32)
    mask = rng.random((nb, ncoef)) < density
    return np.where(mask, x, 0).astype(np.int32)


class TestRangeCodecRoundTrip:
    @pytest.mark.parametrize("ncoef", [16, 64, 256, 1024])
    def test_sparse(self, ncoef):
        rng = np.random.default_rng(0)
        levels = sparse_levels(rng, 100, ncoef)
        data = encode_levels(levels)
        assert np.array_equal(decode_levels(data, 100, ncoef), levels)

    def test_all_zero_blocks(self):
        levels = np.zeros((50, 64), np.int32)
        data = encode_levels(levels)
        assert len(data) < 40  # one cbf bin per block, heavily adapted
        assert np.array_equal(decode_levels(data, 50, 64), levels)

    def test_dense_large_magnitudes(self):
        rng = np.random.default_rng(1)
        levels = rng.integers(-3000, 3000, (20, 64)).astype(np.int32)
        data = encode_levels(levels)
        assert np.array_equal(decode_levels(data, 20, 64), levels)

    def test_extreme_values(self):
        levels = np.array([[2**30, -(2**30), 1, -1] + [0] * 12], np.int32)
        data = encode_levels(levels)
        assert np.array_equal(decode_levels(data, 1, 16), levels)

    def test_carry_stress(self):
        """Alternating patterns provoke range-coder carry propagation."""
        rng = np.random.default_rng(2)
        for trial in range(20):
            levels = sparse_levels(rng, 37, 64, density=0.5, amp=2000)
            data = encode_levels(levels)
            assert np.array_equal(decode_levels(data, 37, 64), levels), trial

    def test_compression_beats_raw(self):
        """Typical QP22 level statistics compress far below raw int32."""
        rng = np.random.default_rng(3)
        levels = sparse_levels(rng, 32400, 64, density=0.05, amp=8)
        data = encode_levels(levels)
        raw = levels.size * 4
        assert len(data) < raw / 10


class TestNAL:
    def test_wrap_has_start_code_and_header(self):
        out = wrap_nal(33, b"\x12\x34")
        assert out.startswith(b"\x00\x00\x00\x01")
        assert (out[4] >> 1) & 0x3F == 33
        assert out.endswith(b"\x12\x34")

    def test_emulation_prevention(self):
        payload = b"\x00\x00\x00\x00\x01\x00\x00\x02"
        out = wrap_nal(1, payload)
        body = out[6:]
        # no 00 00 0x sequences survive un-stuffed
        for i in range(len(body) - 2):
            if body[i] == 0 and body[i + 1] == 0:
                assert body[i + 2] == 3

    def test_params_payloads_distinct(self):
        vps = write_params(1920, 1080, 8, 22, 0)
        sps = write_params(1920, 1080, 8, 22, 1)
        pps = write_params(1920, 1080, 8, 22, 2)
        assert vps[:2] == b"NH" and sps[:2] == b"NH"
        assert len({vps, sps, pps}) == 3


class TestBitstream:
    def test_frame_roundtrip_with_modes(self):
        rng = np.random.default_rng(4)
        planes = {
            "Y": (sparse_levels(rng, 64, 64), 8),
            "U": (sparse_levels(rng, 16, 16), 4),
            "V": (sparse_levels(rng, 16, 16), 4),
        }
        modes = {k: rng.integers(0, 35, v[0].shape[0]).astype(np.int32)
                 for k, v in planes.items()}
        bs = assemble_bitstream(64, 64, 22, planes, modes)
        assert bs.count(b"\x00\x00\x00\x01") >= 6  # 3 param sets + 3 slices
        back = parse_bitstream(bs)
        for name, (levels, bsz) in planes.items():
            assert np.array_equal(back[name]["levels"], levels), name
            assert np.array_equal(back[name]["modes"], modes[name]), name
            assert back[name]["block_size"] == bsz

    def test_empty_frame_no_modes(self):
        planes = {"Y": (np.zeros((4, 64), np.int32), 8)}
        back = parse_bitstream(assemble_bitstream(16, 16, 30, planes))
        assert np.array_equal(back["Y"]["levels"], planes["Y"][0])
        assert back["Y"]["modes"] is None


class TestRobustness:
    def test_decode_garbage_bytes_detected(self):
        """Random bytes must be REJECTED, not silently decoded."""
        from nanohevc_tpu.runtime.entropy import CorruptBitstreamError

        rng = np.random.default_rng(7)
        junk = rng.integers(0, 256, 200, dtype=np.uint8).tobytes()
        with pytest.raises(CorruptBitstreamError):
            decode_levels(junk, 10, 64)

    def test_decode_truncated_stream_detected(self):
        """Streams cut mid-payload raise instead of zero-extending."""
        from nanohevc_tpu.runtime.entropy import CorruptBitstreamError

        rng = np.random.default_rng(8)
        levels = sparse_levels(rng, 20, 64)
        data = encode_levels(levels)
        for cut in (len(data) // 2, len(data) - 1, 3, 0):
            with pytest.raises(CorruptBitstreamError):
                decode_levels(data[:cut], 20, 64)

    def test_single_bit_flip_detected(self):
        """Every single-bit corruption of a real payload is caught."""
        from nanohevc_tpu.runtime.entropy import CorruptBitstreamError

        rng = np.random.default_rng(12)
        levels = sparse_levels(rng, 8, 64, density=0.3)
        data = bytearray(encode_levels(levels))
        flips = rng.integers(0, len(data) * 8, 64)
        for f in flips:
            data[f // 8] ^= 1 << (f % 8)
            try:
                out = decode_levels(bytes(data), 8, 64)
                # a flip may luckily decode; it must NOT silently differ
                assert np.array_equal(out, levels), f
            except CorruptBitstreamError:
                pass
            data[f // 8] ^= 1 << (f % 8)  # restore

    def test_zero_filled_stream_terminates_and_raises(self):
        """All-zero input drives the EG0 unary loop; the length cap must
        terminate it (this hung forever before the bound)."""
        from nanohevc_tpu.runtime.entropy import CorruptBitstreamError

        with pytest.raises(CorruptBitstreamError):
            decode_levels(b"\xff" * 8 + b"\x00" * 64, 4, 64)

    def test_parse_bitstream_ignores_garbage_nals(self):
        from nanohevc_tpu.runtime import wrap_nal

        rng = np.random.default_rng(9)
        planes = {"Y": (sparse_levels(rng, 4, 16), 4)}
        bs = assemble_bitstream(16, 16, 22, planes)
        noisy = wrap_nal(63, b"\x01\x02\x03") + bs + wrap_nal(40, b"")
        back = parse_bitstream(noisy)
        assert np.array_equal(back["Y"]["levels"], planes["Y"][0])

    def test_empty_payload_roundtrip(self):
        assert np.array_equal(
            decode_levels(encode_levels(np.zeros((1, 16), np.int32)), 1, 16),
            np.zeros((1, 16), np.int32),
        )

    def test_tiled_payload_roundtrip(self):
        """Entropy tiles: any tile count round-trips losslessly and the
        decoder is tile-count agnostic (the payload is self-describing)."""
        rng = np.random.default_rng(30)
        levels = sparse_levels(rng, 96, 64)
        for tiles in (1, 2, 3, 8, 96):
            pay = encode_levels(levels, tiles=tiles)
            assert np.array_equal(decode_levels(pay, 96, 64), levels), tiles

    def test_tiled_corruption_detected(self):
        rng = np.random.default_rng(31)
        levels = sparse_levels(rng, 64, 64)
        pay = bytearray(encode_levels(levels, tiles=4))
        pay[len(pay) // 2] ^= 0x40
        with pytest.raises(CorruptBitstreamError):
            decode_levels(bytes(pay), 64, 64)

    def test_tiled_bitstream_through_frame_api(self):
        rng = np.random.default_rng(32)
        planes = {"Y": (sparse_levels(rng, 32, 64), 8)}
        bs = assemble_bitstream(64, 32, 22, planes, entropy_tiles=4)
        back = parse_bitstream(bs)
        assert np.array_equal(back["Y"]["levels"], planes["Y"][0])

    def test_parser_fuzz_random_buffers(self):
        """200 random byte buffers: the parser must either raise a clean
        Python exception or return a (possibly empty) dict — never hang
        or crash the process (the native decoder is bounds-checked)."""
        rng = np.random.default_rng(77)
        for _ in range(200):
            n = int(rng.integers(0, 400))
            buf = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
            try:
                parse_bitstream(buf)
            except (ValueError, RuntimeError, KeyError, IndexError):
                pass

    def test_parser_fuzz_mutated_valid_streams(self):
        """Random mutations of a VALID stream: clean error or clean
        parse; a parse that reaches the levels must either verify the
        checksum or raise."""
        rng = np.random.default_rng(78)
        planes = {"Y": (sparse_levels(rng, 8, 64), 8)}
        good = bytearray(assemble_bitstream(64, 64, 22, planes))
        for _ in range(200):
            bad = bytearray(good)
            for _ in range(int(rng.integers(1, 6))):
                bad[int(rng.integers(0, len(bad)))] = int(rng.integers(0, 256))
            try:
                parse_bitstream(bytes(bad))
            except (ValueError, RuntimeError, KeyError, IndexError,
                    OverflowError):
                pass

    @pytest.mark.slow   # ~13 s corruption fuzz sweep
    def test_decode_frame_fuzz(self):
        """Mutated closed-loop frame streams through the full decoder:
        clean exception or a decoded Frame, never a crash/hang."""
        import jax.numpy as jnp

        from nanohevc_tpu.config import EncoderConfig
        from nanohevc_tpu.models.all_intra import create_test_frame
        from nanohevc_tpu.models.wavefront import (
            decode_frame,
            encode_frame_closed_loop,
        )

        frame = create_test_frame(32, 32)
        _, good = encode_frame_closed_loop(
            frame, EncoderConfig(block_size=8, qp=30)
        )
        rng = np.random.default_rng(79)
        for _ in range(40):
            bad = bytearray(good)
            for _ in range(int(rng.integers(1, 4))):
                bad[int(rng.integers(0, len(bad)))] = int(rng.integers(0, 256))
            try:
                decode_frame(bytes(bad))
            except (ValueError, RuntimeError, KeyError, IndexError,
                    OverflowError, TypeError):
                pass


class TestParamParsing:
    def test_sps_fields_roundtrip(self):
        from nanohevc_tpu.runtime.bitstream import parse_params

        sps = parse_params(write_params(1920, 1080, 8, 22, 1))
        assert sps["width"] == 1920 and sps["height"] == 1080
        assert sps["block_size"] == 8
        assert sps["chroma_format_idc"] == 1
        assert sps["bit_depth_luma_minus8"] == 0

    def test_pps_fields_roundtrip(self):
        from nanohevc_tpu.runtime.bitstream import parse_params

        for qp in (0, 22, 51):
            pps = parse_params(write_params(64, 64, 4, qp, 2))
            assert pps["qp"] == qp and pps["scan_idx"] == 0

    def test_bad_magic_rejected(self):
        from nanohevc_tpu.runtime.bitstream import parse_params

        with pytest.raises(ValueError):
            parse_params(b"\xff\xff\x00\x00")

    def test_exp_golomb_extremes(self):
        from nanohevc_tpu.runtime.bitstream import parse_params

        sps = parse_params(write_params(7680, 4320, 32, 51, 1))
        assert (sps["width"], sps["height"]) == (7680, 4320)
