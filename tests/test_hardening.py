"""Regression tests for round-3 hardening fixes (ADVICE round 2).

- PPS smoothing flag must match the encoder's actual prediction config
  on the full-pipeline CLI path (it was silently dropped).
- --target-bytes must be honored (or rejected) on every pipeline, not
  just closed-loop.
- Tiled entropy payloads must decode through a bounded worker pool (a
  corrupt tile count must never translate into thousands of threads).
- A corrupt slice-header block count must be rejected against the SPS
  geometry before any allocation.
"""

import struct

import numpy as np
import pytest

from nanohevc_tpu.runtime import entropy
from nanohevc_tpu.runtime.bitstream import assemble_bitstream, parse_bitstream


def _frame_bytes(h, w, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, h * w * 3 // 2, dtype=np.uint8).tobytes()


class TestSmoothingFlagInFullPipelineBitstream:
    def test_pps_carries_smoothing(self, tmp_path):
        from nanohevc_tpu.cli import main

        yuv = tmp_path / "in.yuv"
        yuv.write_bytes(_frame_bytes(32, 32))
        bs_path = tmp_path / "out.bin"
        main([
            "encode", str(yuv), "--width", "32", "--height", "32",
            "--pipeline", "full", "--intra-smoothing",
            "--bitstream", str(bs_path),
        ])
        params = parse_bitstream(bs_path.read_bytes())["params"]
        assert params["intra_smoothing"] is True


class TestTargetBytesAllPipelines:
    @pytest.mark.slow   # ~21 s CLI full-pipeline compile
    def test_full_pipeline_honors_budget(self, tmp_path, capsys):
        from nanohevc_tpu.cli import main

        yuv = tmp_path / "in.yuv"
        yuv.write_bytes(_frame_bytes(64, 64))
        bs_path = tmp_path / "out.bin"
        budget = 900
        main([
            "encode", str(yuv), "--width", "64", "--height", "64",
            "--pipeline", "full", "--target-bytes", str(budget),
            "--bitstream", str(bs_path),
        ])
        out = capsys.readouterr().out
        assert "Rate search" in out
        assert bs_path.stat().st_size <= budget

    def test_predict_pipeline_rejects_budget(self, tmp_path):
        from nanohevc_tpu.cli import main

        yuv = tmp_path / "in.yuv"
        yuv.write_bytes(_frame_bytes(32, 32))
        with pytest.raises(SystemExit):
            main([
                "encode", str(yuv), "--width", "32", "--height", "32",
                "--target-bytes", "500",
            ])


class TestTiledEntropyThreadBound:
    def test_many_tiles_round_trip(self):
        # 256 tiles over 512 blocks: decodes through the capped worker
        # pool (previously one thread per tile).
        rng = np.random.default_rng(7)
        levels = rng.integers(-3, 4, size=(512, 16)).astype(np.int32)
        payload = entropy.encode_levels(levels, tiles=256)
        out = entropy.decode_levels(payload, 512, 16)
        np.testing.assert_array_equal(out, levels)

    def test_tile_count_beyond_blocks_rejected(self):
        levels = np.zeros((4, 16), np.int32)
        payload = bytearray(entropy.encode_levels(levels, tiles=2))
        payload[0:2] = struct.pack("<H", 50000)  # corrupt tile count
        with pytest.raises(entropy.CorruptBitstreamError):
            entropy.decode_levels(bytes(payload), 4, 16)


class TestSliceHeaderGeometryBound:
    def test_nb_beyond_sps_geometry_rejected(self):
        levels = np.zeros((64, 64), np.int32)
        good = assemble_bitstream(64, 64, 22, {"Y": (levels, 8)})
        # Forge an extra slice whose header claims far more blocks than
        # the 64x64 SPS geometry allows, with self-consistent lengths so
        # only the geometry check can catch it.
        fake_pay = b"\x55" * 64
        header = struct.pack("<HHIIII", 0, 8, 22, 100_000, 0, len(fake_pay))
        forged = good + entropy.wrap_nal(
            entropy.NAL_SLICE, header + fake_pay
        )
        with pytest.raises(entropy.CorruptBitstreamError, match="geometry"):
            parse_bitstream(forged)

    def test_valid_stream_still_parses(self):
        rng = np.random.default_rng(11)
        levels = rng.integers(-2, 3, size=(64, 64)).astype(np.int32)
        data = assemble_bitstream(64, 64, 22, {"Y": (levels, 8)})
        out = parse_bitstream(data)
        np.testing.assert_array_equal(out["Y"]["levels"], levels)


class TestFormatVersionGate:
    def test_old_container_version_rejected(self):
        """A stream whose VPS carries an older format version must fail
        with a clear version message, not a misleading 'corrupt
        checksum' from decoding version-1 residual syntax as version 2."""
        from nanohevc_tpu.runtime.bitstream import _split_nals

        levels = np.zeros((64, 64), np.int32)
        good = assemble_bitstream(64, 64, 22, {"Y": (levels, 8)})
        # VPS RBSP with vps_version = 1: magic "NH", which=0, ue(1)
        # ('010'), ue(0) ('1'), rbsp stop bit + pad -> 0x58.
        old_vps = b"\x4e\x48\x00\x58"
        rebuilt = b"".join(
            entropy.wrap_nal(t, old_vps if t == entropy.NAL_VPS else p)
            for t, p in _split_nals(good)
        )
        with pytest.raises(entropy.CorruptBitstreamError,
                           match="format version"):
            parse_bitstream(rebuilt)
