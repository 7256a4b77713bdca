"""Sequence encoder tests: multi-frame encode, resume, parse-back."""

import json
import os

import numpy as np
import pytest

from nanohevc_tpu.config import EncoderConfig
from nanohevc_tpu.models.sequence import (
    SequenceResult,
    decode_sequence_levels,
    encode_sequence,
)


def write_sequence(path, width, height, frames, seed=0):
    rng = np.random.default_rng(seed)
    fs = width * height * 3 // 2
    data = rng.integers(0, 256, frames * fs, dtype=np.uint8).astype(np.uint8)
    # give frames smooth structure so levels are sparse
    path.write_bytes((data // 4 + 96).tobytes())


class TestSequenceEncode:
    def test_basic_run(self, tmp_path):
        src = tmp_path / "seq.yuv"
        write_sequence(src, 64, 32, 6)
        bs = tmp_path / "seq.bin"
        cfg = EncoderConfig(block_size=8, qp=22)
        res = encode_sequence(str(src), 64, 32, 6, cfg, str(bs), batch=4)
        assert res.frames == 6 and res.resumed_from == 0
        assert bs.stat().st_size == res.bytes_written > 0
        assert np.isfinite(res.mean_psnr_y)
        assert res.stats["throughput"]["mpix_per_s"] > 0

        frames = decode_sequence_levels(str(bs))
        assert len(frames) == 6
        for f in frames:
            # all three plane slices plus the replayed parameter sets
            assert {"Y", "U", "V"} <= set(f)
            assert f["Y"]["levels"].shape == (32, 64)   # 8x4 blocks of 8x8
            assert f["U"]["levels"].shape == (32, 16)   # 8x4 blocks of 4x4
            assert f["Y"]["modes"] is not None

    @pytest.mark.slow   # ~12 s two-pass sequence; the pixel-exact sequence test stays fast
    def test_resume_after_interrupt(self, tmp_path):
        src = tmp_path / "seq.yuv"
        write_sequence(src, 32, 32, 8)
        bs = tmp_path / "seq.bin"
        cfg = EncoderConfig(block_size=8, qp=30)

        res1 = encode_sequence(str(src), 32, 32, 4, cfg, str(bs), batch=2)
        assert res1.frames == 4

        # resume to 8 frames; first 4 must not be re-encoded
        res2 = encode_sequence(str(src), 32, 32, 8, cfg, str(bs), batch=2)
        assert res2.resumed_from == 4
        assert res2.frames == 8
        frames = decode_sequence_levels(str(bs))
        assert len(frames) == 8

        # full restart from scratch produces identical frame payloads
        bs2 = tmp_path / "seq2.bin"
        res3 = encode_sequence(str(src), 32, 32, 8, cfg, str(bs2), batch=8)
        frames2 = decode_sequence_levels(str(bs2))
        for a, b in zip(frames, frames2):
            for plane in ("Y", "U", "V"):
                assert np.array_equal(a[plane]["levels"], b[plane]["levels"])
                assert np.array_equal(a[plane]["modes"], b[plane]["modes"])

    def test_corrupt_progress_restarts(self, tmp_path):
        src = tmp_path / "seq.yuv"
        write_sequence(src, 32, 32, 3)
        bs = tmp_path / "seq.bin"
        cfg = EncoderConfig(block_size=8, qp=22)
        encode_sequence(str(src), 32, 32, 3, cfg, str(bs), batch=2)
        (tmp_path / "seq.bin.progress").write_text("{broken json")
        res = encode_sequence(str(src), 32, 32, 3, cfg, str(bs), batch=2)
        assert res.resumed_from == 0
        assert len(decode_sequence_levels(str(bs))) == 3

    def test_short_input_stops_cleanly(self, tmp_path):
        src = tmp_path / "seq.yuv"
        write_sequence(src, 32, 32, 2)
        bs = tmp_path / "seq.bin"
        res = encode_sequence(
            str(src), 32, 32, 10, EncoderConfig(block_size=8, qp=22), str(bs)
        )
        assert res.frames == 2
        assert len(decode_sequence_levels(str(bs))) == 2


class TestClosedLoopSequence:
    def test_encode_decode_sequence_pixel_exact(self, tmp_path):
        """Closed-loop sequence -> bitstream -> decode == recon frames."""
        import jax.numpy as jnp
        from nanohevc_tpu.models.sequence import decode_sequence
        from nanohevc_tpu.models.wavefront import encode_plane_closed_loop

        src = tmp_path / "seq.yuv"
        write_sequence(src, 32, 32, 3, seed=9)
        bs = tmp_path / "seq.bin"
        cfg = EncoderConfig(block_size=8, qp=24)
        res = encode_sequence(
            str(src), 32, 32, 3, cfg, str(bs), batch=2, closed_loop=True
        )
        assert res.frames == 3

        out = tmp_path / "dec.yuv"
        n = decode_sequence(str(bs), str(out))
        assert n == 3

        # independently recompute each frame's closed-loop recon
        raw = src.read_bytes()
        dec = out.read_bytes()
        fs = 32 * 32 * 3 // 2
        for f in range(3):
            ybytes = raw[f * fs : f * fs + 32 * 32]
            y = np.frombuffer(ybytes, np.uint8).reshape(32, 32).astype(np.int32)
            enc = encode_plane_closed_loop(jnp.asarray(y), jnp.int32(24), n=8)
            got_y = np.frombuffer(
                dec[f * fs : f * fs + 32 * 32], np.uint8
            ).reshape(32, 32)
            assert np.array_equal(got_y, np.asarray(enc["recon"]).astype(np.uint8)), f

    def test_sequence_dequant_rescale_decodes_exact(self, tmp_path):
        """Regression: the encoder once dropped config.dequant_rescale on
        the closed-loop sequence path while the PPS signalled it — the
        decoder then used a different dequant gain than the encoder."""
        import jax.numpy as jnp
        from nanohevc_tpu.models.sequence import decode_sequence
        from nanohevc_tpu.models.wavefront import encode_plane_closed_loop

        src = tmp_path / "seq.yuv"
        write_sequence(src, 32, 32, 2, seed=11)
        bs = tmp_path / "seq.bin"
        cfg = EncoderConfig(block_size=8, qp=24, dequant_rescale=True)
        encode_sequence(
            str(src), 32, 32, 2, cfg, str(bs), batch=2, closed_loop=True
        )
        out = tmp_path / "dec.yuv"
        assert decode_sequence(str(bs), str(out)) == 2
        raw, dec = src.read_bytes(), out.read_bytes()
        fs = 32 * 32 * 3 // 2
        for f in range(2):
            y = np.frombuffer(
                raw[f * fs : f * fs + 32 * 32], np.uint8
            ).reshape(32, 32).astype(np.int32)
            enc = encode_plane_closed_loop(
                jnp.asarray(y), jnp.int32(24), n=8, dequant_rescale=True
            )
            got_y = np.frombuffer(
                dec[f * fs : f * fs + 32 * 32], np.uint8
            ).reshape(32, 32)
            assert np.array_equal(
                got_y, np.asarray(enc["recon"]).astype(np.uint8)
            ), f

    def test_cli_sequence_decode(self, tmp_path, capsys):
        from nanohevc_tpu.cli import main

        src = tmp_path / "seq.yuv"
        write_sequence(src, 32, 32, 2, seed=10)
        bs = tmp_path / "seq.bin"
        main(["encode-seq", str(src), "--width", "32", "--height", "32",
              "--frames", "2", "--qp", "28", "--batch", "2",
              "--closed-loop", "--bitstream", str(bs)])
        out = tmp_path / "dec.yuv"
        main(["decode", str(bs), "-o", str(out)])
        text = capsys.readouterr().out
        assert "2 frames" in text
        assert out.stat().st_size == 2 * 32 * 32 * 3 // 2

    def test_closed_loop_resume(self, tmp_path):
        """Resume continues a closed-loop stream; frames stay decodable."""
        from nanohevc_tpu.models.sequence import decode_sequence

        src = tmp_path / "seq.yuv"
        write_sequence(src, 32, 32, 4, seed=11)
        bs = tmp_path / "seq.bin"
        cfg = EncoderConfig(block_size=8, qp=26)
        r1 = encode_sequence(str(src), 32, 32, 2, cfg, str(bs), batch=2,
                             closed_loop=True)
        assert r1.frames == 2
        r2 = encode_sequence(str(src), 32, 32, 4, cfg, str(bs), batch=2,
                             closed_loop=True)
        assert r2.resumed_from == 2 and r2.frames == 4
        out = tmp_path / "dec.yuv"
        assert decode_sequence(str(bs), str(out)) == 4
        assert out.stat().st_size == 4 * 32 * 32 * 3 // 2
