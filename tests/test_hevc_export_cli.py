"""CLI standard-stream export: honesty gates and single-mode chroma.

Round-4 verdict items: --hevc-export must refuse configs the exported
stream cannot represent, must NOT re-encode (it is built from the
container bitstream the encode already wrote), and must cover the full
4:2:0 frame; chroma planes need a spec-representable shared mode,
provided by the fixed single-mode sets ("dc"/"planar").
"""

import numpy as np
import pytest

from nanohevc_tpu.cli import main


def _write_yuv(path, h, w, frames=1, seed=0):
    rng = np.random.default_rng(seed)
    with open(path, "wb") as f:
        for i in range(frames):
            yy, xx = np.mgrid[0:h, 0:w]
            y = np.clip(128 + 60 * np.sin(xx / 11 + i) * np.cos(yy / 13)
                        + rng.normal(0, 5, (h, w)), 0, 255).astype(np.uint8)
            u = np.clip(120 + 30 * np.cos(xx[: h // 2, : w // 2] / 9),
                        0, 255).astype(np.uint8)
            f.write(y.tobytes())
            f.write(u.tobytes())
            f.write(u.tobytes())
    return str(path)


class TestSingleModeSets:
    def test_decide_modes_dc_and_planar(self):
        import jax.numpy as jnp

        from nanohevc_tpu import ops
        from nanohevc_tpu.models.all_intra import decide_modes

        rng = np.random.default_rng(0)
        plane = jnp.asarray(rng.integers(0, 256, (16, 24)).astype(np.int32))
        blocks = ops.tile_plane(plane, 8)
        refs = ops.extract_refs(plane, 8)
        pred_dc, m_dc = decide_modes(blocks, refs, 8, "dc", "energy")
        pred_pl, m_pl = decide_modes(blocks, refs, 8, "planar", "energy")
        assert (np.asarray(m_dc) == 1).all()
        assert (np.asarray(m_pl) == 0).all()
        assert np.array_equal(np.asarray(pred_dc), np.asarray(
            ops.dc_predict(refs, 8)))

    def test_config_chroma_mode_set(self):
        from nanohevc_tpu.config import EncoderConfig

        c = EncoderConfig(mode_set="all", chroma_mode_set="dc")
        assert c.chroma_modes() == "dc"
        assert EncoderConfig().chroma_modes() == "dc_planar"
        with pytest.raises(ValueError, match="chroma_mode_set"):
            EncoderConfig(chroma_mode_set="bogus")

    @pytest.mark.slow   # ~12 s full encode; export grammar/honesty gates stay fast
    def test_closed_loop_chroma_dc_roundtrip(self):
        """A closed-loop frame with chroma_mode_set='dc' still decodes
        pixel-exactly, and its U/V modes are all DC."""
        from nanohevc_tpu.config import EncoderConfig
        from nanohevc_tpu.models.all_intra import create_test_frame
        from nanohevc_tpu.models.wavefront import (
            decode_frame,
            encode_frame_closed_loop,
        )
        from nanohevc_tpu.runtime.bitstream import parse_bitstream

        frame = create_test_frame(48, 64)
        cfg = EncoderConfig(qp=26, chroma_mode_set="dc")
        rec, bs = encode_frame_closed_loop(frame, cfg)
        dec = decode_frame(bs)
        for nm in ("y", "u", "v"):
            assert np.array_equal(getattr(rec, nm).data,
                                  getattr(dec, nm).data), nm
        parsed = parse_bitstream(bs)
        assert (parsed["U"]["modes"] == 1).all()
        assert (parsed["V"]["modes"] == 1).all()


class TestExportHonesty:
    def test_deblock_with_export_refused(self, tmp_path, capsys):
        src = _write_yuv(tmp_path / "in.yuv", 48, 64)
        with pytest.raises(SystemExit):
            main(["--platform", "cpu", "encode", src, "--width", "64",
                  "--height", "48", "--pipeline", "closed-loop",
                  "--deblock", "--hevc-export", str(tmp_path / "o.hevc")])
        assert "cannot be represented" in capsys.readouterr().err

    def test_export_needs_closed_loop(self, tmp_path, capsys):
        src = _write_yuv(tmp_path / "in.yuv", 48, 64)
        with pytest.raises(SystemExit):
            main(["--platform", "cpu", "encode", src, "--width", "64",
                  "--height", "48", "--pipeline", "full",
                  "--hevc-export", str(tmp_path / "o.hevc")])
        assert "closed-loop" in capsys.readouterr().err

    def test_export_matches_container_no_reencode(self, tmp_path, capsys):
        """The exported slice carries EXACTLY the levels/modes of the
        container bitstream written by the same command — the export is
        derived from that encode, not a second one."""
        from tests.test_hevc_slice import spec_parse_slice_420
        from tests.test_hevc_stream import split_annexb
        from nanohevc_tpu.runtime.bitstream import (
            _np_unpack,
            _slice_scan_sel,
            parse_bitstream,
        )

        src = _write_yuv(tmp_path / "in.yuv", 48, 64)
        bs_path = tmp_path / "c.bin"
        hevc_path = tmp_path / "c.hevc"
        main(["--platform", "cpu", "encode", src, "--width", "64",
              "--height", "48", "--pipeline", "closed-loop",
              "--qp", "30", "--bitstream", str(bs_path),
              "--hevc-export", str(hevc_path)])
        parsed = parse_bitstream(bs_path.read_bytes())
        nals = split_annexb(hevc_path.read_bytes())
        gy, gmy, gcb, gcr, gmc, gqp = spec_parse_slice_420(
            nals[3][1], 48 // 8, 64 // 8, 8)
        py = parsed["Y"]
        sel = _slice_scan_sel("diag", py["modes"], py["levels"].shape[0], 8)
        assert np.array_equal(gy, _np_unpack(py["levels"], sel, 8))
        assert np.array_equal(gmy, py["modes"])
        pu = parsed["U"]
        selu = _slice_scan_sel("diag", pu["modes"], pu["levels"].shape[0], 4)
        assert np.array_equal(gcb, _np_unpack(pu["levels"], selu, 4))
        assert (gmc == 1).all()          # defaulted --chroma-mode dc

    def test_mono_export_flag(self, tmp_path, capsys):
        from tests.test_hevc_stream import parse_sps, split_annexb

        src = _write_yuv(tmp_path / "in.yuv", 48, 64)
        hevc_path = tmp_path / "m.hevc"
        main(["--platform", "cpu", "encode", src, "--width", "64",
              "--height", "48", "--pipeline", "closed-loop",
              "--hevc-export", str(hevc_path), "--hevc-mono"])
        nals = split_annexb(hevc_path.read_bytes())
        assert parse_sps(nals[1][1])["chroma_format_idc"] == 0


class TestSequenceExport:
    def test_seq_420_export(self, tmp_path, capsys):
        from tests.test_hevc_slice import spec_parse_slice_420
        from tests.test_hevc_stream import split_annexb
        from nanohevc_tpu.models.sequence import decode_sequence_levels
        from nanohevc_tpu.runtime.bitstream import (
            _np_unpack,
            _slice_scan_sel,
        )

        src = _write_yuv(tmp_path / "in.yuv", 48, 64, frames=3)
        bs_path = tmp_path / "s.bin"
        hevc_path = tmp_path / "s.hevc"
        main(["--platform", "cpu", "encode-seq", src, "--width", "64",
              "--height", "48", "--frames", "3", "--closed-loop",
              "--qp", "28", "--bitstream", str(bs_path),
              "--hevc-export", str(hevc_path)])
        nals = split_annexb(hevc_path.read_bytes())
        assert [t for t, _ in nals] == [32, 33, 34, 19, 19, 19]
        frames = decode_sequence_levels(str(bs_path))
        for fi in (0, 2):
            gy, gmy, _, gcr, gmc, gqp = spec_parse_slice_420(
                nals[3 + fi][1], 48 // 8, 64 // 8, 8)
            py = frames[fi]["Y"]
            sel = _slice_scan_sel("diag", py["modes"],
                                  py["levels"].shape[0], 8)
            assert np.array_equal(gy, _np_unpack(py["levels"], sel, 8))
            assert gqp == 28
            pv = frames[fi]["V"]
            selv = _slice_scan_sel("diag", pv["modes"],
                                   pv["levels"].shape[0], 4)
            assert np.array_equal(gcr, _np_unpack(pv["levels"], selv, 4))

    def test_seq_export_needs_closed_loop(self, tmp_path, capsys):
        src = _write_yuv(tmp_path / "in.yuv", 48, 64, frames=2)
        with pytest.raises(SystemExit):
            main(["--platform", "cpu", "encode-seq", src, "--width", "64",
                  "--height", "48", "--frames", "2",
                  "--bitstream", str(tmp_path / "s.bin"),
                  "--hevc-export", str(tmp_path / "s.hevc")])
        assert "closed-loop" in capsys.readouterr().err
