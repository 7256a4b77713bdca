"""Standard-syntax HEVC stream export vs an independent parser.

Extends the independent spec parser of tests/test_hevc_slice.py with
the Annex B / parameter-set grammar — nal_unit_header (7.3.1.2),
emulation prevention removal (7.4.2), profile_tier_level (7.3.3),
VPS/SPS/PPS (7.3.2.1-3) — all written from the clauses, then parses a
full exported monochrome stream end to end and decodes the slice
bit-exactly.  No HEVC decoder ships in this container; this parser is
the conformance evidence for runtime/hevc_stream.py.
"""

import numpy as np
import pytest

from nanohevc_tpu.runtime.hevc_stream import (
    NAL_IDR_W_RADL,
    NAL_PPS,
    NAL_SPS,
    NAL_VPS,
    HevcStreamWriter,
    chroma_qp_offset_for,
    chroma_qpc,
    export_hevc_stream,
    export_hevc_stream_420,
    wrap_nal_hevc,
    write_pps_hevc,
    write_sps_hevc,
    write_vps_hevc,
)
from tests.test_hevc_slice import (
    ExpGolombReader,
    _random_chroma,
    _random_plane,
    spec_parse_slice,
    spec_parse_slice_420,
)


# ---------------------------------------------------------------------------
# Independent Annex B / RBSP / parameter-set parsing (from the clauses)
# ---------------------------------------------------------------------------

def split_annexb(data: bytes):
    """B.2.2: split on start codes, strip emulation prevention."""
    nals = []
    i = 0
    starts = []
    while i + 3 <= len(data):
        if data[i : i + 3] == b"\x00\x00\x01":
            starts.append(i + 3)
            i += 3
        else:
            i += 1
    starts.append(len(data) + 3)
    for s, e in zip(starts[:-1], starts[1:]):
        raw = data[s : e - 3]
        # a 4-byte start code's leading zero attaches to the previous
        # NAL after splitting on 00 00 01; real RBSPs never end in 0x00
        # (rbsp_trailing_bits), so stripping one trailing zero is safe
        if raw.endswith(b"\x00"):
            raw = raw[:-1]
        # nal_unit_header (7.3.1.2)
        assert (raw[0] >> 7) == 0                 # forbidden_zero_bit
        nal_type = (raw[0] >> 1) & 0x3F
        layer_id = ((raw[0] & 1) << 5) | (raw[1] >> 3)
        tid_plus1 = raw[1] & 7
        assert layer_id == 0 and tid_plus1 == 1
        # 7.4.2 emulation prevention removal
        rbsp = bytearray()
        zeros = 0
        j = 2
        while j < len(raw):
            b = raw[j]
            if zeros >= 2 and b == 3:
                zeros = 0
                j += 1
                continue
            rbsp.append(b)
            zeros = zeros + 1 if b == 0 else 0
            j += 1
        nals.append((nal_type, bytes(rbsp)))
    return nals


def parse_ptl(r: ExpGolombReader) -> dict:
    """7.3.3 general profile_tier_level (no sub-layers)."""
    out = {
        "profile_space": r.ue.__self__ and None,  # placeholder, not used
    }
    out["profile_space"] = (r.bit() << 1) | r.bit()
    out["tier"] = r.bit()
    out["profile_idc"] = sum(r.bit() << (4 - i) for i in range(5))
    out["compat"] = sum(r.bit() << (31 - i) for i in range(32))
    out["progressive"] = r.bit()
    out["interlaced"] = r.bit()
    out["non_packed"] = r.bit()
    out["frame_only"] = r.bit()
    if out["profile_idc"] == 4 or (out["compat"] >> (31 - 4)) & 1:
        # RExt constraint flags then reserved 34 + inbld
        flags = [r.bit() for _ in range(9)]
        out["monochrome_constraint"] = flags[5]
        for _ in range(34):
            assert r.bit() == 0
    else:
        # Main/Main10: general_reserved_zero_43bits
        out["monochrome_constraint"] = 0
        for _ in range(43):
            assert r.bit() == 0
    r.bit()                                       # inbld/reserved
    out["level_idc"] = sum(r.bit() << (7 - i) for i in range(8))
    return out


def parse_sps(rbsp: bytes) -> dict:
    r = ExpGolombReader(rbsp)
    assert sum(r.bit() << (3 - i) for i in range(4)) == 0  # vps id
    assert sum(r.bit() << (2 - i) for i in range(3)) == 0  # max_sub_layers
    r.bit()                                       # temporal_id_nesting
    ptl = parse_ptl(r)
    out = {"ptl": ptl}
    assert r.ue() == 0                            # sps id
    out["chroma_format_idc"] = r.ue()
    out["pic_width"] = r.ue()
    out["pic_height"] = r.ue()
    if r.bit():                                   # conformance_window
        out["win"] = (r.ue(), r.ue(), r.ue(), r.ue())
    else:
        out["win"] = (0, 0, 0, 0)
    out["bit_depth_luma"] = 8 + r.ue()
    out["bit_depth_chroma"] = 8 + r.ue()
    out["log2_max_poc"] = 4 + r.ue()
    assert r.bit() == 1                           # ordering info present
    r.ue(), r.ue(), r.ue()                        # dpb/reorder/latency
    min_cb_log2 = 3 + r.ue()
    ctb_log2 = min_cb_log2 + r.ue()
    out["min_cb_log2"] = min_cb_log2
    out["ctb_log2"] = ctb_log2
    min_tb_log2 = 2 + r.ue()
    max_tb_log2 = min_tb_log2 + r.ue()
    out["min_tb_log2"] = min_tb_log2
    out["max_tb_log2"] = max_tb_log2
    r.ue(), r.ue()                                # transform hierarchy
    assert r.bit() == 0                           # scaling lists
    assert r.bit() == 0                           # amp
    out["sao_enabled"] = r.bit()
    assert r.bit() == 0                           # pcm
    assert r.ue() == 0                            # num_short_term_rps
    assert r.bit() == 0                           # long_term
    assert r.bit() == 0                           # temporal_mvp
    out["strong_smoothing"] = r.bit()
    assert r.bit() == 0                           # vui
    assert r.bit() == 0                           # sps_extension
    assert r.bit() == 1                           # rbsp stop bit
    return out


def parse_pps(rbsp: bytes) -> dict:
    r = ExpGolombReader(rbsp)
    assert r.ue() == 0 and r.ue() == 0            # pps id, sps id
    assert r.bit() == 0                           # dependent slices
    assert r.bit() == 0                           # output_flag_present
    assert sum(r.bit() for _ in range(3)) == 0    # extra header bits
    out = {"sign_hiding": r.bit()}
    out["cabac_init_present"] = r.bit()
    r.ue(), r.ue()                                # ref idx defaults
    out["init_qp"] = 26 + r.se()
    assert r.bit() == 0                           # constrained intra
    assert r.bit() == 0                           # transform skip
    out["cu_qp_delta"] = r.bit()
    out["cb_qp_offset"] = r.se()
    out["cr_qp_offset"] = r.se()
    assert r.bit() == 0                           # slice chroma offsets
    assert r.bit() == 0 and r.bit() == 0          # weighted pred/bipred
    assert r.bit() == 0                           # transquant bypass
    out["tiles"] = r.bit()
    out["wpp"] = r.bit()
    out["across_slices"] = r.bit()
    assert r.bit() == 1                           # deblocking control
    assert r.bit() == 0                           # override enabled
    out["deblocking_disabled"] = r.bit()
    assert r.bit() == 0                           # scaling list data
    assert r.bit() == 0                           # lists modification
    assert r.ue() == 0                            # parallel merge
    assert r.bit() == 0                           # header extension
    assert r.bit() == 0                           # pps extension
    assert r.bit() == 1                           # rbsp stop
    return out


class TestParameterSets:
    def test_vps_parses(self):
        r = ExpGolombReader(write_vps_hevc())
        assert sum(r.bit() << (3 - i) for i in range(4)) == 0
        assert r.bit() == 1 and r.bit() == 1      # base layer flags
        assert sum(r.bit() for _ in range(6)) == 0  # max_layers_minus1
        assert sum(r.bit() for _ in range(3)) == 0  # max_sub_layers
        assert r.bit() == 1                       # temporal nesting
        assert sum(r.bit() << (15 - i) for i in range(16)) == 0xFFFF
        ptl = parse_ptl(r)
        assert ptl["profile_idc"] == 4            # RExt
        assert ptl["monochrome_constraint"] == 1
        assert ptl["level_idc"] == 120

    @pytest.mark.parametrize("w,h,n", [(96, 64, 8), (100, 72, 8),
                                       (96, 96, 32), (128, 96, 16)])
    def test_sps_geometry(self, w, h, n):
        sps = parse_sps(write_sps_hevc(w, h, n))
        lg = n.bit_length() - 1
        assert sps["chroma_format_idc"] == 0      # monochrome
        assert sps["pic_width"] == -(-w // n) * n
        assert sps["pic_height"] == -(-h // n) * n
        assert sps["win"][1] == sps["pic_width"] - w
        assert sps["win"][3] == sps["pic_height"] - h
        assert sps["min_cb_log2"] == lg
        assert sps["ctb_log2"] == lg + 1          # CTB = 2N
        assert sps["min_tb_log2"] == lg
        assert sps["max_tb_log2"] == lg
        assert not sps["sao_enabled"]

    def test_pps_tools_off(self):
        pps = parse_pps(write_pps_hevc())
        assert pps["init_qp"] == 26
        assert not pps["sign_hiding"]
        assert not pps["cu_qp_delta"]
        assert not pps["tiles"] and not pps["wpp"]
        assert pps["deblocking_disabled"]


class TestEmulationPrevention:
    def test_start_code_patterns_escaped(self):
        # 7.4.2: the escaped body must never contain 00 00 00/01/02
        # (00 00 03 is the emulation_prevention_three_byte itself);
        # ends nonzero like every real RBSP (rbsp_trailing_bits)
        rbsp = bytes([0, 0, 0, 1, 0, 0, 2, 0, 0, 3, 0, 0, 0, 0x80])
        nal = wrap_nal_hevc(NAL_VPS, rbsp)
        body = nal[4:]
        for i in range(len(body) - 2):
            assert not (body[i] == 0 and body[i + 1] == 0
                        and body[i + 2] <= 2), i
        # and the independent splitter inverts it exactly
        typ, back = split_annexb(nal)[0]
        assert typ == NAL_VPS
        assert back == rbsp


class TestMinCbFloor:
    def test_4x4_rejected(self):
        with pytest.raises(ValueError, match="min CB"):
            from nanohevc_tpu.runtime.hevc_stream import write_sps_hevc
            write_sps_hevc(48, 48, 4)


class TestFullStream:
    def _export(self, h, w, n, qp, seed=0):
        rng = np.random.default_rng(seed)
        nby, nbx = -(-h // n), -(-w // n)
        nb = nby * nbx
        lv = np.where(rng.random((nb, n, n)) < 0.2,
                      rng.integers(-40, 41, (nb, n, n)), 0).astype(np.int32)
        md = rng.integers(0, 35, nb).astype(np.int32)
        return lv, md, export_hevc_stream(lv, md, h, w, n, qp)

    @pytest.mark.parametrize("h,w,n,qp", [(64, 96, 8, 22), (72, 100, 8, 30),
                                          (128, 128, 32, 27),
                                          (96, 96, 16, 35)])
    def test_stream_parses_end_to_end(self, h, w, n, qp):
        lv, md, stream = self._export(h, w, n, qp)
        nals = split_annexb(stream)
        assert [t for t, _ in nals] == [NAL_VPS, NAL_SPS, NAL_PPS,
                                        NAL_IDR_W_RADL]
        sps = parse_sps(nals[1][1])
        pps = parse_pps(nals[2][1])
        assert pps["init_qp"] == 26
        nby = sps["pic_height"] >> sps["min_cb_log2"]
        nbx = sps["pic_width"] >> sps["min_cb_log2"]
        got_lv, got_md, got_qp = spec_parse_slice(
            nals[3][1], nby, nbx, 1 << sps["min_cb_log2"]
        )
        assert got_qp == qp
        assert np.array_equal(got_md, md)
        assert np.array_equal(got_lv, lv)

    def test_multi_frame_stream(self):
        """N IDR access units in one Annex B stream: one param-set
        group, then per-frame slices; frames 0 and N-1 decode
        bit-exactly via the independent parser."""
        h, w, n, qp, frames = 64, 96, 8, 25, 4
        nby, nbx = h // n, w // n
        writer = HevcStreamWriter(h, w, n, qp)
        payloads = []
        for f in range(frames):
            lv, md = _random_plane(nby, nbx, n, seed=900 + f)
            writer.add_frame(lv, md)
            payloads.append((lv, md))
        nals = split_annexb(writer.bytes())
        assert [t for t, _ in nals] == (
            [NAL_VPS, NAL_SPS, NAL_PPS] + [NAL_IDR_W_RADL] * frames
        )
        for fi in (0, frames - 1):
            got_lv, got_md, got_qp = spec_parse_slice(
                nals[3 + fi][1], nby, nbx, n)
            assert got_qp == qp
            assert np.array_equal(got_md, payloads[fi][1])
            assert np.array_equal(got_lv, payloads[fi][0])

    @pytest.mark.slow   # ~22 s full-frame encode; field-level stream grammar tests stay fast
    def test_real_frame_export(self):
        """A real closed-loop luma plane exports and parses."""
        import jax.numpy as jnp

        from nanohevc_tpu.models.all_intra import create_test_frame
        from nanohevc_tpu.models.wavefront import encode_plane_closed_loop
        from nanohevc_tpu.runtime.bitstream import _np_unpack, _slice_scan_sel

        h, w, n, qp = 72, 96, 8, 28
        frame = create_test_frame(h, w)
        out = encode_plane_closed_loop(
            jnp.asarray(frame.y.data.astype(np.int32)), jnp.int32(qp),
            n=n, mode_set="all", decision="satd",
        )
        lv = np.asarray(out["levels"])
        md = np.asarray(out["modes"])
        sel = _slice_scan_sel("diag", md, lv.shape[0], n)
        raster = _np_unpack(lv, sel, n)
        stream = export_hevc_stream(raster, md, h, w, n, qp)
        nals = split_annexb(stream)
        sps = parse_sps(nals[1][1])
        assert (sps["pic_width"], sps["pic_height"]) == (96, 72)
        got_lv, got_md, got_qp = spec_parse_slice(
            nals[3][1], 72 // n, 96 // n, n)
        assert got_qp == qp
        assert np.array_equal(got_md, md)
        assert np.array_equal(got_lv, raster)


class TestChromaQpOffset:
    def test_identity_offset_exists_for_every_qp(self):
        """The PPS offset must steer Table 8-10 back to QpC == QpY."""
        for qp in range(52):
            d = chroma_qp_offset_for(qp)
            assert 0 <= d <= 6
            assert chroma_qpc(min(57, qp + d)) == qp

    def test_map_spot_values(self):
        # Table 8-10 spot checks
        assert chroma_qpc(29) == 29
        assert chroma_qpc(30) == 29
        assert chroma_qpc(35) == 33
        assert chroma_qpc(43) == 37
        assert chroma_qpc(44) == 38


class TestFullStream420:
    @pytest.mark.parametrize("h,w,n,qp", [(64, 96, 8, 22), (72, 104, 8, 30),
                                          (96, 96, 16, 35),
                                          (128, 128, 32, 27)])
    def test_420_stream_parses_end_to_end(self, h, w, n, qp):
        nby, nbx = -(-h // n), -(-w // n)
        lv, md = _random_plane(nby, nbx, n, seed=h + w + n)
        cb, cr, md_c = _random_chroma(nby, nbx, n // 2, md, seed=qp)
        stream = export_hevc_stream_420(lv, md, cb, cr, md_c, h, w, n, qp)
        nals = split_annexb(stream)
        assert [t for t, _ in nals] == [NAL_VPS, NAL_SPS, NAL_PPS,
                                        NAL_IDR_W_RADL]
        sps = parse_sps(nals[1][1])
        assert sps["chroma_format_idc"] == 1
        assert sps["ptl"]["profile_idc"] == 1     # Main at 8-bit
        # conformance window offsets are in chroma units for 4:2:0
        assert sps["win"][1] * 2 == sps["pic_width"] - w
        assert sps["win"][3] * 2 == sps["pic_height"] - h
        pps = parse_pps(nals[2][1])
        d = chroma_qp_offset_for(qp)
        assert pps["cb_qp_offset"] == d and pps["cr_qp_offset"] == d
        # the decoder-side chroma QP equals the luma QP the framework
        # quantized chroma with
        assert chroma_qpc(min(57, qp + d)) == qp
        gy, gmy, gcb, gcr, gmc, gqp = spec_parse_slice_420(
            nals[3][1], nby, nbx, n)
        assert gqp == qp
        assert np.array_equal(gmy, md) and np.array_equal(gmc, md_c)
        assert np.array_equal(gy, lv)
        assert np.array_equal(gcb, cb) and np.array_equal(gcr, cr)

    def test_multi_frame_420_stream(self):
        h, w, n, qp, frames = 64, 96, 8, 30, 3
        nby, nbx = h // n, w // n
        writer = HevcStreamWriter(h, w, n, qp, chroma420=True)
        payloads = []
        for f in range(frames):
            lv, md = _random_plane(nby, nbx, n, seed=70 + f)
            cb, cr, md_c = _random_chroma(nby, nbx, n // 2, md, seed=f)
            writer.add_frame(lv, md, cb, cr, md_c)
            payloads.append((lv, md, cb, cr, md_c))
        nals = split_annexb(writer.bytes())
        assert len(nals) == 3 + frames
        for fi in (0, frames - 1):
            gy, gmy, gcb, gcr, gmc, gqp = spec_parse_slice_420(
                nals[3 + fi][1], nby, nbx, n)
            lv, md, cb, cr, md_c = payloads[fi]
            assert gqp == qp
            assert np.array_equal(gy, lv) and np.array_equal(gmy, md)
            assert np.array_equal(gcb, cb) and np.array_equal(gcr, cr)
            assert np.array_equal(gmc, md_c)

    def test_main10_profile_at_10bit(self):
        sps = parse_sps(write_sps_hevc(64, 64, 8, bit_depth=10,
                                       chroma_format_idc=1))
        assert sps["ptl"]["profile_idc"] == 2
        assert sps["bit_depth_luma"] == 10
