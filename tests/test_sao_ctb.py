"""CTB-granular SAO (ops/sao_ctb.py + the CTB-SAO NAL syntax).

Pins the device estimator against an independently-written numpy
oracle (loops over tiles and candidates, spec classification from
ref/sao.py), round-trips the bit-packed merge syntax, and drives the
full encoder/decoder integration including odd geometries, sequence
streams, and the PPS sao_enabled enforcement.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from nanohevc_tpu.ref.sao import (
    SAO_BO,
    SAO_EO0,
    SAO_OFF,
    band_indices,
    eo_categories,
    max_offset,
)
from nanohevc_tpu.ops.sao_ctb import (
    BITS_BO,
    BITS_EO,
    BITS_OFF,
    apply_sao_ctb,
    estimate_sao_ctb,
    tile_grid,
)
from nanohevc_tpu.runtime.bitstream import (
    parse_sao_ctb_params,
    write_sao_ctb_params,
)
from nanohevc_tpu.runtime.entropy import CorruptBitstreamError


# ---------------------------------------------------------------------------
# Independent numpy oracle: per-tile RD selection over full-plane
# classification (no merge pass).
# ---------------------------------------------------------------------------

def _oracle_offset(cnt, ssum, cap, lo, hi):
    if cnt <= 0:
        return 0
    o = int(np.round(np.float32(ssum) / np.float32(cnt)))
    return int(np.clip(o, max(lo, -cap), min(hi, cap)))


def _oracle_dsse(cnt, ssum, o):
    return np.float32(cnt) * np.float32(o * o) - np.float32(2.0) * \
        np.float32(o) * np.float32(ssum)


def oracle_estimate_tiled(src, rec, tile, lam, bit_depth=8):
    src = np.asarray(src, np.int64)
    rec = np.asarray(rec, np.int64)
    h, w = rec.shape
    cap = max_offset(bit_depth)
    cats = [eo_categories(rec, c) for c in range(4)]     # full plane
    bands = band_indices(rec, bit_depth)
    diff = (src - rec).astype(np.int64)
    nty, ntx = tile_grid(h, w, tile)
    tmap = np.zeros((nty, ntx), np.int32)
    bmap = np.zeros((nty, ntx), np.int32)
    omap = np.zeros((nty, ntx, 4), np.int32)
    for ty in range(nty):
        for tx in range(ntx):
            ys = slice(ty * tile, min((ty + 1) * tile, h))
            xs = slice(tx * tile, min((tx + 1) * tile, w))
            d = diff[ys, xs]
            cands = [(np.float32(lam * BITS_OFF), SAO_OFF, 0, [0] * 4)]
            for c in range(4):
                cat = cats[c][ys, xs]
                offs, tot = [], np.float32(0)
                for k in range(1, 5):
                    m = cat == k
                    cnt, ssum = int(m.sum()), int(d[m].sum())
                    lo, hi = (0, cap) if k <= 2 else (-cap, 0)
                    o = _oracle_offset(cnt, ssum, cap, lo, hi)
                    offs.append(o)
                    tot = tot + _oracle_dsse(cnt, ssum, o)
                cands.append(
                    (tot + np.float32(lam * BITS_EO), SAO_EO0 + c, 0, offs)
                )
            bnd = bands[ys, xs]
            cnt_b = [int((bnd == b).sum()) for b in range(32)]
            sum_b = [int(d[bnd == b].sum()) for b in range(32)]
            o_b = [_oracle_offset(cnt_b[b], sum_b[b], cap, -cap, cap)
                   for b in range(32)]
            d_b = [_oracle_dsse(cnt_b[b], sum_b[b], o_b[b])
                   for b in range(32)]
            for p in range(29):
                tot = ((d_b[p] + d_b[p + 1]) + d_b[p + 2]) + d_b[p + 3]
                cands.append(
                    (tot + np.float32(lam * BITS_BO), SAO_BO, p,
                     [o_b[p + k] for k in range(4)])
                )
            best = min(range(len(cands)), key=lambda i: cands[i][0])
            _, t, pos, offs = cands[best]
            tmap[ty, tx] = t
            bmap[ty, tx] = pos
            omap[ty, tx] = offs
    return tmap, bmap, omap


class TestEstimatorOracle:
    @pytest.mark.parametrize("seed,scale", [(0, 0.0), (1, 1.0), (2, 0.1)])
    def test_device_matches_oracle(self, seed, scale):
        rng = np.random.default_rng(seed)
        h, w, tile, qp = 24, 40, 16, 30
        base = np.linspace(0, 255, w)[None, :] * np.ones((h, 1))
        src = np.clip(base + rng.integers(-8, 9, (h, w)), 0, 255).astype(int)
        rec = np.clip(base // 16 * 16, 0, 255).astype(int)
        lam = scale * 0.57 * 2.0 ** ((qp - 12) / 3.0)
        want = oracle_estimate_tiled(src, rec, tile, lam)
        t, b, o = estimate_sao_ctb(
            jnp.asarray(src, jnp.int32), jnp.asarray(rec, jnp.int32),
            tile, jnp.int32(qp), rd_lambda_scale=scale, merge=False,
        )
        assert np.array_equal(np.asarray(t), want[0])
        assert np.array_equal(np.asarray(b), want[1])
        assert np.array_equal(np.asarray(o), want[2])

    def test_merge_pass_never_worse_by_rd(self):
        """Merging only happens when it improves RD, so SSE after
        apply + lambda*signalled-bits never exceeds the no-merge run."""
        rng = np.random.default_rng(3)
        h, w, tile, qp = 64, 64, 16, 30
        src = jnp.asarray(rng.integers(0, 256, (h, w)), jnp.int32)
        rec = jnp.clip(
            src + jnp.asarray(rng.integers(-5, 6, (h, w)), jnp.int32),
            0, 255,
        )
        lam = 0.57 * 2.0 ** ((qp - 12) / 3.0)

        def rd(merge):
            t, b, o = estimate_sao_ctb(src, rec, tile, jnp.int32(qp),
                                       merge=merge)
            out = apply_sao_ctb(rec, t, b, o, tile)
            sse = float(((src - out) ** 2).sum())
            bits = 8 * len(write_sao_ctb_params(
                {"Y": (tile, np.asarray(t), np.asarray(b), np.asarray(o))}
            ))
            return sse + lam * bits

        assert rd(True) <= rd(False) + 1e-3

    def test_apply_full_plane_classification(self):
        """Tile boundaries must NOT behave like picture borders: a
        sample at a tile edge uses its true neighbor from the adjacent
        tile (full-plane classification, the spec behavior)."""
        h = w = 32
        tile = 16
        rec = np.full((h, w), 100, np.int32)
        rec[:, 16] = 90        # local minimum column at the tile seam
        tmap = np.full((2, 2), SAO_EO0, np.int32)   # EO class 0 (horizontal)
        omap = np.tile(np.array([7, 0, 0, 0], np.int32), (2, 2, 1))
        out = np.asarray(apply_sao_ctb(
            jnp.asarray(rec), jnp.asarray(tmap),
            jnp.zeros((2, 2), jnp.int32), jnp.asarray(omap), tile,
        ))
        # col 16 samples are category 1 (minimum) only if the left
        # neighbor (col 15, the other tile) is seen
        assert (out[:, 16] == 97).all()
        assert (out[1:-1, 15] == 100).all()


class TestNalSyntax:
    def test_roundtrip_random(self):
        rng = np.random.default_rng(0)
        for trial in range(4):
            sao = {}
            for name in ("Y", "U", "V")[: int(rng.integers(1, 4))]:
                nty, ntx = int(rng.integers(1, 6)), int(rng.integers(1, 7))
                t = rng.integers(0, 6, (nty, ntx)).astype(np.int32)
                b = np.where(t == SAO_BO,
                             rng.integers(0, 29, (nty, ntx)), 0
                             ).astype(np.int32)
                o = np.where((t > 0)[..., None],
                             rng.integers(-7, 8, (nty, ntx, 4)), 0
                             ).astype(np.int32)
                sao[name] = (64, t, b, o)
            back = parse_sao_ctb_params(write_sao_ctb_params(sao))
            for name, (tile, t, b, o) in sao.items():
                assert back[name][0] == tile
                assert np.array_equal(back[name][1], t)
                assert np.array_equal(back[name][2], b)
                assert np.array_equal(back[name][3], o)

    def test_merge_shrinks_payload(self):
        t = np.full((8, 8), SAO_EO0 + 2, np.int32)
        o = np.tile(np.array([3, 1, -1, -3], np.int32), (8, 8, 1))
        b = np.zeros((8, 8), np.int32)
        uniform = write_sao_ctb_params({"Y": (64, t, b, o)})
        rng = np.random.default_rng(1)
        t2 = rng.integers(1, 5, (8, 8)).astype(np.int32)
        o2 = rng.integers(-7, 8, (8, 8, 4)).astype(np.int32)
        mixed = write_sao_ctb_params({"Y": (64, t2, b, o2)})
        # uniform: 1 full tile + 63 one-bit merges ~ 11 bytes payload
        assert len(uniform) * 4 < len(mixed)

    def test_corruption_rejected(self):
        t = np.full((2, 2), SAO_BO, np.int32)
        b = np.full((2, 2), 10, np.int32)
        o = np.ones((2, 2, 4), np.int32)
        pay = write_sao_ctb_params({"Y": (64, t, b, o)})
        for bad in (b"NX\x01", pay[:6], pay[:-2]):
            with pytest.raises(CorruptBitstreamError):
                parse_sao_ctb_params(bad)

    def test_10bit_offsets(self):
        """Offset field width follows bit depth (cap 31 at 10-bit)."""
        t = np.full((1, 2), SAO_BO, np.int32)
        b = np.zeros((1, 2), np.int32)
        o = np.array([[[31, -31, 15, -15], [1, 2, 3, 4]]], np.int32)
        back = parse_sao_ctb_params(
            write_sao_ctb_params({"Y": (64, t, b, o)}, bit_depth=10)
        )
        assert np.array_equal(back["Y"][3], o)


class TestEncoderIntegration:
    # slow: ~36-56 s each (full closed-loop SAO-CTB encode+decode
    # compile).  Fast-profile coverage of SAO-CTB: the estimator/apply
    # oracle parity below; the full roundtrip rides --slow and the
    # sequence bench's loop-filter A/B decodes on the real chip.
    @pytest.mark.slow
    @pytest.mark.parametrize("h,w,tile", [(96, 128, 32), (72, 100, 64)])
    def test_roundtrip_pixel_exact(self, h, w, tile):
        from nanohevc_tpu.config import EncoderConfig
        from nanohevc_tpu.models.all_intra import create_test_frame
        from nanohevc_tpu.models.wavefront import (
            decode_frame,
            encode_frame_closed_loop,
        )

        frame = create_test_frame(h, w)
        cfg = EncoderConfig(qp=32, sao_ctb=True, sao_tile=tile,
                            deblock=True)
        rec, bs = encode_frame_closed_loop(frame, cfg)
        dec = decode_frame(bs)
        for name in ("y", "u", "v"):
            assert np.array_equal(
                getattr(rec, name).data, getattr(dec, name).data
            ), name

    @pytest.mark.slow   # ~28 s full encode; the estimator-oracle tests keep SAO-CTB correctness fast
    def test_dropped_ctb_nal_fails_loudly(self):
        from nanohevc_tpu.config import EncoderConfig
        from nanohevc_tpu.models.all_intra import create_test_frame
        from nanohevc_tpu.models.wavefront import (
            decode_frame,
            encode_frame_closed_loop,
        )
        from nanohevc_tpu.runtime import entropy
        from nanohevc_tpu.runtime.bitstream import (
            _split_nals,
            parse_bitstream,
        )

        frame = create_test_frame(32, 48)
        _, bs = encode_frame_closed_loop(
            frame, EncoderConfig(qp=30, sao_ctb=True, sao_tile=16)
        )
        assert parse_bitstream(bs)["params"]["sao_enabled"]
        stripped = b"".join(
            entropy.wrap_nal(t, p) for t, p in _split_nals(bs)
            if t != entropy.NAL_SAO
        )
        with pytest.raises(CorruptBitstreamError, match="SAO"):
            decode_frame(stripped)

    def test_config_exclusivity(self):
        from nanohevc_tpu.config import EncoderConfig

        with pytest.raises(ValueError, match="exclusive"):
            EncoderConfig(sao=True, sao_ctb=True)
        with pytest.raises(ValueError, match="power of two"):
            EncoderConfig(sao_ctb=True, sao_tile=48)

    @pytest.mark.slow   # ~54 s multi-frame end-to-end
    def test_sequence_roundtrip(self, tmp_path):
        from nanohevc_tpu.config import EncoderConfig
        from nanohevc_tpu.models.sequence import (
            decode_sequence,
            encode_sequence,
        )

        rng = np.random.default_rng(9)
        h, w, nframes = 48, 64, 3
        raw = tmp_path / "in.yuv"
        frames = []
        for _ in range(nframes):
            y = rng.integers(0, 256, (h, w), dtype=np.uint8)
            u = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
            v = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
            frames.append((y, u, v))
        with open(raw, "wb") as f:
            for y, u, v in frames:
                f.write(y.tobytes() + u.tobytes() + v.tobytes())
        bs_path = str(tmp_path / "out.bin")
        cfg = EncoderConfig(qp=30, sao_ctb=True, sao_tile=16)
        encode_sequence(str(raw), w, h, nframes, cfg, bs_path,
                        batch=2, closed_loop=True)
        out_path = str(tmp_path / "dec.yuv")
        n = decode_sequence(bs_path, out_path)
        assert n == nframes
        # decode must equal a fresh single-frame encode's recon
        from nanohevc_tpu.frame import Frame, Plane
        from nanohevc_tpu.models.wavefront import encode_frame_closed_loop

        dec = np.fromfile(out_path, np.uint8)
        fsz = h * w * 3 // 2
        for i, (y, u, v) in enumerate(frames):
            fr = Frame(Plane(y.astype(np.int16)), Plane(u.astype(np.int16)),
                       Plane(v.astype(np.int16)))
            rec, _ = encode_frame_closed_loop(fr, cfg)
            got_y = dec[i * fsz : i * fsz + h * w].reshape(h, w)
            assert np.array_equal(got_y, rec.y.data.astype(np.uint8)), i
