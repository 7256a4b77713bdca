"""MPM intra-mode syntax (spec 8.4.2.2 candidate derivation).

The native coder (nanohevc_runtime.cpp nhr_encode_modes) derives the
3-entry most-probable-mode list from left/above neighbor modes and
codes prev_intra_pred_flag + mpm_idx / rem_intra_pred_mode.  These
tests pin the derivation against hand-derived spec examples via a
Python twin, round-trip the coder across grids and contents, verify
the rate win over the generic level syntax, and drive the bitstream
integration including the unknown-grid fallback.
"""

import numpy as np
import pytest

from nanohevc_tpu.runtime import entropy as E
from nanohevc_tpu.runtime.bitstream import (
    _mode_grid,
    assemble_bitstream,
    parse_bitstream,
)


def mpm_list(a: int, b: int) -> list:
    """Python twin of the native candModeList derivation (8.4.2.2)."""
    if a == b:
        if a < 2:
            return [0, 1, 26]
        return [a, 2 + ((a + 29) % 32), 2 + ((a - 2 + 1) % 32)]
    third = 0 if (a != 0 and b != 0) else (26 if a + b < 2 else 1)
    return [a, b, third]


def reference_encode_decode(modes: np.ndarray, nby: int, nbx: int):
    """Independent model of the syntax: returns the decoder's output
    given the symbol stream the encoder would produce — exercising the
    rem mapping (sorted-MPM skip) both ways without arithmetic coding."""
    out = np.empty(nby * nbx, np.int32)
    grid = modes.reshape(nby, nbx)
    for y in range(nby):
        for x in range(nbx):
            a = int(out.reshape(nby, nbx)[y, x - 1]) if x > 0 else 1
            b = int(out.reshape(nby, nbx)[y - 1, x]) if y > 0 else 1
            m = mpm_list(a, b)
            mode = int(grid[y, x])
            if mode in m:
                out.reshape(nby, nbx)[y, x] = m[m.index(mode)]
            else:
                s = sorted(m)
                rem = mode - sum(1 for v in s if mode > v)
                dec = rem
                for v in s:
                    if dec >= v:
                        dec += 1
                out.reshape(nby, nbx)[y, x] = dec
    return out


class TestMpmDerivation:
    @pytest.mark.parametrize(
        "a,b,want",
        [
            (1, 1, [0, 1, 26]),      # both DC (incl. unavailable)
            (0, 0, [0, 1, 26]),      # both planar
            (10, 10, [10, 9, 11]),   # angular: +-1 neighbors
            (2, 2, [2, 33, 3]),      # wraparound below mode 2
            (34, 34, [34, 33, 3]),   # wraparound above mode 34
            (26, 26, [26, 25, 27]),
            (0, 1, [0, 1, 26]),      # planar+DC -> vertical third
            (1, 0, [1, 0, 26]),
            (0, 5, [0, 5, 1]),       # planar present -> DC third
            (5, 1, [5, 1, 0]),       # DC present -> planar third
            (3, 7, [3, 7, 0]),       # both angular -> planar third
        ],
    )
    def test_candidate_list(self, a, b, want):
        assert mpm_list(a, b) == want

    def test_rem_mapping_is_identity(self):
        """The sorted-skip rem mapping inverts exactly for every mode
        and every neighbor pair (the coder relies on it)."""
        for a in range(35):
            for b in range(35):
                m = mpm_list(a, b)
                s = sorted(m)
                for mode in range(35):
                    if mode in m:
                        continue
                    rem = mode - sum(1 for v in s if mode > v)
                    assert 0 <= rem <= 31
                    dec = rem
                    for v in s:
                        if dec >= v:
                            dec += 1
                    assert dec == mode


class TestModeCoder:
    @pytest.mark.parametrize("nby,nbx", [(1, 1), (1, 9), (9, 1), (6, 11)])
    def test_roundtrip_random(self, nby, nbx):
        rng = np.random.default_rng(nby * 100 + nbx)
        m = rng.integers(0, 35, nby * nbx).astype(np.int32)
        assert np.array_equal(
            E.decode_modes(E.encode_modes(m, nby, nbx), nby, nbx), m
        )

    def test_roundtrip_all_modes_coherent(self):
        """Every mode value appears; strong spatial coherence."""
        nby = nbx = 35
        m = np.repeat(np.arange(35, dtype=np.int32), 35).reshape(nby, nbx)
        pay = E.encode_modes(m.reshape(-1), nby, nbx)
        assert np.array_equal(
            E.decode_modes(pay, nby, nbx), m.reshape(-1)
        )

    def test_rate_beats_generic_on_coherent_field(self):
        m = np.full((64, 120), 26, np.int32)
        m[20:30, 40:70] = 10
        pay = E.encode_modes(m.reshape(-1), 64, 120)
        gen = E.encode_levels(m.reshape(-1, 1))
        assert len(pay) * 10 < len(gen)     # >10x on coherent content

    def test_rate_beats_generic_on_random(self):
        rng = np.random.default_rng(0)
        m = rng.integers(0, 35, 135 * 240).astype(np.int32)
        pay = E.encode_modes(m, 135, 240)
        gen = E.encode_levels(m.reshape(-1, 1))
        assert len(pay) < len(gen)          # even the worst case wins

    def test_out_of_range_mode_rejected(self):
        with pytest.raises(ValueError, match="range"):
            E.encode_modes(np.array([35], np.int32), 1, 1)
        with pytest.raises(ValueError, match="range"):
            E.encode_modes(np.array([-1], np.int32), 1, 1)

    def test_corruption_rejected(self):
        m = np.full(100, 26, np.int32)
        pay = E.encode_modes(m, 10, 10)
        with pytest.raises(E.CorruptBitstreamError):
            E.decode_modes(pay[:-2] + b"\x00\x00", 10, 10)
        with pytest.raises(E.CorruptBitstreamError):
            E.decode_modes(pay[:2], 10, 10)

    def test_syntax_matches_independent_model(self):
        """Coder output == the pure-Python syntax model (an identity
        map for valid inputs, but exercised through the rem path)."""
        rng = np.random.default_rng(7)
        m = rng.integers(0, 35, 12 * 17).astype(np.int32)
        got = E.decode_modes(E.encode_modes(m, 12, 17), 12, 17)
        want = reference_encode_decode(m, 12, 17)
        assert np.array_equal(got, want)
        assert np.array_equal(want, m)


class TestBitstreamIntegration:
    def test_grid_predicate(self):
        assert _mode_grid(36, 48, 48, 8, 0) == (6, 6)        # exact
        assert _mode_grid(56, 52, 61, 8, 0) == (8, 7)        # ceil
        assert _mode_grid(42, 52, 61, 8, 0) == (7, 6)        # floor
        assert _mode_grid(7, 48, 48, 8, 0) is None           # unknown
        assert _mode_grid(42, 52, 61, 4, 1) == (7, 6)        # chroma half

    @pytest.mark.parametrize("kind", ["exact", "ceil", "floor", "unknown"])
    def test_stream_roundtrip(self, kind):
        rng = np.random.default_rng(3)
        w = h = 48 if kind == "exact" else 52
        bs = 8
        if kind == "unknown":
            nb = 7
        elif kind == "floor":
            nb = (h // bs) * (w // bs)
        else:
            nb = (-(-h // bs)) * (-(-w // bs))
        levels = rng.integers(-4, 5, (nb, bs * bs)).astype(np.int32)
        modes = rng.integers(0, 35, nb).astype(np.int32)
        stream = assemble_bitstream(
            w, h, 30, {"Y": (levels, bs)}, {"Y": modes}
        )
        p = parse_bitstream(stream)
        assert p["params"]["mode_mpm"] is True
        assert np.array_equal(p["Y"]["levels"], levels)
        assert np.array_equal(p["Y"]["modes"], modes)

    def test_mode_bytes_shrink_on_real_stream(self):
        """A coherent mode field's slice gets materially smaller than
        the same stream coded pre-MPM (generic syntax)."""
        m = np.full(36 * 36, 26, np.int32)
        mpm = E.encode_modes(m, 36, 36)
        gen = E.encode_levels(m.reshape(-1, 1))
        assert len(mpm) < len(gen) / 20


class TestDeviceModeRate:
    """ops/mode_rate.py: the RD decision's device-side mode-rate term
    must mirror the native coder's candModeList and bin counts
    (round-4 verdict item 5)."""

    def test_lists_match_twin_all_pairs(self):
        import jax.numpy as jnp

        from nanohevc_tpu.ops.mode_rate import mpm_lists

        a, b = np.meshgrid(np.arange(35), np.arange(35), indexing="ij")
        got = np.asarray(mpm_lists(jnp.asarray(a), jnp.asarray(b)))
        for i in range(35):
            for j in range(35):
                assert got[i, j].tolist() == mpm_list(i, j), (i, j)

    def test_mode_bits_values_all_pairs(self):
        import jax.numpy as jnp

        from nanohevc_tpu.ops.mode_rate import mpm_mode_bits

        a, b = np.meshgrid(np.arange(35), np.arange(35), indexing="ij")
        bits = np.asarray(
            mpm_mode_bits(jnp.asarray(a.ravel()), jnp.asarray(b.ravel()))
        ).reshape(35, 35, 35)
        for i in range(0, 35, 5):
            for j in range(0, 35, 7):
                m = mpm_list(i, j)
                for mode in range(35):
                    want = (
                        2.0 if mode == m[0]
                        else 3.0 if mode in m[1:]
                        else 6.0
                    )
                    assert bits[i, j, mode] == want, (i, j, mode)

    def test_neighbor_planes_follow_raster_order(self):
        import jax.numpy as jnp

        from nanohevc_tpu.ops.mode_rate import neighbor_modes_grid

        g = jnp.arange(12, dtype=jnp.int32).reshape(3, 4)
        a, b = neighbor_modes_grid(g)
        assert np.array_equal(
            np.asarray(a),
            [[1, 0, 1, 2], [1, 4, 5, 6], [1, 8, 9, 10]],
        )
        assert np.array_equal(
            np.asarray(b),
            [[1, 1, 1, 1], [0, 1, 2, 3], [4, 5, 6, 7]],
        )

    def test_static_bits_upper_bound_coder_actuals(self):
        """Total static-bin estimate (with the decoder's true neighbor
        lists, i.e. final modes) upper-bounds the adaptive coder's
        actual bytes on coherent AND random fields, and tracks within
        2x — the estimate is a sound RD price."""
        import jax.numpy as jnp

        from nanohevc_tpu.ops.mode_rate import mode_bits_for_grid

        rng = np.random.default_rng(11)
        fields = {
            "coherent": np.full((24, 30), 26, np.int32),
            "patchy": np.where(
                rng.random((24, 30)) < 0.1,
                rng.integers(0, 35, (24, 30)),
                10,
            ).astype(np.int32),
            "random": rng.integers(0, 35, (24, 30)).astype(np.int32),
        }
        for name, grid in fields.items():
            bits = np.asarray(mode_bits_for_grid(jnp.asarray(grid)))
            est = bits[np.arange(grid.size), grid.ravel()].sum()
            actual = 8 * len(E.encode_modes(grid.ravel(), *grid.shape))
            # trailer/flush overhead ~8 bytes; contexts only help
            assert actual <= est + 64, (name, actual, est)
            if name == "random":
                # where contexts cannot learn, the static price tracks
                # (coherent fields compress far below it — that slack
                # is the adaptive coder's win, not a model error)
                assert est <= 1.5 * actual, (name, actual, est)

    @pytest.mark.slow   # ~11 s 35-mode RD; the rate-model bound checks stay fast
    def test_rd_grid_term_increases_mode_coherence(self):
        """decision='rd' with the grid term must produce a mode field
        at least as cheap to signal as without it (the term's whole
        point), measured by the real coder."""
        import jax.numpy as jnp

        from nanohevc_tpu.models.all_intra import decide_modes
        from nanohevc_tpu import ops

        rng = np.random.default_rng(5)
        h = w = 64
        n = 8
        base = np.linspace(0, 255, w, dtype=np.int32)[None, :]
        plane = jnp.asarray(
            np.clip(base + rng.integers(-20, 21, (h, w)), 0, 255)
        )
        blocks = ops.tile_plane(plane, n)
        refs = ops.extract_refs(plane, n, boundary=128)
        kw = dict(qp=40, rd_lambda_scale=4.0)
        _, m_no = decide_modes(blocks, refs, n, "all", "rd", **kw)
        _, m_gr = decide_modes(
            blocks, refs, n, "all", "rd", grid=(h // n, w // n), **kw
        )
        nby = nbx = h // n
        by_no = len(E.encode_modes(np.asarray(m_no), nby, nbx))
        by_gr = len(E.encode_modes(np.asarray(m_gr), nby, nbx))
        assert by_gr <= by_no, (by_gr, by_no)
