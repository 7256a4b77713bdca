"""Rate model vs the real range coder: accuracy and RD improvement.

Round-1 weak point #4: the rdo_cbf decision used the reference-style
heuristic sum(log2(|l|+1)) + 2*nnz.  The model under test
(ops/rate.py) is calibrated against the shipped adaptive coder and
must (a) track the coder's true bits closely, and (b) make better RD
decisions than the heuristic under true-bit accounting.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from nanohevc_tpu import ops
from nanohevc_tpu.models.all_intra import encode_plane_full
from nanohevc_tpu.runtime.entropy import block_bits, encode_levels


def _content(kind, h, w, rng):
    yy, xx = np.mgrid[0:h, 0:w]
    if kind == "gradient":
        img = yy * 1.3 + xx * 0.9 + 25 * np.sin(xx / 9) + rng.normal(0, 8, (h, w))
    elif kind == "noise":
        img = rng.normal(128, 35, (h, w))
    else:
        img = np.where((xx // 8 + yy // 8) % 2 == 0, 70, 180) + rng.normal(
            0, 5, (h, w)
        )
    return img.clip(0, 255).astype(np.int32)


def _levels(kind, qp, n=8, seed=1):
    rng = np.random.default_rng(seed)
    plane = jnp.asarray(_content(kind, 96, 160, rng))
    out = encode_plane_full(plane, jnp.int32(qp), n=n, use_dst=(n == 4))
    return np.asarray(out["levels"])


class TestCoderGroundTruth:
    def test_block_bits_matches_encoded_size(self):
        """nhr_block_bits sums to the actual compressed byte count."""
        for kind, qp in (("gradient", 18), ("noise", 26), ("flat", 30)):
            lv = _levels(kind, qp)
            bits = block_bits(lv)
            # minus container overhead: tile table (2 + 4) + checksum (4)
            nbytes = len(encode_levels(lv)) - 10
            # range-coder flush adds ~4 bytes; allow 1% + flush slack
            assert abs(bits.sum() / 8.0 - nbytes) <= nbytes * 0.01 + 8, (
                kind, bits.sum() / 8.0, nbytes,
            )

    def test_block_bits_positive_and_ordered(self):
        lv = _levels("gradient", 22)
        bits = block_bits(lv)
        assert (bits > 0).all()
        dense = np.abs(lv).sum(axis=1)
        # strongly coded blocks cost more than empty ones on average
        assert bits[dense > 0].mean() > bits[dense == 0].mean()


class TestDeviceRateModel:
    @pytest.mark.parametrize("kind,qp", [
        ("gradient", 14), ("gradient", 26), ("noise", 22), ("flat", 30),
        ("flat", 20), ("noise", 34),
    ])
    def test_adaptive_tracks_coder_bits(self, kind, qp):
        """Per-frame totals within 25% of the real coder across content
        types (measured 10-17%), always positively correlated — where
        the heuristic is off 40-100% and can anti-correlate."""
        lv = _levels(kind, qp, seed=2)       # held out from calibration
        truth = block_bits(lv)
        model = np.asarray(ops.rate_model_bits_adaptive(jnp.asarray(lv)))
        total_err = abs(model.sum() - truth.sum()) / max(truth.sum(), 1.0)
        assert total_err < 0.25, (kind, qp, total_err)
        if truth.std() > 0 and model.std() > 0:
            assert np.corrcoef(model, truth)[0, 1] > 0.2, (kind, qp)

    @pytest.mark.parametrize("kind,qp", [
        ("gradient", 14), ("gradient", 26), ("noise", 22),
    ])
    def test_adaptive_beats_heuristic(self, kind, qp):
        lv = _levels(kind, qp, seed=2)
        truth = block_bits(lv)
        model = np.asarray(ops.rate_model_bits_adaptive(jnp.asarray(lv)))
        heur = np.asarray(ops.estimate_bits_blocks(jnp.asarray(lv)))
        assert np.abs(model - truth).mean() < np.abs(heur - truth).mean()
        m_err = abs(model.sum() - truth.sum())
        h_err = abs(heur.sum() - truth.sum())
        assert m_err < h_err, (kind, qp, m_err, h_err)

    def test_static_table_model(self):
        """The committed calibrated table tracks mixed content it was
        fit on (cheaper than the adaptive model; no frame statistics).

        Coded and uncoded blocks are judged separately: a static table
        cannot follow the adaptive coder's cbf context converging to
        near-zero cost over a long uncoded run (a <0.9-bit absolute
        error per block), and under the last-position syntax uncoded
        runs dominate the stream total, so a single whole-stream ratio
        would only measure that convergence artifact."""
        lv = _levels("gradient", 26, seed=2)
        truth = block_bits(lv)
        model = np.asarray(ops.rate_model_bits(jnp.asarray(lv)))
        coded = (lv != 0).any(axis=1)
        t_coded = truth[coded].sum()
        assert abs(model[coded].sum() - t_coded) / max(t_coded, 1) < 0.35
        assert np.abs(model[~coded] - truth[~coded]).max() < 0.9

    @pytest.mark.slow   # ~11 s 4x4 stream encode; the 8x8 calibration checks stay fast
    def test_4x4_stream(self):
        lv = _levels("gradient", 20, n=4, seed=3)
        truth = block_bits(lv)
        model = np.asarray(ops.rate_model_bits_adaptive(jnp.asarray(lv)))
        assert abs(model.sum() - truth.sum()) / max(truth.sum(), 1) < 0.25


def _mixed(h, w, rng):
    yy, xx = np.mgrid[0:h, 0:w]
    img = 128 + 40 * np.sin(yy / 5) * np.cos(xx / 11) + rng.normal(0, 12, (h, w))
    img[h // 3 :, :] += (xx[h // 3 :, :] % 32) * 1.5
    return img.clip(0, 255).astype(np.int32)


class TestRDOWithRealRates:
    """At the standard lambda this codec's cbf decision boundary sits
    8-200x away from the rate term (measured), so rate accuracy only
    binds under rd_lambda_scale >> 1 — the rate-control regime.  The
    A/B below runs there.

    Operating points are calibrated to the last-position residual
    syntax: trailing zeros now cost ZERO real bits, which removed the
    heuristic's largest systematic error (it never priced positions),
    so the coder-vs-heuristic gap is narrower than under the round-2
    all-positions syntax — the assertions bound the gap that remains."""

    def test_decisions_change_vs_heuristic(self):
        """The coder-rate RD must flip skip decisions relative to the
        heuristic where the heuristic disagrees with measured bits."""
        rng = np.random.default_rng(0)
        plane = jnp.asarray(_mixed(96, 160, rng))
        a = encode_plane_full(plane, jnp.int32(28), n=8, rdo_cbf=True,
                              rate_mode="coder", rd_lambda_scale=128.0)
        b = encode_plane_full(plane, jnp.int32(28), n=8, rdo_cbf=True,
                              rate_mode="heuristic", rd_lambda_scale=128.0)
        skips_a = np.asarray(a["nnz"]) == 0
        skips_b = np.asarray(b["nnz"]) == 0
        assert (skips_a != skips_b).any(), "no decision changed"

    def test_rd_cost_improves_under_true_bits(self):
        """J = SSE + lambda * true_bits across the rate-control sweep:
        coder rates must win in aggregate and never lose."""
        rng = np.random.default_rng(0)
        plane = jnp.asarray(_mixed(96, 160, rng))
        src = np.asarray(plane)
        ratios = []
        for qp, ls in ((22, 512.0), (28, 128.0), (28, 256.0)):
            lam = ls * 0.57 * 2.0 ** ((qp - 12.0) / 3.0)

            def j_of(out):
                recon = np.asarray(out["recon"]).astype(np.int64)
                sse = ((recon - src) ** 2).sum()
                bits = block_bits(np.asarray(out["levels"])).sum()
                return sse + lam * bits

            ja = j_of(encode_plane_full(
                plane, jnp.int32(qp), n=8, rdo_cbf=True,
                rate_mode="coder", rd_lambda_scale=ls))
            jb = j_of(encode_plane_full(
                plane, jnp.int32(qp), n=8, rdo_cbf=True,
                rate_mode="heuristic", rd_lambda_scale=ls))
            ratios.append(ja / jb)
        assert np.mean(ratios) < 0.985, ratios     # aggregate win
        assert max(ratios) < 1.005, ratios         # never loses

    def test_bits_improve_at_matched_psnr(self):
        """At matched quality (within 0.15 dB), the coder-rate decision
        spends fewer real bytes.  Operating points from a lambda sweep
        under the last-position syntax: at the same lambda the
        heuristic keeps blocks whose true cost exceeds their gain."""
        rng = np.random.default_rng(0)
        plane = jnp.asarray(_mixed(96, 160, rng))
        src = np.asarray(plane).astype(np.float64)

        def point(mode, qp, ls):
            out = encode_plane_full(plane, jnp.int32(qp), n=8, rdo_cbf=True,
                                    rate_mode=mode, rd_lambda_scale=ls)
            recon = np.asarray(out["recon"]).astype(np.float64)
            mse = ((recon - src) ** 2).mean()
            psnr = 10 * np.log10(255.0 ** 2 / mse)
            return psnr, len(encode_levels(np.asarray(out["levels"])))

        for qp, ls in ((22, 512.0), (28, 256.0)):
            p_c, b_c = point("coder", qp, ls)
            p_h, b_h = point("heuristic", qp, ls)
            assert abs(p_c - p_h) < 0.15, (qp, p_c, p_h)  # same quality band
            assert b_c < b_h, (qp, b_c, b_h)              # fewer real bytes
