"""Encoder pipeline tests: parity vs per-block oracle simulation, full
pipeline loss bounds, config validation, demo frame, CLI smoke."""

import io
import os
import sys

import numpy as np
import pytest

from nanohevc_tpu import ref as oracle
from nanohevc_tpu.config import EncoderConfig
from nanohevc_tpu.frame import Frame, Plane
from nanohevc_tpu.models.all_intra import (
    create_test_frame,
    encode_frame_full,
    encode_frame_intra,
)


def simulate_parity_plane(plane: np.ndarray, n: int):
    """Reference encode semantics, per block, using the numpy oracle."""
    h, w = plane.shape
    recon = np.zeros((h, w), np.int16)
    dc_count = planar_count = 0
    for y0 in range(0, h - n + 1, n):
        for x0 in range(0, w - n + 1, n):
            orig = plane[y0 : y0 + n, x0 : x0 + n]
            top = (
                np.full(n, 128, np.int16)
                if y0 == 0
                else plane[y0 - 1, x0 : x0 + n].astype(np.int16)
            )
            left = (
                np.full(n, 128, np.int16)
                if x0 == 0
                else plane[y0 : y0 + n, x0 - 1].astype(np.int16)
            )
            dc = oracle.intra_dc_predict(top, left, n)
            pl = oracle.intra_planar_predict(top, left, int(top[-1]), int(left[-1]), n)
            e_dc = oracle.residual_energy(oracle.residual_block(orig, dc))
            e_pl = oracle.residual_energy(oracle.residual_block(orig, pl))
            if e_dc <= e_pl:
                best, = (dc,)
                dc_count += 1
            else:
                best, = (pl,)
                planar_count += 1
            recon[y0 : y0 + n, x0 : x0 + n] = oracle.clip_to_pixel_range(best)
    return recon, dc_count, planar_count


def random_frame(rng, h, w):
    y = rng.integers(0, 256, (h, w)).astype(np.int16)
    u = rng.integers(0, 256, (h // 2, w // 2)).astype(np.int16)
    v = rng.integers(0, 256, (h // 2, w // 2)).astype(np.int16)
    return Frame(Plane(y), Plane(u), Plane(v))


class TestParityEncode:
    @pytest.mark.parametrize("bs", [4, 8, 16])
    def test_matches_per_block_simulation(self, bs):
        rng = np.random.default_rng(0)
        frame = random_frame(rng, 48, 64)
        recon, stats = encode_frame_intra(frame, bs)
        dc = planar = blocks = 0
        chroma_bs = max(4, bs // 2)
        for name, src, got in (
            ("Y", frame.y, recon.y),
            ("U", frame.u, recon.u),
            ("V", frame.v, recon.v),
        ):
            n = bs if name == "Y" else chroma_bs
            want, d, p = simulate_parity_plane(src.data, n)
            assert np.array_equal(got.data, want), f"plane {name}"
            dc += d
            planar += p
            blocks += d + p
        assert stats == {"dc": dc, "planar": planar, "blocks": blocks}

    def test_output_file(self, tmp_path):
        frame = create_test_frame(32, 32)
        out = tmp_path / "out.yuv"
        encode_frame_intra(frame, 8, str(out))
        assert out.stat().st_size == 32 * 32 * 3 // 2

    def test_structured_frame_prefers_planar_on_gradients(self):
        frame = create_test_frame(64, 64)
        _, stats = encode_frame_intra(frame, 8)
        assert stats["blocks"] == 64 + 64 + 64  # chroma bs=4
        assert stats["planar"] > 0 and stats["dc"] > 0


class TestFullPipeline:
    # NOTE: quality assertions use 4x4 blocks — the behavioral contract's
    # quant/dequant chain (reference quant.py:82-123) omits the size-
    # dependent rescale real HEVC applies, so only 4x4 is gain-correct;
    # larger sizes attenuate the coded residual by 2^(log2 N - 2).
    @pytest.mark.parametrize("mode_set", [
        "dc_planar",
        # slow: the 35-mode RD compile alone is ~58 s on this box; the
        # dc_planar case keeps the quality contract in the fast profile
        pytest.param("all", marks=pytest.mark.slow),
    ])
    def test_low_qp_high_quality(self, mode_set):
        frame = create_test_frame(64, 64)
        cfg = EncoderConfig(block_size=4, qp=10, mode_set=mode_set,
                            decision="satd" if mode_set == "all" else "energy")
        recon, info = encode_frame_full(frame, cfg)
        assert info["psnr_y"] > 42.0
        assert info["blocks"] == 256 + 64 + 64  # luma 4x4, chroma 4x4

    @pytest.mark.slow   # ~11 s three QP compiles; quality contract stays via low_qp case
    def test_quality_monotone_in_qp(self):
        frame = create_test_frame(64, 64)
        psnrs = []
        for qp in (10, 30, 48):
            _, info = encode_frame_full(frame, EncoderConfig(block_size=4, qp=qp))
            psnrs.append(info["psnr_y"])
        assert psnrs[0] > psnrs[1] > psnrs[2]

    @pytest.mark.slow   # ~62 s cold 35-mode compile; quality contract stays via dc_planar cases
    def test_mode_search_improves_quality(self):
        frame = create_test_frame(64, 64)
        _, a = encode_frame_full(
            frame, EncoderConfig(block_size=4, qp=10, mode_set="dc_planar")
        )
        _, b = encode_frame_full(
            frame,
            EncoderConfig(block_size=4, qp=10, mode_set="all", decision="satd"),
        )
        assert b["psnr_y"] > a["psnr_y"] + 2.0  # angular modes win on gradients

    def test_levels_shape_and_scan(self):
        frame = create_test_frame(32, 32)
        _, info = encode_frame_full(frame, EncoderConfig(block_size=8, qp=22))
        y = info["planes"]["Y"]
        assert y["levels"].shape == (16, 64)
        assert y["modes"].shape == (16,)

    def test_full_block_roundtrip_error_bound(self):
        """QP20 loss on noise-like content stays bounded (mean < 10)."""
        rng = np.random.default_rng(5)
        frame = random_frame(rng, 32, 32)
        # compress the random range so prediction is meaningful
        frame.y.data[:] = (frame.y.data // 4 + 96).astype(np.int16)
        recon, _ = encode_frame_full(frame, EncoderConfig(block_size=4, qp=20))
        err = np.abs(recon.y.data.astype(int) - frame.y.data.astype(int))
        assert err.mean() < 10 and err.max() < 40

    def test_contract_example_block_error(self):
        """The spec-walkthrough 4x4 block at QP20 reconstructs within the
        contract bound (<20 per pixel, reference tests/test_quant.py:280)."""
        orig = np.array(
            [[102, 101, 100, 100], [103, 102, 101, 100],
             [103, 102, 100, 99], [104, 101, 99, 98]],
            dtype=np.int16,
        )
        y = np.tile(orig, (2, 2)).astype(np.int16)
        frame = Frame(
            Plane(y),
            Plane(np.full((4, 4), 128, np.int16)),
            Plane(np.full((4, 4), 128, np.int16)),
        )
        recon, _ = encode_frame_full(frame, EncoderConfig(block_size=4, qp=20))
        err = np.abs(recon.y.data.astype(int) - y.astype(int))
        assert err.max() < 20


class TestConfig:
    def test_validation(self):
        with pytest.raises(ValueError):
            EncoderConfig(block_size=5)
        with pytest.raises(ValueError):
            EncoderConfig(mode_set="bogus")

    def test_chroma_block_size_floor(self):
        assert EncoderConfig(block_size=8).chroma_block_size() == 4
        assert EncoderConfig(block_size=4).chroma_block_size() == 4
        assert EncoderConfig(block_size=32).chroma_block_size() == 16

    def test_dst_rule(self):
        cfg = EncoderConfig(block_size=4)
        assert cfg.use_dst(4, is_luma=True)
        assert not cfg.use_dst(4, is_luma=False)
        assert not cfg.use_dst(8, is_luma=True)


class TestDemoFrame:
    def test_quadrants(self):
        f = create_test_frame(64, 64)
        y = f.y.data
        assert np.all(y[32:, :32] == 128)              # flat quadrant
        assert y[0, 0] == 50 and y[0, 31] == 200       # horizontal gradient
        assert y[32, 32] == 50 and y[63, 63] == 255 or y[63, 63] == 50 + 31 + 31


class TestCLI:
    def test_demo_runs(self, capsys):
        from nanohevc_tpu.cli import main

        main(["demo", "--width", "32", "--height", "32", "--block-size", "8"])
        out = capsys.readouterr().out
        assert "Total blocks: 16" in out
        assert "PSNR" in out

    def test_encode_roundtrip(self, tmp_path, capsys):
        from nanohevc_tpu.cli import main

        frame = create_test_frame(48, 48)
        src = tmp_path / "in.yuv"
        src.write_bytes(frame.to_yuv420p())
        out = tmp_path / "out.yuv"
        main(
            ["encode", str(src), "--width", "48", "--height", "48",
             "--block-size", "8", "-o", str(out)]
        )
        text = capsys.readouterr().out
        assert "Y-PSNR" in text
        assert out.stat().st_size == 48 * 48 * 3 // 2

    @pytest.mark.slow   # ~185 s: compiles the CLI's full pipeline stack
    def test_encode_full_pipeline(self, tmp_path, capsys):
        from nanohevc_tpu.cli import main

        frame = create_test_frame(32, 32)
        src = tmp_path / "in.yuv"
        src.write_bytes(frame.to_yuv420p())
        main(
            ["encode", str(src), "--width", "32", "--height", "32",
             "--pipeline", "full", "--qp", "24", "--mode-search"]
        )
        text = capsys.readouterr().out
        assert "Non-zero coefficients" in text

    def test_encode_short_file_errors(self, tmp_path, capsys):
        from nanohevc_tpu.cli import main

        src = tmp_path / "short.yuv"
        src.write_bytes(b"\x00" * 10)
        with pytest.raises(SystemExit):
            main(["encode", str(src), "--width", "64", "--height", "64"])
        assert "too small" in capsys.readouterr().out

    def test_platform_flag(self):
        """--platform cpu pins the backend for a FRESH CLI process.

        Must run in a subprocess: jax.config.update('jax_platforms')
        is a no-op once this process's backend is initialized (and
        would otherwise flip the rest of the suite's backend).  The
        axon TPU plugin registration is stripped so the child cannot
        hang on an unreachable device backend.
        """
        import os
        import subprocess
        import sys

        env = {
            k: v for k, v in os.environ.items()
            if k not in ("PALLAS_AXON_POOL_IPS", "JAX_PLATFORMS")
        }
        proc = subprocess.run(
            [sys.executable, "-m", "nanohevc_tpu", "--platform", "cpu",
             "demo", "--width", "16", "--height", "16",
             "--block-size", "8"],
            env=env, capture_output=True, text=True, timeout=600,
        )
        assert proc.returncode == 0, proc.stderr
        assert "PSNR" in proc.stdout

    def test_platform_env_validated(self, monkeypatch, capsys):
        """A bad NANOHEVC_PLATFORM fails with the clean choices error
        (argparse does not validate defaults against `choices`)."""
        from nanohevc_tpu.cli import main

        monkeypatch.setenv("NANOHEVC_PLATFORM", "gpu")
        with pytest.raises(SystemExit):
            main(["demo", "--width", "16", "--height", "16"])
        assert "invalid choice" in capsys.readouterr().err


class TestRDOCbf:
    def test_rdo_reduces_rate_and_bounds_quality_loss(self):
        frame = create_test_frame(64, 64)
        base_cfg = EncoderConfig(block_size=4, qp=30)
        rdo_cfg = EncoderConfig(block_size=4, qp=30, rdo_cbf=True)
        _, base = encode_frame_full(frame, base_cfg)
        _, rdo = encode_frame_full(frame, rdo_cfg)
        base_nnz = sum(p["nnz"] for p in base["planes"].values())
        rdo_nnz = sum(p["nnz"] for p in rdo["planes"].values())
        assert rdo_nnz <= base_nnz                      # never more rate
        assert rdo["psnr_y"] >= base["psnr_y"] - 1.0    # bounded loss

    def test_skip_rule_matches_numpy_recomputation(self):
        """The device skip decision equals the RD rule recomputed on host.

        Note: with the contract's dead-zone quantizer, coding a block is
        almost always RD-positive, so natural skips are rare — the rule
        is exercised by verifying the exact decision set (usually empty)
        and that unskipped outputs are untouched.
        """
        import jax.numpy as jnp
        from nanohevc_tpu import ops
        from nanohevc_tpu.models.all_intra import decide_modes, encode_plane_full

        rng = np.random.default_rng(40)
        plane = jnp.asarray(rng.integers(0, 256, (32, 32)).astype(np.int32))
        qp, n = 40, 4
        out = encode_plane_full(plane, jnp.int32(qp), n=n, rdo_cbf=True)
        base = encode_plane_full(plane, jnp.int32(qp), n=n)

        # host recomputation of the rule
        blocks = ops.tile_plane(plane, n)
        refs = ops.extract_refs(plane, n)
        pred, _ = decide_modes(blocks, refs, n, "dc_planar", "energy")
        lvl = ops.quantize(ops.forward_transform(blocks - pred), qp, n)
        rec = jnp.clip(pred + ops.inverse_transform(ops.dequantize(lvl, qp, n)), 0, 255)
        d_coded = np.asarray(ops.residual_energy_blocks(blocks - rec))
        d_skip = np.asarray(
            ops.residual_energy_blocks(blocks - jnp.clip(pred, 0, 255))
        )
        rate = np.asarray(ops.estimate_bits_blocks(lvl))
        lam = 0.57 * 2.0 ** ((qp - 12) / 3)
        want_skip = d_skip <= d_coded + lam * rate

        lv = np.asarray(out["levels"])
        bl = np.asarray(base["levels"])
        got_skip = (lv == 0).all(axis=1) & ~(bl == 0).all(axis=1)
        # skip set = rule ∧ (block had any coded level)
        coded = ~(bl == 0).all(axis=1)
        assert np.array_equal(got_skip, want_skip & coded)
        keep = ~got_skip
        assert np.array_equal(lv[keep], bl[keep])

    def test_off_by_default_matches_parity(self):
        frame = create_test_frame(32, 32)
        a = encode_frame_full(frame, EncoderConfig(block_size=8, qp=22))[1]
        b = encode_frame_full(
            frame, EncoderConfig(block_size=8, qp=22, rdo_cbf=False)
        )[1]
        for p in ("Y", "U", "V"):
            assert np.array_equal(a["planes"][p]["levels"], b["planes"][p]["levels"])


class TestTenBit:
    def test_10bit_roundtrip_and_boundary_fill(self):
        import jax.numpy as jnp
        from nanohevc_tpu.models.all_intra import encode_plane_full

        rng = np.random.default_rng(50)
        plane = jnp.asarray(
            (rng.integers(0, 1024, (32, 32)) // 4 + 384).astype(np.int32)
        )
        out = encode_plane_full(plane, jnp.int32(20), n=4, bit_depth=10)
        recon = np.asarray(out["recon"])
        assert recon.max() <= 1023 and recon.min() >= 0
        err = np.abs(recon - np.asarray(plane))
        assert err.mean() < 40  # 10-bit step is 4x the 8-bit one at eq QP

    def test_10bit_boundary_is_512(self):
        """Top-left block of a flat 10-bit frame predicts DC=512 from fill."""
        import jax.numpy as jnp
        from nanohevc_tpu import ops

        plane = jnp.full((8, 8), 700, jnp.int32)
        refs = ops.extract_refs(plane, 8, boundary=512)
        dc = ops.dc_predict(refs, 8)
        assert int(dc[0, 0, 0]) == 512

    def test_10bit_closed_loop_decode(self):
        import jax.numpy as jnp
        from nanohevc_tpu.models.wavefront import (
            decode_plane,
            encode_plane_closed_loop,
        )

        rng = np.random.default_rng(51)
        plane = jnp.asarray(rng.integers(0, 1024, (16, 24)).astype(np.int32))
        enc = encode_plane_closed_loop(plane, jnp.int32(20), n=8, bit_depth=10)
        dec = decode_plane(
            enc["levels"], enc["modes"], jnp.int32(20), n=8,
            height=16, width=24, bit_depth=10,
        )
        assert np.array_equal(np.asarray(dec), np.asarray(enc["recon"]))


class TestFrameFastRouting:
    @pytest.mark.parametrize("mode_set", [
        "dc_planar",
        # slow: the all/satd kernel + XLA double-compile is ~73 s; the
        # dc_planar case keeps the routing-identity contract fast
        pytest.param("all", marks=pytest.mark.slow),
    ])
    def test_frame_encode_routes_identically(self, mode_set):
        """encode_frame_full output is unchanged by fast-kernel routing
        (block-aligned frame -> both Y and chroma ride the kernels)."""
        frame = create_test_frame(64, 64)
        cfg = EncoderConfig(block_size=8, qp=24, mode_set=mode_set,
                            decision="satd" if mode_set == "all" else "energy")
        recon, info = encode_frame_full(frame, cfg)
        # recompute each plane with the plain XLA path
        import jax.numpy as jnp
        from nanohevc_tpu.models.all_intra import encode_plane_full

        for name, src, got in (
            ("Y", frame.y, recon.y),
            ("U", frame.u, recon.u),
            ("V", frame.v, recon.v),
        ):
            is_luma = name == "Y"
            bs = cfg.block_size if is_luma else cfg.chroma_block_size()
            want = encode_plane_full(
                jnp.asarray(src.data), jnp.int32(24), n=bs,
                mode_set=cfg.mode_set, decision=cfg.decision,
                use_dst=cfg.use_dst(bs, is_luma),
            )
            assert np.array_equal(
                got.data, np.asarray(want["recon"]).astype(np.int16)
            ), name
            assert np.array_equal(
                info["planes"][name]["levels"], np.asarray(want["levels"])
            ), name
