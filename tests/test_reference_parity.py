"""Differential fuzzing against the actual reference implementation.

These tests import the mounted reference package (/root/reference) and
verify the numpy oracle — and therefore everything built on it — is
bit-exact against it.  Skipped automatically when the reference is not
mounted (e.g. CI environments); the spec-derived golden-value tests in
the other modules carry the contract there.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

REF_PATH = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not (REF_PATH / "nano_hevc").is_dir(), reason="reference not mounted"
)

if (REF_PATH / "nano_hevc").is_dir():
    sys.path.insert(0, str(REF_PATH))
    import nano_hevc as R

from nanohevc_tpu import ref as O


class TestDifferentialFuzz:
    def test_intra_all_modes_sizes(self):
        rng = np.random.default_rng(100)
        for n in (4, 8, 16, 32):
            for trial in range(3):
                top = rng.integers(0, 256, 2 * n + 1).astype(np.int16)
                left = rng.integers(0, 256, 2 * n + 1).astype(np.int16)
                tl = int(rng.integers(0, 256))
                assert np.array_equal(
                    R.intra_dc_predict(top[:n], left[:n], n),
                    O.intra_dc_predict(top[:n], left[:n], n),
                )
                tr, bl = int(rng.integers(0, 256)), int(rng.integers(0, 256))
                assert np.array_equal(
                    R.intra_planar_predict(top[:n], left[:n], tr, bl, n),
                    O.intra_planar_predict(top[:n], left[:n], tr, bl, n),
                )
                for mode in range(2, 35):
                    assert np.array_equal(
                        R.intra_angular_predict(top, left, tl, mode, n),
                        O.intra_angular_predict(top, left, tl, mode, n),
                    ), (n, mode)

    def test_angular_short_secondary_arrays(self):
        """The reference pads short ref arrays with the last sample."""
        rng = np.random.default_rng(101)
        for n in (4, 8):
            for mode in range(2, 35):
                ln = n + 1
                top = rng.integers(0, 256, ln).astype(np.int16)
                left = rng.integers(0, 256, ln).astype(np.int16)
                assert np.array_equal(
                    R.intra_angular_predict(top, left, 99, mode, n),
                    O.intra_angular_predict(top, left, 99, mode, n),
                ), (n, mode)

    def test_transforms(self):
        rng = np.random.default_rng(102)
        for n in (4, 8, 16, 32):
            for dst in ([False, True] if n == 4 else [False]):
                x = rng.integers(-1023, 1024, (n, n)).astype(np.int16)
                assert np.array_equal(
                    R.forward_transform(x, dst), O.forward_transform(x, dst)
                )
                c = rng.integers(-8000, 8000, (n, n)).astype(np.int32)
                assert np.array_equal(
                    R.inverse_transform(c, dst), O.inverse_transform(c, dst)
                )

    def test_quantization_every_qp(self):
        rng = np.random.default_rng(103)
        for n in (4, 8, 16, 32):
            c = rng.integers(-30000, 30000, (n, n)).astype(np.int32)
            lv = rng.integers(-3000, 3000, (n, n)).astype(np.int32)
            for qp in range(52):
                for intra in (True, False):
                    assert np.array_equal(
                        R.quantize(c, qp, n, intra), O.quantize(c, qp, n, intra)
                    ), (n, qp, intra)
                assert np.array_equal(
                    R.dequantize(lv, qp, n), O.dequantize(lv, qp, n)
                ), (n, qp)

    def test_metrics(self):
        rng = np.random.default_rng(104)
        a = rng.integers(0, 256, (4, 4)).astype(np.int16)
        b = rng.integers(0, 256, (4, 4)).astype(np.int16)
        assert R.satd_4x4(a, b) == O.satd_4x4(a, b)
        assert R.sad(a, b) == O.sad(a, b)
        assert abs(R.psnr(a, b) - O.psnr(a, b)) < 1e-12
        assert abs(R.mse(a, b) - O.mse(a, b)) < 1e-12

    def test_spec_tables(self):
        from nano_hevc import transform as RT
        from nanohevc_tpu import tables as T

        for name in ("DCT4", "DCT8", "DCT16", "DCT32", "DST4"):
            assert np.array_equal(getattr(T, name), getattr(RT, name)), name
        from nano_hevc import intra as RI

        assert T.INTRA_PRED_ANGLE == RI.INTRA_PRED_ANGLE
        assert T.INV_ANGLE == RI.INV_ANGLE

    def test_cli_encode_byte_identical(self, tmp_path):
        """End-to-end: both CLIs produce identical recon files."""
        import subprocess

        from nanohevc_tpu.models.all_intra import create_test_frame

        frame = create_test_frame(96, 112)
        src = tmp_path / "in.yuv"
        src.write_bytes(frame.to_yuv420p())

        from nanohevc_tpu.cli import main

        ours = tmp_path / "ours.yuv"
        main(["encode", str(src), "--width", "112", "--height", "96",
              "-o", str(ours)])

        theirs = tmp_path / "theirs.yuv"
        proc = subprocess.run(
            [sys.executable, "-m", "nano_hevc", "encode", str(src),
             "--width", "112", "--height", "96", "-o", str(theirs)],
            cwd=str(REF_PATH),
            capture_output=True,
            text=True,
            env={"PATH": "/usr/bin:/bin", "PYTHONPATH": str(REF_PATH)},
        )
        assert proc.returncode == 0, proc.stderr
        assert ours.read_bytes() == theirs.read_bytes()
