"""Regenerate docs/quality.md's measured RD tables.

Four sweeps, printed as markdown rows:
1. closed-loop parity vs dequant_rescale (bpp + PSNR-Y at 3 QPs),
2. intra reference smoothing off/on (closed-loop 35-mode, rescale on),
3. SATD vs RD mode decision (open loop, 3 contents x QPs),
4. SAO off/on after deblocking (closed-loop 35-mode, rescale on).

Usage: python tools/quality_sweep.py   (CPU backend; a few minutes)
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from nanohevc_tpu.config import EncoderConfig  # noqa: E402
from nanohevc_tpu.frame import Frame  # noqa: E402
from nanohevc_tpu.models.all_intra import encode_frame_full  # noqa: E402
from nanohevc_tpu.models.rate_control import frame_coded_bytes  # noqa: E402
from nanohevc_tpu.models.wavefront import encode_frame_closed_loop  # noqa: E402


def textured(h: int, w: int) -> np.ndarray:
    rng = np.random.default_rng(3)
    yy, xx = np.mgrid[0:h, 0:w]
    img = (
        96 + 0.35 * xx + 0.2 * yy
        + 28 * np.sin(xx / 9.0) * np.cos(yy / 13.0)
        + rng.normal(0, 7, (h, w))
    )
    return img.clip(0, 255).astype(np.uint8)


def content_96(kind: str) -> np.ndarray:
    rng = np.random.default_rng(9)
    yy, xx = np.mgrid[0:96, 0:96]
    if kind == "smooth":
        img = 60 + 0.8 * xx + 0.5 * yy
    elif kind == "edges":
        img = np.where((xx // 12 + yy // 12) % 2 == 0, 40, 210) + (xx % 12) * 4
    else:  # noisy
        img = 128 + 30 * np.sin(xx / 4.0) + rng.normal(0, 10, (96, 96))
    return img.clip(0, 255).astype(np.uint8)


def frame_of(y: np.ndarray) -> Frame:
    h, w = y.shape
    f = Frame.zeros(h, w, dtype=np.int16)
    f.y.data[...] = y
    f.u.data[...] = 128
    f.v.data[...] = 128
    return f


def psnr_y(a: np.ndarray, b: np.ndarray) -> float:
    mse = ((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean()
    return 10 * np.log10(255.0 ** 2 / mse)


def closed_loop_tables() -> None:
    y = textured(256, 384)
    f = frame_of(y)
    print("| config | qp | bpp | PSNR-Y (dB) |")
    print("|---|---|---|---|")
    for qp in (12, 22, 32):
        for rs in (False, True):
            cfg = EncoderConfig(block_size=8, qp=qp, dequant_rescale=rs)
            recon, bs = encode_frame_closed_loop(f, cfg)
            name = "`dequant_rescale`" if rs else "parity dequant"
            print(f"| closed-loop, {name} | {qp} | "
                  f"{8 * len(bs) / y.size:.3f} | "
                  f"{psnr_y(recon.y.data, y):.2f} |")

    print()
    print("| qp | bpp (off -> on) | PSNR-Y (off -> on) |")
    print("|---|---|---|")
    for qp in (17, 27, 37):
        row_b, row_p = [], []
        for sm in (False, True):
            cfg = EncoderConfig(
                block_size=8, qp=qp, dequant_rescale=True,
                mode_set="all", decision="satd", intra_smoothing=sm,
            )
            recon, bs = encode_frame_closed_loop(f, cfg)
            row_b.append(8 * len(bs) / y.size)
            row_p.append(psnr_y(recon.y.data, y))
        print(f"| {qp} | {row_b[0]:.3f} -> {row_b[1]:.3f} | "
              f"{row_p[0]:.2f} -> {row_p[1]:.2f} |")


def rd_decision_table() -> None:
    print("| content | qp | SATD bytes/PSNR-Y | RD bytes/PSNR-Y |")
    print("|---|---|---|---|")
    for kind in ("smooth", "edges", "noisy"):
        y = content_96(kind)
        f = frame_of(y)
        qps = (22, 30, 38) if kind == "edges" else (22, 30)
        for qp in qps:
            cells = []
            for dec in ("satd", "rd"):
                cfg = EncoderConfig(
                    block_size=8, qp=qp, mode_set="all", decision=dec,
                )
                recon, _ = encode_frame_full(f, cfg)
                nbytes = frame_coded_bytes(f, cfg, closed_loop=False)
                cells.append(
                    f"{nbytes} B / {psnr_y(recon.y.data, y):.2f} dB"
                )
            print(f"| {kind} | {qp} | {cells[0]} | {cells[1]} |")


def structured(h: int = 176, w: int = 144) -> np.ndarray:
    """Gradients + a vertical step edge + sensor-like noise (the
    deblock/SAO table content: blocking and ringing both present)."""
    rng = np.random.default_rng(11)
    yy, xx = np.mgrid[0:h, 0:w]
    img = 70 + 0.5 * yy + np.where(xx < w // 2, 0, 90) + rng.normal(
        0, 5, (h, w)
    )
    return img.clip(0, 255).astype(np.uint8)


def sao_table() -> None:
    y = structured()
    f = frame_of(y)
    print("| qp | bytes (off -> on) | PSNR-Y off | PSNR-Y on | delta |")
    print("|---|---|---|---|---|")
    for qp in (32, 40, 47):
        row_b, row_p = [], []
        for sao in (False, True):
            cfg = EncoderConfig(
                block_size=8, qp=qp, dequant_rescale=True,
                mode_set="all", decision="satd", deblock=True, sao=sao,
            )
            recon, bs = encode_frame_closed_loop(f, cfg)
            row_b.append(len(bs))
            row_p.append(psnr_y(recon.y.data, y))
        print(f"| {qp} | {row_b[0]} -> {row_b[1]} | {row_p[0]:.3f} dB | "
              f"{row_p[1]:.3f} dB | {row_p[1] - row_p[0]:+.3f} |")


def mixed_content(h: int = 192, w: int = 256) -> np.ndarray:
    """Four regions with different artifact profiles (banding, edges,
    texture, flat+noise) — the content class where per-CTB SAO
    adaptation beats one parameter set per frame."""
    rng = np.random.default_rng(21)
    yy, xx = np.mgrid[0:h, 0:w]
    q = np.zeros((h, w))
    h2, w2 = h // 2, w // 2
    q[:h2, :w2] = 40 + (xx[:h2, :w2] // 10) * 8            # banding
    q[:h2, w2:] = np.where((xx[:h2, w2:] // 16) % 2, 50, 200)  # edges
    q[h2:, :w2] = 128 + 35 * np.sin(xx[h2:, :w2] / 5.0) * \
        np.cos(yy[h2:, :w2] / 7.0)                          # texture
    q[h2:, w2:] = 100 + rng.normal(0, 12, (h - h2, w - w2))  # noise
    return q.clip(0, 255).astype(np.uint8)


def sao_ctb_table() -> None:
    """Per-frame vs CTB-granular SAO on mixed content (verdict #4)."""
    y = mixed_content()
    f = frame_of(y)
    print("| qp | mode | bpp | PSNR-Y (dB) | delta vs off |")
    print("|---|---|---|---|---|")
    for qp in (32, 40, 47):
        base_p = None
        for mode in ("off", "frame", "ctb"):
            cfg = EncoderConfig(
                block_size=8, qp=qp, dequant_rescale=True,
                mode_set="all", decision="satd", deblock=True,
                sao=mode == "frame", sao_ctb=mode == "ctb", sao_tile=32,
            )
            recon, bs = encode_frame_closed_loop(f, cfg)
            p = psnr_y(recon.y.data, y)
            if base_p is None:
                base_p = p
            print(f"| {qp} | {mode} | {8 * len(bs) / y.size:.4f} | "
                  f"{p:.3f} | {p - base_p:+.3f} |")


if __name__ == "__main__":
    closed_loop_tables()
    print()
    rd_decision_table()
    print()
    sao_table()
    print()
    sao_ctb_table()
