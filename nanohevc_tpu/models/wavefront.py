"""Closed-loop (wavefront) all-intra encode and the matching decoder.

True HEVC intra prediction reads *reconstructed* neighbors, which
serializes blocks along the raster diagonal.  The reference sidesteps
this entirely (it predicts from source pixels, __main__.py:162-163;
its own docs acknowledge the real encoder must use reconstructed
pixels, docs/frames_and_panes.md:342-346).  This module implements the
real thing, TPU-style:

- blocks on the same anti-diagonal (by + bx == d) have no mutual
  dependency, so the frame is processed as a lax.scan over diagonals,
  each step batch-encoding up to min(nby, nbx) blocks in parallel
  against the evolving reconstruction (the classic wavefront);
- per-step block coordinates are compile-time tables; invalid slots
  use out-of-bounds scatter coordinates with mode="drop", keeping all
  shapes static;
- total padded work is (nby + nbx - 1) * min(nby, nbx) block slots,
  about 1.5x the true block count at 16:9 aspect - the price of the
  dependency, still fully batched.

Because prediction is causal, `decode_plane` reconstructs the frame
pixel-exactly from (modes, levels) alone - the encoder/decoder pair
closes the loop the reference never could.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from nanohevc_tpu import ops
from nanohevc_tpu.ops.tiling import extract_refs_at


@lru_cache(maxsize=None)
def _diag_tables(nby: int, nbx: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Static wavefront tables: (ndiag, m) block-row/col/valid arrays."""
    ndiag = nby + nbx - 1
    m = min(nby, nbx)
    ys = np.zeros((ndiag, m), np.int32)
    xs = np.zeros((ndiag, m), np.int32)
    ok = np.zeros((ndiag, m), bool)
    for d in range(ndiag):
        k = 0
        by = min(d, nby - 1)
        while by >= 0 and d - by <= nbx - 1:
            ys[d, k], xs[d, k], ok[d, k] = by, d - by, True
            by -= 1
            k += 1
    return ys, xs, ok


def _predict_slots(recon, ys, xs, n, mode_set, decision, blocks_slot,
                   boundary=128):
    """Refs from recon; mode decision against the source blocks."""
    refs = extract_refs_at(recon, ys, xs, n, boundary=boundary)
    from nanohevc_tpu.models.all_intra import decide_modes

    return refs, *decide_modes(blocks_slot, refs, n, mode_set, decision)


def _code_residual(blocks_slot, pred, qp, n, use_dst, bit_depth):
    res = blocks_slot - pred
    coeff = ops.forward_transform(res, use_dst)
    levels = ops.quantize(coeff, qp, n, True)
    deq = ops.dequantize(levels, qp, n)
    rec = ops.inverse_transform(deq, use_dst)
    recon = jnp.clip(pred + rec, 0, (1 << bit_depth) - 1)
    return levels, recon


def _scatter_blocks(plane, vals, ys, xs, ok, n):
    """Write (m, N, N) blocks at block coords; invalid slots dropped."""
    h, w = plane.shape
    yy = ys[:, None, None] * n + jnp.arange(n)[None, :, None]
    xx = xs[:, None, None] * n + jnp.arange(n)[None, None, :]
    # invalid slots -> out-of-bounds rows, dropped by scatter mode
    yy = jnp.where(ok[:, None, None], yy, h)
    return plane.at[yy, xx].set(vals, mode="drop")


def encode_plane_closed_loop(
    plane: jnp.ndarray,
    qp,
    *,
    n: int,
    mode_set: str = "dc_planar",
    decision: str = "energy",
    use_dst: bool = False,
    bit_depth: int = 8,
    scan: str = "diag",
):
    """Wavefront encode of one plane with reconstruction-fed prediction.

    Returns {"recon" (H, W), "levels" (nb, N*N) scan-packed raster
    order, "modes" (nb,)} - the (modes, levels) pair is sufficient for
    pixel-exact decode_plane reconstruction.
    """
    h, w = plane.shape
    nby, nbx = h // n, w // n
    src = plane.astype(jnp.int32)
    blocks = ops.tile_plane(src, n)                      # (nb, N, N)
    ys_t, xs_t, ok_t = _diag_tables(nby, nbx)
    ndiag, m = ys_t.shape
    ys_t, xs_t, ok_t = map(jnp.asarray, (ys_t, xs_t, ok_t))

    recon0 = jnp.zeros((h, w), jnp.int32)
    levels0 = jnp.zeros((nby * nbx, n * n), jnp.int32)
    modes0 = jnp.zeros((nby * nbx,), jnp.int32)

    def step(carry, tabs):
        recon, levels_acc, modes_acc = carry
        ys, xs, ok = tabs
        bidx = ys * nbx + xs                              # (m,)
        blocks_slot = blocks[jnp.where(ok, bidx, 0)]      # (m, N, N)
        refs, pred, modes = _predict_slots(
            recon, ys, xs, n, mode_set, decision, blocks_slot,
            boundary=1 << (bit_depth - 1),
        )
        levels, rec_blocks = _code_residual(
            blocks_slot, pred, qp, n, use_dst, bit_depth
        )
        recon = _scatter_blocks(recon, rec_blocks, ys, xs, ok, n)
        packed = ops.scan_pack(levels, scan)
        safe = jnp.where(ok, bidx, nby * nbx)             # OOB -> drop
        levels_acc = levels_acc.at[safe].set(packed, mode="drop")
        modes_acc = modes_acc.at[safe].set(modes, mode="drop")
        return (recon, levels_acc, modes_acc), None

    (recon, levels, modes), _ = jax.lax.scan(
        step, (recon0, levels0, modes0), (ys_t, xs_t, ok_t)
    )
    out_recon = recon
    if nby * n != h or nbx * n != w:
        mask = jnp.zeros((h, w), bool).at[: nby * n, : nbx * n].set(True)
        out_recon = jnp.where(mask, recon, src)
    return {"recon": out_recon, "levels": levels, "modes": modes}


def encode_frame_closed_loop(frame, config) -> tuple:
    """Closed-loop encode of a Frame -> (recon Frame, bitstream bytes).

    The bitstream is fully decodable to pixels by decode_frame (unlike
    the open-loop path, whose prediction a decoder cannot reproduce).
    """
    import numpy as np

    from nanohevc_tpu.frame import Frame
    from nanohevc_tpu.runtime.bitstream import assemble_bitstream

    recon = Frame.zeros(frame.height, frame.width, dtype=np.int16)
    plane_levels = {}
    plane_modes = {}
    for name, src, dst in (
        ("Y", frame.y, recon.y),
        ("U", frame.u, recon.u),
        ("V", frame.v, recon.v),
    ):
        is_luma = name == "Y"
        bs = config.block_size if is_luma else config.chroma_block_size()
        out = encode_plane_closed_loop(
            jnp.asarray(src.data.astype(np.int32)),
            jnp.int32(config.qp),
            n=bs,
            mode_set=config.mode_set,
            decision=config.decision,
            use_dst=config.use_dst(bs, is_luma),
            bit_depth=config.bit_depth,
            scan=config.scan,
        )
        dst.data[...] = np.asarray(out["recon"]).astype(np.int16)
        plane_levels[name] = (np.asarray(out["levels"]), bs)
        plane_modes[name] = np.asarray(out["modes"])
    bitstream = assemble_bitstream(
        frame.width, frame.height, config.qp, plane_levels, plane_modes
    )
    return recon, bitstream


def decode_frame(bitstream: bytes):
    """Pixel-exact decode of a closed-loop frame bitstream -> Frame.

    Self-contained: geometry and QP come from the SPS/PPS in the
    stream.  The per-plane block size is carried by each slice header.
    Regions not covered by full blocks decode as 0 (the encoder keeps
    source pixels there but they are never coded); use block-aligned
    dimensions for full-frame fidelity.
    """
    import numpy as np

    from nanohevc_tpu.frame import Frame
    from nanohevc_tpu.runtime.bitstream import parse_bitstream

    parsed = parse_bitstream(bitstream)
    params = parsed.get("params", {})
    width, height, qp = params["width"], params["height"], params["qp"]
    recon = Frame.zeros(height, width, dtype=np.int16)
    for name, dst, (h, w) in (
        ("Y", recon.y, (height, width)),
        ("U", recon.u, (height // 2, width // 2)),
        ("V", recon.v, (height // 2, width // 2)),
    ):
        sl = parsed[name]
        bs = sl["block_size"]
        use_dst = name == "Y" and bs == 4
        plane = decode_plane(
            jnp.asarray(sl["levels"]),
            jnp.asarray(sl["modes"]),
            jnp.int32(qp),
            n=bs,
            height=h,
            width=w,
            use_dst=use_dst,
        )
        dst.data[...] = np.asarray(plane).astype(np.int16)
    return recon


def decode_plane(
    levels: jnp.ndarray,
    modes: jnp.ndarray,
    qp,
    *,
    n: int,
    height: int,
    width: int,
    use_dst: bool = False,
    bit_depth: int = 8,
    scan: str = "diag",
) -> jnp.ndarray:
    """Pixel-exact decoder for closed-loop streams.

    (nb, N*N) scan-packed levels + (nb,) modes -> (H, W) recon, by the
    same wavefront in reverse: dequantize/inverse-transform the
    residual, predict each diagonal from the already-reconstructed
    neighbors, add, clip.
    """
    nby, nbx = height // n, width // n
    res_blocks = ops.inverse_transform(
        ops.dequantize(ops.scan_unpack(levels, scan), qp, n), use_dst
    )                                                     # (nb, N, N)
    ys_t, xs_t, ok_t = _diag_tables(nby, nbx)
    ys_t, xs_t, ok_t = map(jnp.asarray, (ys_t, xs_t, ok_t))
    recon0 = jnp.zeros((height, width), jnp.int32)

    def step(recon, tabs):
        ys, xs, ok = tabs
        bidx = ys * nbx + xs
        safe = jnp.where(ok, bidx, 0)
        refs = extract_refs_at(recon, ys, xs, n, boundary=1 << (bit_depth - 1))
        from nanohevc_tpu.ops.intra import predict_by_mode_mm

        pred = predict_by_mode_mm(refs, n, modes[safe])
        rec = jnp.clip(pred + res_blocks[safe], 0, (1 << bit_depth) - 1)
        return _scatter_blocks(recon, rec, ys, xs, ok, n), None

    recon, _ = jax.lax.scan(step, recon0, (ys_t, xs_t, ok_t))
    return recon
