"""Slab-layout fused pipeline: whole plane in, whole plane out.

The blocks-API kernel (fused_pipeline.py) is fast, but profiling on
the chip showed the XLA glue around it dominating: tile_plane ~1.0 ms,
extract_refs (a gather) ~1.7 ms, untile ~0.4 ms per 1080p frame vs
0.47 ms for the kernel itself.  This kernel eliminates all of it: the
grid runs over block-rows, each step reads a dense (N, W) row slab of
the raw plane (plus the previous slab for the top reference) straight
from HBM via BlockSpec, and writes reconstruction and levels back as
dense (N, W) slabs.  No gather, no tiling transposes, anywhere.

The data NEVER leaves slab layout.  Block-local operations become
lane-algebra over the W axis (lane c belongs to block c//N with phase
c%N):

- transform ROW passes are outer-product FMAs T @ slab (contraction
  over sublanes);
- transform COLUMN passes mix lanes only within a block: expressed as
  sum_d roll(X, d) * W_d, where W_d[c] = T[c%N, c%N-d] is a
  precomputed per-lane weight row (2N-1 static rolls per pass; roll
  wrap-around lanes always carry zero weight);
- per-block sums (DC, decision energies) and neighbor spreads (left
  column, top-right) are the same roll pattern with 0/1 phase masks
  built in-kernel from a lane iota.

The left reference of block bx is the last column of block bx-1 in
the same source slab (one masked roll), the top reference is the last
row of the previous slab — exactly the reference encoder's source-fed
neighbor semantics (reference __main__.py:162-168) with 128 boundary
fill.  Levels come out in slab layout (levels[y, x] = coefficient
(y%N, x%N) of the block containing (y, x)); `levels_plane_to_blocks`
converts for the entropy stage.  Bit-exact vs the jnp ops path (and
hence the numpy oracle / reference): tests/test_pallas.py.

Constraints: W % N == 0, N in {4, 8, 16, 32}.  Slabs are max(N, 8)
rows (Mosaic sublane rules), so N == 4 packs two block-rows per slab.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nanohevc_tpu.tables import transform_matrix

# 8-bit neutral fill; kernels read the actual boundary (1 << (bd-1))
# from the SMEM scalar vector so 10-bit planes ride the same program.
BOUNDARY = 128


def _roll(x: jnp.ndarray, d: int) -> jnp.ndarray:
    """Static circular lane shift: result[.., c] = x[.., c - d].

    pltpu.roll requires a non-negative shift; negative d wraps mod W
    (the wrapped lanes always carry zero weight in every caller).
    """
    size = x.shape[-1]
    d = d % size
    if d == 0:
        return x
    return pltpu.roll(x, shift=d, axis=x.ndim - 1)


def _row_pass(x: jnp.ndarray, m_ref, n: int) -> jnp.ndarray:
    """out[i, c] = sum_k m[i, k] * x[k, c] (outer-product FMAs)."""
    acc = None
    for k in range(n):
        term = m_ref[:, k : k + 1] * x[k : k + 1, :]
        acc = term if acc is None else acc + term
    return acc


def _col_pass(x: jnp.ndarray, w_ref, n: int) -> jnp.ndarray:
    """out[i, c] = sum_k x[i, blk(c)*N + k] * T[c%N, k].

    w_ref is the (2N-1, W) weight-row stack: row d+N-1 holds
    T[c%N, c%N-d] (zero where c%N-d is out of range), so each term is
    one static lane-roll times one weight row.
    """
    acc = None
    for d in range(-(n - 1), n):
        term = _roll(x, d) * w_ref[d + n - 1 : d + n, :]
        acc = term if acc is None else acc + term
    return acc


def _block_sum(v: jnp.ndarray, phase: jnp.ndarray, n: int) -> jnp.ndarray:
    """(1, W) -> (1, W): every lane gets its block's lane-sum.

    Butterfly exchange over the aligned n-lane groups: at step k each
    lane adds its XOR-k partner (always inside the same block since
    blocks are n-aligned and k < n), so the full group sum lands on
    every lane in log2(n) steps of two rolls each — vs 2n-1 rolls for
    the naive mask-and-shift form.
    """
    s = v
    k = 1
    while k < n:
        partner = jnp.where((phase & k) != 0, _roll(s, k), _roll(s, -k))
        s = s + partner
        k *= 2
    return s


def _spread_phase(v: jnp.ndarray, src_phase: int, phase: jnp.ndarray,
                  n: int) -> jnp.ndarray:
    """Every lane gets its block's lane at phase src_phase.

    Mask the source lane, then butterfly-sum: the sum of one nonzero
    value per group IS its broadcast.
    """
    masked = v * (phase == src_phase).astype(jnp.int32)
    return _block_sum(masked, phase, n)


def _kernel(scal_ref, slab_ref, above_ref, t_ref, tt_ref, wfwd_ref, winv_ref,
            recon_ref, levels_ref, *maybe_modes_ref, n: int):
    """One grid step: a slab of max(N, 8) rows, entirely in lanes.

    Mosaic requires >= 8 sublanes per block, so for N == 4 each slab
    carries two block-rows, processed in sequence within the step (the
    second one's top reference is a source row inside the same slab —
    open-loop semantics make this dependency-free).

    scal_ref (SMEM, (1, 7)): mf, qshift, qoffset, dscale, dq_shift,
        max_pix, boundary
    slab_ref / above_ref: (max(N,8), W) source slabs (above = previous)
    t_ref / tt_ref: (N, N) transform matrix and transpose
    wfwd_ref / winv_ref: (2N-1, W) column-pass weight rows for T / T^T
    """
    by = pl.program_id(0)
    slab_rows = slab_ref.shape[0]
    boundary = scal_ref[0, 6]
    for r in range(slab_rows // n):
        if r == 0:
            above = jnp.where(
                by == 0, boundary, above_ref[slab_rows - 1 : slab_rows, :]
            )
        else:
            above = slab_ref[r * n - 1 : r * n, :]
        level, recon, use_dc = _encode_block_row(
            scal_ref, slab_ref[r * n : (r + 1) * n, :], above,
            t_ref, tt_ref, wfwd_ref, winv_ref, n,
        )
        sl = slice(r * n, (r + 1) * n)
        levels_ref[sl, :] = level
        recon_ref[sl, :] = recon
        if maybe_modes_ref:
            maybe_modes_ref[0][sl, :] = jnp.broadcast_to(
                use_dc.astype(jnp.int32), recon.shape
            )


def _encode_block_row(scal_ref, x, above, t_ref, tt_ref, wfwd_ref, winv_ref,
                      n: int):
    """One block-row: (n, W) pixels + (1, W) top row -> (level, recon,
    use_dc)."""
    w = x.shape[1]
    phase = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1) % n
    boundary = scal_ref[0, 6]

    # Left reference column LC[i, c] = x[i, blk(c)*N - 1]; boundary fill
    # (1 << (bd-1)) for blk 0.  roll-by-1 parks the previous block's
    # last column on phase-0 lanes; the masked butterfly block-sum
    # broadcasts it across each block (log2 n stages vs n masked rolls).
    lc = _block_sum(
        _roll(x, 1) * (phase == 0).astype(jnp.int32), phase, n
    )
    first_block = (jax.lax.broadcasted_iota(jnp.int32, (1, w), 1) < n)
    lc = jnp.where(first_block, boundary, lc)                    # (n, W)

    # --- DC: floor((sum top + sum left + N) / 2N), per lane -------------
    top_sum = _block_sum(above, phase, n)                        # (1, W)
    # every lane of lc already holds its block's left-column value, so
    # the row-sum IS the block's left sum (no lane reduction needed)
    left_sum = lc.sum(axis=0, keepdims=True)                     # (1, W)
    dc_pred = (top_sum + left_sum + n) // (2 * n)                # (1, W)

    # --- Planar (parity: top_right = top[N-1], bottom_left = left[N-1]) -
    tr = _spread_phase(above, n - 1, phase, n)                   # (1, W)
    bl = _spread_phase(lc[n - 1 : n, :], n - 1, phase, n)
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    # one-multiply lerp: (n-q)*a + q*b == n*a + q*(b-a)
    h = n * lc + (phase + 1) * (tr - lc)
    v = n * above + (rows + 1) * (bl - above)
    pl_pred = (h + v + n) >> n.bit_length()

    # --- Energy decision (ties -> DC) ------------------------------------
    rd = x - dc_pred
    rp = x - pl_pred
    e_dc = _block_sum((rd * rd).sum(axis=0, keepdims=True), phase, n)
    e_pl = _block_sum((rp * rp).sum(axis=0, keepdims=True), phase, n)
    use_dc = e_dc <= e_pl                                        # (1, W)
    pred = jnp.where(use_dc, dc_pred + jnp.zeros_like(x), pl_pred)
    level, recon = _transform_quant_recon(
        scal_ref, x, pred, t_ref, tt_ref, wfwd_ref, winv_ref, n
    )
    return level, recon, use_dc


def _transform_quant_recon(scal_ref, x, pred, t_ref, tt_ref, wfwd_ref,
                           winv_ref, n: int):
    """Shared pipeline tail: residual -> DCT -> Q -> IQ -> IDCT -> recon."""
    res = x - pred
    tshift = n.bit_length() - 1 + 5
    rnd = 1 << (tshift - 1)
    temp = (_row_pass(res, t_ref, n) + rnd) >> tshift
    coeff = (_col_pass(temp, wfwd_ref, n) + rnd) >> tshift

    mf = scal_ref[0, 0]
    qshift = scal_ref[0, 1]
    qoffset = scal_ref[0, 2]
    level = jnp.sign(coeff) * jnp.right_shift(
        jnp.abs(coeff) * mf + qoffset, qshift
    )

    # dq_shift is signed: 4 - qp_per in parity mode, 6 - log2N - qp_per
    # with the spec-correct size rescale (see ops/quant.py dequantize).
    dscale = scal_ref[0, 3]
    dq_shift = scal_ref[0, 4]
    base = level * dscale
    sh = jnp.maximum(dq_shift, 1)
    down = jnp.right_shift(base + jnp.left_shift(1, sh - 1), sh)
    up = jnp.left_shift(base, jnp.maximum(-dq_shift, 0))
    deq = jnp.where(dq_shift >= 1, down, up)

    ti = (_row_pass(deq, tt_ref, n) + rnd) >> tshift
    rec_res = (_col_pass(ti, winv_ref, n) + rnd) >> tshift

    recon = jnp.clip(pred + rec_res, 0, scal_ref[0, 5])
    return level, recon


def _col_weights(t: np.ndarray, width: int, n: int) -> np.ndarray:
    """(2N-1, W) weight rows: row d+N-1, lane c -> t[c%N, c%N-d]."""
    out = np.zeros((2 * n - 1, width), np.int32)
    ph = np.arange(width) % n
    for d in range(-(n - 1), n):
        k = ph - d
        ok = (k >= 0) & (k < n)
        out[d + n - 1, ok] = t[ph[ok], k[ok]]
    return out


def _slab_rows(n: int) -> int:
    """Rows per slab: max(N, 8) — the Mosaic sublane minimum.

    Measured: doubling to two block-rows per slab at N == 8 REGRESSED
    16% (0.39 -> 0.47 ms/frame) — larger slabs hurt the input-DMA /
    compute pipelining — so slabs stay minimal.
    """
    return max(n, 8)


@lru_cache(maxsize=None)
def _build(n: int, height: int, width: int, interpret: bool,
           with_modes: bool = False, use_dst: bool = False):
    t_host = np.asarray(transform_matrix(n, use_dst=use_dst), dtype=np.int32)
    slab_rows = _slab_rows(n)
    nslabs = height // slab_rows
    wfwd = _col_weights(t_host, width, n)          # pass 2 of forward: T
    winv = _col_weights(t_host.T, width, n)        # pass 2 of inverse: T^T

    slab_out = (
        pl.BlockSpec((slab_rows, width), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        jax.ShapeDtypeStruct((nslabs * slab_rows, width), jnp.int32),
    )
    n_outs = 3 if with_modes else 2
    call = pl.pallas_call(
        partial(_kernel, n=n),
        grid=(nslabs,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((slab_rows, width), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            # previous slab (its last row is the top reference);
            # clamped at 0 and masked in-kernel for slab 0
            pl.BlockSpec((slab_rows, width),
                         lambda i: (jnp.maximum(i - 1, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * n - 1, width), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * n - 1, width), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(slab_out[0] for _ in range(n_outs)),
        out_shape=tuple(slab_out[1] for _ in range(n_outs)),
        interpret=interpret,
    )

    def run(scalars, plane):
        return call(
            scalars, plane, plane,
            jnp.asarray(t_host),
            jnp.asarray(np.ascontiguousarray(t_host.T)),
            jnp.asarray(wfwd), jnp.asarray(winv),
        )

    return run


def _qp_scalars(qp: int, n: int, bit_depth: int,
                dequant_rescale: bool = False) -> jnp.ndarray:
    """SMEM scalar vector: [mf, qshift, qoffset, dscale, dq_shift,
    max_pix, boundary].

    dq_shift is the signed dequant shift: 4 - qp_per preserves the
    reference's size-independent dequant (parity), 6 - log2N - qp_per
    restores the spec-correct size rescale (negative -> left shift).
    """
    from nanohevc_tpu.tables import DEQUANT_SCALE, QUANT_SCALE

    qp_c = max(0, min(51, int(qp)))
    qp_per, qp_rem = qp_c // 6, qp_c % 6
    log2n = n.bit_length() - 1
    qshift = 14 + qp_per + log2n
    dq_shift = (6 - log2n if dequant_rescale else 4) - qp_per
    return jnp.asarray(
        [QUANT_SCALE[qp_rem], qshift, (1 << qshift) // 3,
         DEQUANT_SCALE[qp_rem], dq_shift, (1 << bit_depth) - 1,
         1 << (bit_depth - 1)],
        dtype=jnp.int32,
    ).reshape(1, 7)


def slab_supported(n: int, width: int) -> bool:
    """Whether the slab kernel covers this configuration."""
    return n in (4, 8, 16, 32) and width % n == 0


def _interpret_default() -> bool:
    """Pallas compiles via Mosaic only on TPU; interpret elsewhere."""
    import jax

    return jax.default_backend() != "tpu"


def slab_encode_plane(plane: jnp.ndarray, qp: int, n: int,
                      *, bit_depth: int = 8, interpret: bool | None = None,
                      with_modes: bool = False, use_dst: bool = False,
                      dequant_rescale: bool = False):
    """(H, W) plane -> dict(recon (H, W), levels_slab (nby*N, W)
    [, modes_slab (nby*N, W)]).

    qp is a static Python int.  Trailing rows below the last full
    block-row pass through to `recon` unchanged.  interpret=None auto-
    selects the Pallas interpreter off-TPU.  use_dst selects the
    DST-VII weight set (N == 4 only, the HEVC 4x4 luma intra rule).
    """
    h, w = plane.shape
    if w % n:
        raise ValueError(f"slab kernel requires W % N == 0, got {w} % {n}")
    if n not in (4, 8, 16, 32):
        raise ValueError(f"unsupported block size: {n}")
    if use_dst and n != 4:
        raise ValueError("DST-VII is only defined at 4x4")
    if interpret is None:
        interpret = _interpret_default()
    nby = h // n
    src = plane.astype(jnp.int32)

    # Pad rows so every full block-row lands inside a full slab
    # (N == 4 packs two block-rows per 8-row slab).  Pad block-rows'
    # outputs are discarded.
    slab_rows = _slab_rows(n)
    rows_needed = nby * n
    h_pad = -(-rows_needed // slab_rows) * slab_rows
    x = src
    if h_pad > h:
        x = jnp.concatenate(
            [src, jnp.zeros((h_pad - h, w), jnp.int32)], axis=0
        )
    run = _build(n, h_pad, w, interpret, with_modes, use_dst)
    outs = run(_qp_scalars(qp, n, bit_depth, dequant_rescale), x[:h_pad])
    recon, levels = outs[0][:rows_needed], outs[1][:rows_needed]
    if rows_needed != h:
        recon = jnp.concatenate([recon, src[rows_needed:, :]], axis=0)
    result = {"recon": recon, "levels_slab": levels}
    if with_modes:
        result["modes_slab"] = outs[2][:rows_needed]
    return result


def levels_plane_to_blocks(levels_slab: jnp.ndarray, n: int) -> jnp.ndarray:
    """Slab-layout levels -> (nb, N, N) raster blocks (for entropy)."""
    from nanohevc_tpu.ops import tile_plane

    return tile_plane(levels_slab, n)
