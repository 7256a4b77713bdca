"""Grouped-interleaved 35-mode SATD search: g block-rows per sublane tile.

mode_search_slab.py processes one (N, W) block-row at a time, so at
N == 4 every vector instruction uses at most 4 of the VPU's 8 sublanes
— and the many (1, W) reference-row ops use just one.  Round-2/3
profiling showed the kernel is VMEM-instruction bound, so utilization
IS throughput.  This kernel packs g block-rows into the sublane axis
in *row-interleaved* order

    slab row  s = i * g + q   <->  row i of block-row q,

which keeps every lane-algebra op (rolls, phase masks, butterfly block
sums) byte-identical while turning the per-block-row (N, W) / (1, W)
ops into (N*g, W) / (g, W) ops — the same instruction count now covers
g block-rows:

- reference rows (`above`, corner, the topshift/negshift roll caches,
  INV_ANGLE extensions) become (g, W) stacks: one roll serves g rows;
- the left-column stack L interleaves as rows s*g+q, so the horizontal
  family's static row-slices stay single contiguous slices
  (L[ip*g : (ip+n)*g]);
- WHT row butterflies and the DCT row passes exchange (g, W) row
  groups (x[(i^k)*g : (i^k+1)*g]) instead of single rows;
- per-block reductions (DC sum, SATD) reduce i-groups with n adds of
  (g, W) and keep the lane butterflies unchanged;
- interleave/de-interleave is a pure reshape+transpose OUTSIDE the
  kernel (one XLA relayout per plane), never a gather.

Decision semantics are identical to mode_search_slab.py /
decide_modes(mode_set="all", decision="satd") — asserted bit-exact in
tests/test_pallas.py.  Open-loop references (reference intra.py:78,
__main__.py:162-168) make block-rows independent, which is what allows
the packing.

Scope: N in {4, 8}, g * N a multiple of 8 (Mosaic sublane tiling);
the default g fills a full 32-row slab (g=8 at N=4).  N >= 16 blocks
already fill the sublanes — they stay on mode_search_slab.py.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nanohevc_tpu.tables import INTRA_PRED_ANGLE, INV_ANGLE, transform_matrix
from nanohevc_tpu.kernels.slab_pipeline import (
    _block_sum,
    _col_pass,
    _col_weights,
    _interpret_default,
    _qp_scalars,
    _roll,
    _spread_phase,
)
from nanohevc_tpu.kernels.mode_search_slab import _left_col, _packed_min_ok


def _group_sum(a: jnp.ndarray, n: int, g: int) -> jnp.ndarray:
    """(n*g, W) -> (g, W): sum over each block-row's n interleaved rows."""
    acc = a[0:g, :]
    for i in range(1, n):
        acc = acc + a[i * g : (i + 1) * g, :]
    return acc


def _tile_rows(a: jnp.ndarray, n: int) -> jnp.ndarray:
    """(g, W) -> (n*g, W): broadcast each group's row to all n rows."""
    return jnp.concatenate([a] * n, axis=0)


def _wht_rows_g(d: jnp.ndarray, n: int, g: int) -> jnp.ndarray:
    """Sylvester WHT along each block-row's i axis, (g, W) rows at a time."""
    k = 1
    while k < n:
        parts = []
        for i in range(n):
            if i & k:
                parts.append(
                    d[(i - k) * g : (i - k + 1) * g, :]
                    - d[i * g : (i + 1) * g, :]
                )
            else:
                parts.append(
                    d[i * g : (i + 1) * g, :]
                    + d[(i + k) * g : (i + k + 1) * g, :]
                )
        d = jnp.concatenate(parts, axis=0)
        k *= 2
    return d


def _wht_lanes(d: jnp.ndarray, phase: jnp.ndarray, n: int) -> jnp.ndarray:
    """Sylvester WHT within each aligned n-lane block (row-independent)."""
    k = 1
    while k < n:
        bit = (phase & k) != 0
        partner = jnp.where(bit, _roll(d, k), _roll(d, -k))
        d = jnp.where(bit, partner - d, d + partner)
        k *= 2
    return d


def _row_pass_g(x: jnp.ndarray, m: np.ndarray, n: int, g: int) -> jnp.ndarray:
    """out[i*g+q] = sum_k m[i, k] * x[k*g+q] (the DCT row pass, grouped).

    m is the STATIC host transform matrix: its entries become immediate
    scalar multiplies (a (1, 1) VMEM read broadcast over (g, W) is a
    sublane-and-lane broadcast Mosaic does not implement).
    """
    outs = []
    for i in range(n):
        acc = None
        for k in range(n):
            c = int(m[i, k])
            if c == 0:
                continue
            xs = x[k * g : (k + 1) * g, :]
            term = xs if c == 1 else (-xs if c == -1 else c * xs)
            acc = term if acc is None else acc + term
        if acc is None:
            acc = jnp.zeros_like(x[0:g, :])
        outs.append(acc)
    return jnp.concatenate(outs, axis=0)


def _transform_quant_recon_g(scal_ref, x, pred, t_host, wfwd_ref,
                             winv_ref, n: int, g: int):
    """Grouped pipeline tail (same math as slab_pipeline's, interleaved)."""
    res = x - pred
    tshift = n.bit_length() - 1 + 5
    rnd = 1 << (tshift - 1)
    temp = (_row_pass_g(res, t_host, n, g) + rnd) >> tshift
    coeff = (_col_pass(temp, wfwd_ref, n) + rnd) >> tshift

    mf = scal_ref[0, 0]
    qshift = scal_ref[0, 1]
    qoffset = scal_ref[0, 2]
    level = jnp.sign(coeff) * jnp.right_shift(
        jnp.abs(coeff) * mf + qoffset, qshift
    )

    dscale = scal_ref[0, 3]
    dq_shift = scal_ref[0, 4]
    base = level * dscale
    sh = jnp.maximum(dq_shift, 1)
    down = jnp.right_shift(base + jnp.left_shift(1, sh - 1), sh)
    up = jnp.left_shift(base, jnp.maximum(-dq_shift, 0))
    deq = jnp.where(dq_shift >= 1, down, up)

    ti = (_row_pass_g(deq, t_host.T, n, g) + rnd) >> tshift
    rec_res = (_col_pass(ti, winv_ref, n) + rnd) >> tshift

    recon = jnp.clip(pred + rec_res, 0, scal_ref[0, 5])
    return level, recon


def _kernel(scal_ref, x_ref, next_ref, above_ref,
            wfwd_ref, winv_ref, recon_ref, levels_ref, modes_ref,
            *, n: int, g: int, packed_min: bool, t_host):
    """One grid step: g block-rows, row-interleaved, searched at once."""
    j = pl.program_id(0)
    w = x_ref.shape[1]
    boundary = scal_ref[0, 6]
    x = x_ref[:, :]                                          # (n*g, W)

    phase = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1) % n
    col = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    first_block = col < n
    q_g = jax.lax.broadcasted_iota(jnp.int32, (g, 1), 0)

    # above[q] = the row above block-row q; row 0 of slab 0 is the
    # frame's top edge -> boundary fill.
    top_edge_g = (q_g == 0) & (j == 0)
    above = jnp.where(top_edge_g, boundary, above_ref[:, :])  # (g, W)

    # ---- Reference machinery -------------------------------------------
    lc = jnp.where(first_block, boundary, _left_col(x, phase, n))
    # LX: the n rows below each block-row, same interleaved order; the
    # last group reads the next slab's first block-row.
    lx_parts = []
    for i in range(n):
        lx_parts.append(x_ref[i * g + 1 : (i + 1) * g, :])
        lx_parts.append(next_ref[i * g : i * g + 1, :])
    lx_rows = jnp.concatenate(lx_parts, axis=0)
    lx = jnp.where(first_block, boundary, _left_col(lx_rows, phase, n))
    # L stack rows s*g+q for s in 0..2n (incl. zero-weight pad row).
    l_stack = jnp.concatenate([lc, lx, lx[(n - 1) * g :, :]], axis=0)

    corner = _spread_phase(_roll(above, 1), 0, phase, n)      # (g, W)
    corner = jnp.where(first_block, boundary, corner)

    last_val = above[:, w - 1 : w]                            # (g, 1)
    topshift = {}
    for s in range(0, n + 2):
        r = _roll(above, -s)
        topshift[s] = jnp.where(col > w - 1 - s, last_val, r) if s else above
    negshift = {0: above}
    for s in range(1, n + 1):
        negshift[s] = _roll(above, s)

    def top_at(idx: int) -> jnp.ndarray:
        return topshift[idx] if idx >= 0 else negshift[-idx]

    best_pred, best_mode = _mode_sweep_g(
        x, above, lc, l_stack, corner, top_at, negshift, phase, n, g,
        packed_min,
    )

    level, recon = _transform_quant_recon_g(
        scal_ref, x, best_pred, t_host, wfwd_ref, winv_ref, n, g
    )
    recon_ref[:, :] = recon
    levels_ref[:, :] = level
    modes_ref[:, :] = best_mode


def _mode_sweep_g(x, above, lc, l_stack, corner, top_at, negshift,
                  phase, n: int, g: int, packed_min: bool):
    """The grouped 35-mode SATD sweep over g interleaved block-rows.

    Pure lane/group algebra: all reference access goes through the
    caller's machinery (above/lc/l_stack/corner (g, W) or interleaved
    (n*g, W) stacks, top_at/negshift), so the same sweep serves the
    open-loop grouped kernel (references from source pixels) and the
    grouped closed-loop wavefront kernel (references from the
    persistent reconstruction state).  Returns (best_pred (n*g, W),
    best_mode (g, W)); decision semantics = decide_modes("all",
    "satd") — identical to mode_search_slab._mode_sweep, row-grouped.
    """
    w = x.shape[1]
    i_iota = jax.lax.broadcasted_iota(jnp.int32, (n * g, 1), 0) // g

    def vert_ext(jx: int, inv: int) -> jnp.ndarray:
        if jx == 0:
            return corner
        proj = ((jx + 1) * inv + 128) >> 8
        return corner if proj == 0 else lc[(proj - 1) * g : proj * g, :]

    # ---- F = WHT2D(x) + per-group |F| sums (shortcut modes) -------------
    f_x = _wht_lanes(_wht_rows_g(x, n, g), phase, n)          # (n*g, W)
    abs_f = jnp.abs(f_x)
    s_all = _block_sum(_group_sum(abs_f, n, g), phase, n)     # (g, W)
    f0 = f_x[0:g, :]
    ph0 = (phase == 0).astype(jnp.int32)

    def satd(diff):
        t = jnp.abs(_wht_lanes(_wht_rows_g(diff, n, g), phase, n))
        return _block_sum(_group_sum(t, n, g), phase, n)      # (g, W)

    # ---- Planar / DC -----------------------------------------------------
    total = _block_sum(above, phase, n) + _group_sum(lc, n, g)
    dc_row = (total + n) // (2 * n)                           # (g, W)
    dc_pred = _tile_rows(dc_row, n)

    above_t = _tile_rows(above, n)
    tr_t = _tile_rows(_spread_phase(above, n - 1, phase, n), n)
    bl_t = _tile_rows(
        _spread_phase(lc[(n - 1) * g : n * g, :], n - 1, phase, n), n
    )
    h = n * lc + (phase + 1) * (tr_t - lc)
    v = n * above_t + (i_iota + 1) * (bl_t - above_t)
    pl_pred = (h + v + n) >> n.bit_length()

    best_pred = pl_pred
    pl_cost = satd(x - pl_pred)

    if packed_min:
        best = (best_pred, pl_cost * 64)

        def consider_cost(pred, cost, mode_idx, best):
            bp, bpk = best
            packed = cost * 64 + mode_idx
            take = _tile_rows(packed < bpk, n)
            return (
                jnp.where(take, pred + jnp.zeros_like(x), bp),
                jnp.minimum(packed, bpk),
            )
    else:
        best = (best_pred, pl_cost, jnp.zeros((g, w), jnp.int32))

        def consider_cost(pred, cost, mode_idx, best):
            bp, bc, bm = best
            take = cost < bc
            return (
                jnp.where(_tile_rows(take, n), pred + jnp.zeros_like(x), bp),
                jnp.where(take, cost, bc),
                jnp.where(take, mode_idx, bm),
            )

    def consider(pred, mode_idx, best):
        return consider_cost(pred, satd(x - pred), mode_idx, best)

    # DC shortcut: WHT2D(x - dc) == F except F00 - n^2*dc at phase 0.
    dc_adj = (jnp.abs(f0 - n * n * dc_row) - jnp.abs(f0)) * ph0
    dc_cost = s_all + _block_sum(dc_adj, phase, n)
    best = consider_cost(dc_pred, dc_cost, 1, best)

    for mode in range(2, 35):
        angle = INTRA_PRED_ANGLE[mode - 2]
        vertical = mode >= 18

        if angle == 0:
            if vertical:   # mode 26
                wla = _wht_lanes(above, phase, n)
                adj = jnp.abs(f0 - n * wla) - jnp.abs(f0)
                cost = s_all + _block_sum(adj, phase, n)
                pred = above_t
            else:          # mode 10
                wr_lc = _wht_rows_g(lc, n, g)
                adj = _group_sum(
                    (jnp.abs(f_x - n * wr_lc) - abs_f) * ph0, n, g
                )
                cost = s_all + _block_sum(adj, phase, n)
                pred = lc
            best = consider_cost(pred, cost, mode, best)
            continue

        if vertical and angle > 0:
            a_side = jnp.concatenate(
                [top_at(((i + 1) * angle) >> 5) for i in range(n)], axis=0
            )
            if angle == 32:                      # f == 0 everywhere
                pred = a_side
            else:
                b_side = jnp.concatenate(
                    [top_at((((i + 1) * angle) >> 5) + 1) for i in range(n)],
                    axis=0,
                )
                fv = ((i_iota + 1) * angle) & 31
                pred = ((a_side << 5) + fv * (b_side - a_side) + 16) >> 5
            best = consider(pred, mode, best)
            continue

        if vertical:
            # negative vertical: per-row base + INV_ANGLE straddle
            inv = INV_ANGLE[angle]
            rows = []
            for i in range(n):
                proj = (i + 1) * angle
                ip, f = proj >> 5, proj & 31
                ta, tb = top_at(ip), top_at(ip + 1)
                base = ta if f == 0 else (
                    ((ta << 5) + f * (tb - ta) + 16) >> 5
                )
                row = base
                for p in range(0, min(-ip, n)):
                    ri = p + 1 + ip
                    ea = vert_ext(ri, inv)
                    eb = (
                        vert_ext(ri + 1, inv) if ri + 1 <= 0 else negshift[p]
                    )
                    val = ea if f == 0 else (
                        ((ea << 5) + f * (eb - ea) + 16) >> 5
                    )
                    row = jnp.where(phase == p, val, row)
                rows.append(row)
            best = consider(jnp.concatenate(rows, axis=0), mode, best)
            continue

        # ---- horizontal family (per-phase static slices of L) ----------
        pred = jnp.zeros_like(x)
        inv = INV_ANGLE.get(angle, 0)
        for p in range(n):
            proj = (p + 1) * angle
            ip, f = proj >> 5, proj & 31
            if ip >= 0:
                a_side = l_stack[ip * g : (ip + n) * g, :]
                if f == 0:
                    pred_p = a_side
                else:
                    b_side = l_stack[(ip + 1) * g : (ip + 1 + n) * g, :]
                    pred_p = ((a_side << 5) + f * (b_side - a_side) + 16) >> 5
            else:
                def horiz_ext(jx: int) -> jnp.ndarray:
                    if jx == 0:
                        return corner
                    prj = ((jx + 1) * inv + 128) >> 8
                    if prj == 0:
                        return corner
                    return top_at(prj - 1 - p) if prj - 1 - p >= 0 else \
                        negshift[p + 1 - prj]
                row_list = []
                for i in range(n):
                    ri = i + 1 + ip
                    if ri >= 1:
                        a_side = l_stack[(ri - 1) * g : ri * g, :]
                        b_side = l_stack[ri * g : (ri + 1) * g, :]
                    else:
                        a_side = horiz_ext(ri)
                        b_side = (
                            horiz_ext(ri + 1) if ri + 1 <= 0
                            else l_stack[0:g, :]
                        )
                    row_list.append(
                        a_side if f == 0 else
                        ((a_side << 5) + f * (b_side - a_side) + 16) >> 5
                    )
                pred_p = jnp.concatenate(row_list, axis=0)
            pred = jnp.where(phase == p, pred_p, pred)
        best = consider(pred, mode, best)

    if packed_min:
        best_pred, best_packed = best
        best_mode = best_packed % 64                          # (g, W)
    else:
        best_pred, _, best_mode = best
    return best_pred, best_mode


@lru_cache(maxsize=None)
def _build(n: int, g: int, height: int, width: int, interpret: bool,
           use_dst: bool, packed_min: bool):
    t_host = np.asarray(transform_matrix(n, use_dst=use_dst), dtype=np.int32)
    slab_rows = n * g
    nslabs = height // slab_rows
    wfwd = _col_weights(t_host, width, n)
    winv = _col_weights(t_host.T, width, n)

    slab_spec = pl.BlockSpec((slab_rows, width), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        partial(_kernel, n=n, g=g, packed_min=packed_min, t_host=t_host),
        grid=(nslabs,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            slab_spec,
            # next slab: feeds the last group's LX rows; the trailing
            # pad slab clamps to itself (its outputs are discarded).
            pl.BlockSpec((slab_rows, width),
                         lambda i: (jnp.minimum(i + 1, nslabs - 1), 0),
                         memory_space=pltpu.VMEM),
            # above rows, one per block-row (g per slab; g % 8 == 0
            # keeps the sublane tiling legal on TPU)
            pl.BlockSpec((g, width), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * n - 1, width), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * n - 1, width), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            slab_spec,
            slab_spec,
            pl.BlockSpec((g, width), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nslabs * slab_rows, width), jnp.int32),
            jax.ShapeDtypeStruct((nslabs * slab_rows, width), jnp.int32),
            jax.ShapeDtypeStruct((nslabs * g, width), jnp.int32),
        ),
        interpret=interpret,
        # At N == 8 the grouped sweep's live (n*g, W) temporaries need
        # ~24 MB of scoped VMEM — over Mosaic's 16 MB default but well
        # inside the chip's 128 MB; raise the cap rather than shrink g.
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
            if n * g > 32 and not interpret else None
        ),
    )

    def run(scalars, x_il, above_arr):
        return call(
            scalars, x_il, x_il, above_arr,
            jnp.asarray(wfwd), jnp.asarray(winv),
        )

    return run


def _default_g(n: int) -> int:
    return 8


def mode_search_encode_plane_auto(
    plane: jnp.ndarray, qp: int, n: int,
    *, bit_depth: int = 8, interpret: bool | None = None,
    use_dst: bool = False, dequant_rescale: bool = False,
):
    """Route the 35-mode search to the fastest bit-exact kernel.

    N in (4, 8) rides the grouped-interleaved kernel (on-chip,
    scan-chained 1080p: N=4 1309 vs 396 Mpix/s for the per-block-row
    slab kernel, N=8 1065 vs 455); other sizes ride the slab kernel.
    Same output contract as both.
    """
    if n in (4, 8) and plane.shape[1] % n == 0:
        return mode_search_encode_plane_grouped(
            plane, qp, n, bit_depth=bit_depth, interpret=interpret,
            use_dst=use_dst, dequant_rescale=dequant_rescale,
        )
    from nanohevc_tpu.kernels.mode_search_slab import mode_search_encode_plane

    return mode_search_encode_plane(
        plane, qp, n, bit_depth=bit_depth, interpret=interpret,
        use_dst=use_dst, dequant_rescale=dequant_rescale,
    )


def mode_search_encode_plane_grouped(
    plane: jnp.ndarray, qp: int, n: int,
    *, g: int | None = None, bit_depth: int = 8,
    interpret: bool | None = None, use_dst: bool = False,
    dequant_rescale: bool = False, _pad_lanes: bool | None = None,
):
    """Grouped-interleaved 35-mode search; bit-exact drop-in for
    mode_search_encode_plane at N in {4, 8}.

    Returns {"recon" (H, W), "levels_slab", "modes_slab"} in NATURAL
    row order (the interleave is internal).
    """
    h, w = plane.shape
    if w % n or n not in (4, 8):
        raise ValueError("grouped mode-search kernel: N in (4, 8), W%N==0")
    if use_dst and n != 4:
        raise ValueError("DST-VII is only defined at 4x4")
    if g is None:
        g = _default_g(n)
    if (n * g) % 8:
        raise ValueError("n*g must be a sublane multiple of 8")
    if interpret is None:
        interpret = _interpret_default()
    if not interpret and g % 8:
        # Mosaic block tiling: the (g, W) above/modes blocks need a
        # sublane-multiple height on real TPU; smaller g is only for
        # interpret-mode tests.
        raise ValueError("on TPU the grouped kernel needs g % 8 == 0")
    nby = h // n
    src = plane.astype(jnp.int32)

    # Lane axis to a vreg multiple (128): the shared mode-sweep concat
    # patterns only Mosaic-compile at 128-aligned widths.  Pad columns
    # replicate the true last column = extract_refs' column clamp;
    # open-loop refs are source-fed, so pad blocks never feed real
    # ones.  Outputs are cropped back to w below.  Mosaic-only rule, so
    # interpret mode skips it (interpreter cost scales with lanes);
    # _pad_lanes=True forces it for coverage tests.
    pad_lanes = (not interpret) if _pad_lanes is None else _pad_lanes
    w_pad = -(-w // 128) * 128 if pad_lanes else w
    if w_pad != w:
        src = jnp.concatenate(
            [src, jnp.broadcast_to(src[:, w - 1 : w], (h, w_pad - w))],
            axis=1,
        )

    slab_rows = n * g
    rows_needed = nby * n
    # one extra block-row past the coded region (LX reads), whole slabs
    h_pad = -(-(rows_needed + n) // slab_rows) * slab_rows
    x = jnp.concatenate(
        [src, jnp.broadcast_to(src[h - 1 : h, :], (h_pad - h, w_pad))],
        axis=0,
    )
    nslabs = h_pad // slab_rows

    # Row-interleave each slab: natural (g, n) -> (n, g) row order.
    x_il = x.reshape(nslabs, g, n, w_pad).transpose(0, 2, 1, 3).reshape(-1, w_pad)
    # above_arr[k] = last source row of block-row k-1 (k == 0 is masked
    # to the boundary fill in-kernel).
    last_rows = x[n - 1 :: n, :]
    above_arr = jnp.concatenate([last_rows[:1], last_rows[:-1]], axis=0)

    run = _build(n, g, h_pad, w_pad, interpret, use_dst,
                 _packed_min_ok(n, bit_depth))
    recon_il, levels_il, modes_g = run(
        _qp_scalars(qp, n, bit_depth, dequant_rescale), x_il, above_arr
    )

    def deil(a):
        return (
            a.reshape(nslabs, n, g, w_pad)
            .transpose(0, 2, 1, 3)
            .reshape(h_pad, w_pad)
        )

    recon = deil(recon_il)[:rows_needed, :w]
    levels = deil(levels_il)[:rows_needed, :w]
    # modes_g rows are per block-row; expand to the slab layout the
    # callers expect (every row of a block carries its mode).
    modes = jnp.repeat(modes_g[: rows_needed // n, :w], n, axis=0)
    if rows_needed != h:
        recon = jnp.concatenate([recon, src[rows_needed:, :w]], axis=0)
    return {"recon": recon, "levels_slab": levels, "modes_slab": modes}
