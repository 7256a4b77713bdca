"""35-mode SATD search fused into a slab Pallas kernel.

The XLA mode search (models/all_intra.decide_modes, mode_set="all") is
HBM-bound: the (nb, 33, N, N) prediction/SATD intermediates cost
~16 ms per 1080p frame (docs/performance.md).  This kernel keeps the
entire search in VMEM, slab-layout, using the lane-algebra playbook of
slab_pipeline.py plus three mode-search-specific tricks:

- **vertical angular modes**: the lane phase cancels out of the
  projection — pred[i, c] = lerp(above[c + int_i], above[c + int_i + 1])
  — so all nine positive-vertical modes share one small cache of
  right-edge-clamped lane rolls of the `above` row;
- **horizontal angular modes**: per phase p the reference row index
  int_p is static, so predictions are row-slices of the stacked
  left-column matrix L = [LC | LX(rows N..2N-1) | pad], masked per
  phase;
- **negative modes**: the INV_ANGLE extension values are per-block
  lane rows (corner / LC rows, pre-spread), selected by static phase
  masks; the ref[0]->ref[1] straddle uses one static per-phase roll;
- **SATD**: the Walsh-Hadamard transform is an XOR-butterfly —
  log2(N) stages of two lane-rolls (columns) / row regroupings (rows)
  — identical values to the Sylvester-matrix SATD the XLA path uses;
- **WHT-linearity shortcuts** for DC / pure-horizontal (10) /
  pure-vertical (26): their predictions are constant along one block
  axis, so WHT2D(x - pred) differs from the precomputed F = WHT2D(x)
  in a single row / phase-0 lane column — three full SATD passes
  collapse into one-row adjustments of the precomputed |F| sums;
- **concatenated-lerp vertical family**: the nine positive-vertical
  modes build all n rows' (a, b) operands by concatenation from the
  shared roll cache, then run ONE (n, W) one-multiply lerp instead of
  n single-row lerps;
- **packed (cost, mode) min**: when n^3 * maxval * 64 fits int32 the
  running best reduces with jnp.minimum on cost*64 + mode — one op
  instead of three selects, with equal-cost ties resolving to the
  lowest mode index exactly like the strict-< chain.

The measured effect of the last three on-chip (1080p, batch 8): 493.5
-> 498.4 Mpix/s at 8x8; a grouped-phase rewrite of the horizontal
family was also tried and REGRESSED (457 Mpix/s) — the per-phase
where-chain below is the faster form, don't "simplify" it back.

Slabs are max(N, 8) rows (Mosaic sublane rules), so N == 4 packs two
block-rows per slab; the caller appends replicated-last-row padding so
every left-extension row (LX, the left reference's rows N..2N-1, which
extract_refs clamps to the plane's true last row — ops/tiling.py:126)
reads the exact clamped value, including planes whose height is not a
block multiple.

Decision semantics match decide_modes(..., "all", "satd") exactly:
costs over modes [planar, DC, 2..34], ties to the lowest mode index.
Scope: N in {4, 8, 16, 32}, any bit depth (boundary fill and clip max
ride the SMEM scalars).  Bit-exactness vs the XLA path is asserted in
tests/test_pallas.py.
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
    _col_weights,
    _interpret_default,
    _qp_scalars,
    _roll,
    _slab_rows,
    _spread_phase,
    _transform_quant_recon,
)


def _left_col(mat: jnp.ndarray, phase: jnp.ndarray, n: int) -> jnp.ndarray:
    """(n, W): every lane gets mat[i, blk(c)*N - 1] (prev block's last col).

    roll-by-1 parks the value on phase-0 lanes; the masked butterfly
    block-sum broadcasts it across each block.
    """
    return _block_sum(_roll(mat, 1) * (phase == 0).astype(jnp.int32), phase, n)


def _wht_rows(d: jnp.ndarray, n: int) -> jnp.ndarray:
    """Sylvester WHT along the row (sublane) axis via butterflies."""
    k = 1
    while k < n:
        rows = []
        for i in range(n):
            if i & k:
                rows.append(d[i - k : i - k + 1, :] - d[i : i + 1, :])
            else:
                rows.append(d[i : i + 1, :] + d[i + k : i + k + 1, :])
        d = jnp.concatenate(rows, axis=0)
        k *= 2
    return d


def _wht_lanes(d: jnp.ndarray, phase: jnp.ndarray, n: int) -> jnp.ndarray:
    """Sylvester WHT within each aligned n-lane block via XOR butterflies."""
    k = 1
    while k < n:
        bit = (phase & k) != 0
        partner = jnp.where(bit, _roll(d, k), _roll(d, -k))
        d = jnp.where(bit, partner - d, d + partner)
        k *= 2
    return d


def _satd(diff: jnp.ndarray, phase: jnp.ndarray, n: int) -> jnp.ndarray:
    """(n, W) residual -> (1, W) per-block SATD (Sylvester, both axes)."""
    t = jnp.abs(_wht_lanes(_wht_rows(diff, n), phase, n))
    return _block_sum(t.sum(axis=0, keepdims=True), phase, n)


def _packed_min_ok(n: int, bit_depth: int) -> bool:
    """Whether cost*64 + mode fits int32 for every possible SATD.

    sum|WHT2D(d)| <= n * sqrt(n^2 * sum d^2) <= n^3 * max|d| (Cauchy-
    Schwarz), so the packed key is bounded by n^3 * maxval * 64 + 34.
    True everywhere except n=32 at bit depth >= 10 and n=16 at >= 14,
    which keep the three-select reduction.
    """
    return n ** 3 * ((1 << bit_depth) - 1) * 64 + 34 < 2 ** 31


def _search_block_row(scal_ref, x, above, lx_rows, top_edge,
                      t_ref, tt_ref, wfwd_ref, winv_ref, n: int,
                      packed_min: bool = True):
    """Full 35-mode search + pipeline tail for one (n, W) block-row.

    above: (1, W) row directly above this block-row (already
        boundary-filled when this is the plane's top row).
    lx_rows: (n, W) the n source rows directly below this block-row
        (the caller guarantees these exist via replicated padding).
    top_edge: scalar bool-ish — whether this block-row is the plane's
        top row (controls the corner's boundary fill).
    """
    w = x.shape[1]
    boundary = scal_ref[0, 6]
    phase = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1) % n
    col = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    first_block = col < n

    # ---- Reference machinery --------------------------------------------
    # LC: left column of each block from this block-row; LX: the left
    # column of the next n rows (left reference rows N..2N-1).
    lc = jnp.where(first_block, boundary, _left_col(x, phase, n))   # (n, W)
    lx = jnp.where(first_block, boundary, _left_col(lx_rows, phase, n))
    # L: stacked left reference rows 0..2n-1 plus a pad row (sliced with
    # zero lerp weight only).
    l_stack = jnp.concatenate([lc, lx, lx[n - 1 : n, :]], axis=0)   # (2n+1, W)

    corner = _spread_phase(_roll(above, 1), 0, phase, n)            # (1, W)
    corner = jnp.where(first_block, boundary, corner)
    corner = jnp.where(top_edge, boundary, corner)

    last_val = above[:, w - 1 : w]                                  # (1, 1)

    # topshift[s] = above[c + s] with right-edge clamp (last-sample pad),
    # for s in 0..n+1; negshift[s] = above[c - s] for s in 1..n.
    topshift = {}
    for s in range(0, n + 2):
        r = _roll(above, -s)
        topshift[s] = jnp.where(col > w - 1 - s, last_val, r) if s else above
    negshift = {0: above}
    for s in range(1, n + 1):
        negshift[s] = _roll(above, s)

    def top_at(idx: int) -> jnp.ndarray:
        """above[c + idx], idx in [-n, n+1]."""
        return topshift[idx] if idx >= 0 else negshift[-idx]

    best_pred, best_mode = _mode_sweep(
        x, above, lc, l_stack, corner, top_at, negshift, phase, n,
        packed_min,
    )

    level, recon = _transform_quant_recon(
        scal_ref, x, best_pred, t_ref, tt_ref, wfwd_ref, winv_ref, n
    )
    return level, recon, best_mode


def _mode_sweep(x, above, lc, l_stack, corner, top_at, negshift,
                phase, n: int, packed_min: bool):
    """The 35-mode SATD sweep over one (n, W) block-row worth of lanes.

    Pure lane algebra: all reference access goes through the caller's
    machinery (above/lc/l_stack/corner/top_at/negshift), so the same
    sweep serves the open-loop slab kernel (references from source
    pixels) and the closed-loop wavefront kernel (references from the
    persistent reconstruction state).  Returns (best_pred (n, W),
    best_mode (1, W)); decision semantics = decide_modes("all", "satd").
    """
    w = x.shape[1]

    # Extension values for negative VERTICAL modes: ref[j], j in [-n, 0].
    # ref[0] = corner; ref[j<0] = left_arr[proj_j] (corner or LC row).
    def vert_ext(j: int, inv: int) -> jnp.ndarray:
        if j == 0:
            return corner
        proj = ((j + 1) * inv + 128) >> 8
        return corner if proj == 0 else lc[proj - 1 : proj, :]

    # ---- Mode sweep -------------------------------------------------------
    # F = WHT2D(x) and its |.| block sums feed the three shortcut
    # modes whose predictions are constant along one block axis.
    f_x = _wht_lanes(_wht_rows(x, n), phase, n)                      # (n, W)
    abs_f = jnp.abs(f_x)
    s_all = _block_sum(abs_f.sum(axis=0, keepdims=True), phase, n)   # (1, W)
    f0 = f_x[0:1, :]
    ph0 = (phase == 0).astype(jnp.int32)

    # Baselines: planar (mode 0) and DC (mode 1), SATD costs.
    total = _block_sum(above, phase, n) + lc.sum(axis=0, keepdims=True)
    dc_row = (total + n) // (2 * n)                                  # (1, W)
    dc_pred = jnp.broadcast_to(dc_row, (n, w))

    tr = _spread_phase(above, n - 1, phase, n)
    bl = _spread_phase(lc[n - 1 : n, :], n - 1, phase, n)
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    # one-multiply lerp: (n-q)*a + q*b == n*a + q*(b-a); int32 vector
    # multiplies are the VPU's slowest op, so halve them
    h = n * lc + (phase + 1) * (tr - lc)
    v = n * above + (rows_i + 1) * (bl - above)
    pl_pred = (h + v + n) >> n.bit_length()

    best_pred = pl_pred
    pl_cost = _satd(x - pl_pred, phase, n)               # planar = mode 0

    if packed_min:
        best = (best_pred, pl_cost * 64)

        def consider_cost(pred, cost, mode_idx, best):
            bp, bpk = best
            packed = cost * 64 + mode_idx
            take = packed < bpk
            return (
                jnp.where(take, pred + jnp.zeros_like(x), bp),
                jnp.minimum(packed, bpk),
            )
    else:
        best = (best_pred, pl_cost, jnp.zeros((1, w), jnp.int32))

        def consider_cost(pred, cost, mode_idx, best):
            bp, bc, bm = best
            take = cost < bc
            return (
                jnp.where(take, pred + jnp.zeros_like(x), bp),
                jnp.where(take, cost, bc),
                jnp.where(take, mode_idx, bm),
            )

    def consider(pred, mode_idx, best):
        return consider_cost(pred, _satd(x - pred, phase, n), mode_idx, best)

    # DC via the F shortcut: WHT2D(x - dc) == F except at (0, 0), where
    # it is F00 - n^2*dc — adjust the precomputed |F| sum at phase 0.
    dc_adj = (jnp.abs(f0 - n * n * dc_row) - jnp.abs(f0)) * ph0
    dc_cost = s_all + _block_sum(dc_adj, phase, n)
    best = consider_cost(dc_pred, dc_cost, 1, best)

    for mode in range(2, 35):
        angle = INTRA_PRED_ANGLE[mode - 2]
        vertical = mode >= 18

        if angle == 0:
            # WHT-linearity shortcuts: both pure modes copy one
            # reference line, so WHT2D(x - pred) differs from F along a
            # single row (mode 26) / the phase-0 lane column (mode 10).
            if vertical:   # mode 26: pred == above broadcast down rows
                wla = _wht_lanes(above, phase, n)
                adj = jnp.abs(f0 - n * wla) - jnp.abs(f0)
                cost = s_all + _block_sum(adj, phase, n)
                pred = jnp.broadcast_to(above, (n, w))
            else:          # mode 10: pred == lc broadcast across lanes
                wr_lc = _wht_rows(lc, n)
                adj = ((jnp.abs(f_x - n * wr_lc) - abs_f) * ph0).sum(
                    axis=0, keepdims=True
                )
                cost = s_all + _block_sum(adj, phase, n)
                pred = lc
            best = consider_cost(pred, cost, mode, best)
            continue

        if vertical and angle > 0:
            if n <= 16:
                # all rows' lerp operands come from the shared roll
                # cache; concatenate them and run ONE (n, W)
                # one-multiply lerp.  N == 32 stays on the per-row
                # loop below: the (32, W) concat temporaries (two per
                # mode, nine modes live across the sweep) blow the
                # 16 MB scoped-VMEM stack (measured: 36.9M at the
                # 512x1024 bench gate).
                a_side = jnp.concatenate(
                    [top_at(((i + 1) * angle) >> 5) for i in range(n)], axis=0
                )
                if angle == 32:                  # f == 0 on every row
                    pred = a_side
                else:
                    b_side = jnp.concatenate(
                        [top_at((((i + 1) * angle) >> 5) + 1)
                         for i in range(n)],
                        axis=0,
                    )
                    fv = ((rows_i + 1) * angle) & 31             # (n, 1)
                    pred = ((a_side << 5) + fv * (b_side - a_side) + 16) >> 5
            else:
                rows = []
                for i in range(n):
                    proj = (i + 1) * angle
                    ip, f = proj >> 5, proj & 31
                    ta = top_at(ip)
                    rows.append(ta if f == 0 else (
                        ((ta << 5) + f * (top_at(ip + 1) - ta) + 16) >> 5
                    ))
                pred = jnp.concatenate(rows, axis=0)
            best = consider(pred, mode, best)
            continue

        rows = []
        if vertical:
            # negative vertical: per-row base lerp + INV_ANGLE straddle
            for i in range(n):
                proj = (i + 1) * angle
                ip, f = proj >> 5, proj & 31
                # top region: lanes with p >= -ip (ri >= 1)
                ta, tb = top_at(ip), top_at(ip + 1)
                base = ta if f == 0 else (
                    ((ta << 5) + f * (tb - ta) + 16) >> 5
                )
                row = base
                inv = INV_ANGLE[angle]
                for p in range(0, min(-ip, n)):
                    ri = p + 1 + ip            # <= 0 here
                    ea = vert_ext(ri, inv)
                    eb = (
                        vert_ext(ri + 1, inv)
                        if ri + 1 <= 0
                        else negshift[p]       # ref[1] = above[c - p]
                    )
                    val = ea if f == 0 else (
                        ((ea << 5) + f * (eb - ea) + 16) >> 5
                    )
                    row = jnp.where(phase == p, val, row)
                rows.append(row)
            pred = jnp.concatenate(rows, axis=0)
        else:
            pred = jnp.zeros_like(x)
            inv = INV_ANGLE.get(angle, 0)
            for p in range(n):
                proj = (p + 1) * angle
                ip, f = proj >> 5, proj & 31
                if ip >= 0:
                    a_side = l_stack[ip : ip + n, :]
                    if f == 0:
                        pred_p = a_side
                    else:
                        b_side = l_stack[ip + 1 : ip + 1 + n, :]
                        pred_p = (
                            (a_side << 5) + f * (b_side - a_side) + 16
                        ) >> 5
                    pred = jnp.where(phase == p, pred_p, pred)
                    continue
                else:
                    # rows i >= -ip come from L; earlier rows from the
                    # TOP extension (per-phase static rolls of above)
                    def horiz_ext(j: int) -> jnp.ndarray:
                        if j == 0:
                            return corner
                        prj = ((j + 1) * inv + 128) >> 8
                        if prj == 0:
                            return corner
                        # top[prj] = above[c - p + prj - 1]
                        return top_at(prj - 1 - p) if prj - 1 - p >= 0 else \
                            negshift[p + 1 - prj]
                    row_list = []
                    for i in range(n):
                        ri = i + 1 + ip
                        if ri >= 1:
                            a_side = l_stack[ri - 1 : ri, :]
                            b_side = l_stack[ri : ri + 1, :]
                        else:
                            a_side = horiz_ext(ri)
                            b_side = (
                                horiz_ext(ri + 1) if ri + 1 <= 0
                                else l_stack[0:1, :]
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
        best_mode = best_packed % 64
    else:
        best_pred, _, best_mode = best
    return best_pred, best_mode


def _kernel(scal_ref, slab_ref, above_ref, next_ref, t_ref, tt_ref,
            wfwd_ref, winv_ref, recon_ref, levels_ref, modes_ref, n: int,
            packed_min: bool = True):
    """One grid step: a slab of max(N, 8) rows (2 block-rows at N == 4).

    The caller pads the plane with replicated-last-row slabs, so the
    block-row below any real block-row always exists: LX reads within
    the slab or from next_ref, never off the end.
    """
    by = pl.program_id(0)
    slab_rows = slab_ref.shape[0]
    boundary = scal_ref[0, 6]
    for r in range(slab_rows // n):
        if r == 0:
            above = jnp.where(
                by == 0, boundary, above_ref[slab_rows - 1 : slab_rows, :]
            )
            top_edge = by == 0
        else:
            above = slab_ref[r * n - 1 : r * n, :]
            top_edge = False
        if r == slab_rows // n - 1:
            lx_rows = next_ref[0:n, :]
        else:
            lx_rows = slab_ref[(r + 1) * n : (r + 2) * n, :]
        level, recon, best_mode = _search_block_row(
            scal_ref, slab_ref[r * n : (r + 1) * n, :], above, lx_rows,
            top_edge, t_ref, tt_ref, wfwd_ref, winv_ref, n,
            packed_min=packed_min,
        )
        sl = slice(r * n, (r + 1) * n)
        levels_ref[sl, :] = level
        recon_ref[sl, :] = recon
        modes_ref[sl, :] = jnp.broadcast_to(best_mode, recon.shape)


@lru_cache(maxsize=None)
def _build(n: int, height: int, width: int, interpret: bool,
           use_dst: bool = False, packed_min: bool = True):
    t_host = np.asarray(transform_matrix(n, use_dst=use_dst), dtype=np.int32)
    slab_rows = _slab_rows(n)
    nslabs = height // slab_rows
    wfwd = _col_weights(t_host, width, n)
    winv = _col_weights(t_host.T, width, n)

    slab_spec = pl.BlockSpec((slab_rows, width), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        partial(_kernel, n=n, packed_min=packed_min),
        grid=(nslabs,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            slab_spec,
            pl.BlockSpec((slab_rows, width),
                         lambda i: (jnp.maximum(i - 1, 0), 0),
                         memory_space=pltpu.VMEM),
            # next slab feeds the last block-row's LX; the final slab is
            # pure padding (outputs discarded), so clamping to itself is
            # never observed.
            pl.BlockSpec((slab_rows, width),
                         lambda i: (jnp.minimum(i + 1, nslabs - 1), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * n - 1, width), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * n - 1, width), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(slab_spec, slab_spec, slab_spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((nslabs * slab_rows, width), jnp.int32)
            for _ in range(3)
        ),
        interpret=interpret,
        # The 33-mode sweep's live (N, W) temporaries exceed Mosaic's
        # default 16 MB scoped-VMEM stack at N == 32 (~37 MB measured at
        # W = 1024); v5e has 128 MB of physical VMEM, so raise the cap
        # for the large-N build instead of splitting the sweep.
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
            if n >= 32 and not interpret else None
        ),
    )

    def run(scalars, plane):
        return call(
            scalars, plane, plane, plane,
            jnp.asarray(t_host),
            jnp.asarray(np.ascontiguousarray(t_host.T)),
            jnp.asarray(wfwd), jnp.asarray(winv),
        )

    return run


def mode_search_encode_plane(plane: jnp.ndarray, qp: int, n: int,
                             *, bit_depth: int = 8,
                             interpret: bool | None = None,
                             use_dst: bool = False,
                             dequant_rescale: bool = False,
                             _pad_lanes: bool | None = None):
    """Fused 35-mode SATD search + full pipeline for one plane.

    (H, W) -> dict(recon (H, W), levels_slab, modes_slab); decision
    semantics identical to decide_modes(mode_set="all", decision="satd").
    qp static.  N in {4, 8, 16, 32}, W % N == 0.
    """
    h, w = plane.shape
    if w % n or n not in (4, 8, 16, 32):
        raise ValueError("mode-search kernel: need N in (4,8,16,32), W%N==0")
    if use_dst and n != 4:
        raise ValueError("DST-VII is only defined at 4x4")
    if interpret is None:
        interpret = _interpret_default()
    nby = h // n
    src = plane.astype(jnp.int32)

    # Pad the lane axis to a vreg multiple (128): _mode_sweep's row-
    # concat patterns only Mosaic-compile when the lane width is
    # 128-aligned (e.g. W = 1080 fails).  Pad columns replicate the
    # plane's true last column, so real blocks' top-right reads into
    # the pad see EXACTLY extract_refs' column clamp (clip to w-1);
    # refs are source-fed (open-loop), so pad-block outputs never feed
    # real blocks.  128 % N == 0, so pads are whole fake blocks,
    # cropped from every output below.  The constraint is Mosaic-only,
    # so interpret mode skips the pad (it multiplies interpreter cost);
    # _pad_lanes=True forces it for coverage tests.
    pad_lanes = (not interpret) if _pad_lanes is None else _pad_lanes
    w_pad = -(-w // 128) * 128 if pad_lanes else w
    if w_pad != w:
        src = jnp.concatenate(
            [src, jnp.broadcast_to(src[:, w - 1 : w], (h, w_pad - w))],
            axis=1,
        )

    # Pad below with the plane's true last row, replicated, out to at
    # least one block-row past the coded region and a whole number of
    # slabs: the left reference's rows N..2N-1 then read EXACTLY what
    # extract_refs' row clamp produces (clip to h-1), including planes
    # whose height is not a block multiple.
    slab_rows = _slab_rows(n)
    rows_needed = nby * n
    h_pad = -(-(rows_needed + n) // slab_rows) * slab_rows
    x = jnp.concatenate(
        [src, jnp.broadcast_to(src[h - 1 : h, :], (h_pad - h, w_pad))],
        axis=0,
    )
    run = _build(n, h_pad, w_pad, interpret, use_dst,
                 _packed_min_ok(n, bit_depth))
    recon, levels, modes = run(
        _qp_scalars(qp, n, bit_depth, dequant_rescale), x
    )
    recon, levels, modes = (
        recon[:rows_needed, :w], levels[:rows_needed, :w],
        modes[:rows_needed, :w],
    )
    if rows_needed != h:
        recon = jnp.concatenate([recon, src[rows_needed:, :w]], axis=0)
    return {"recon": recon, "levels_slab": levels, "modes_slab": modes}
