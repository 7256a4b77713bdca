"""35-mode SATD search, v2: grouped-phase construction + WHT shortcuts.

Same decision semantics and outputs as mode_search_slab.py (bit-exact,
asserted in tests/test_pallas.py), restructured for fewer VMEM
instructions — the v1 kernel is VPU-instruction bound (round-2
profiling), so the win comes from doing the same integer arithmetic in
fewer, wider ops:

- **grouped phases** (horizontal family): phases p sharing the same
  integer projection ip = ((p+1)*angle) >> 5 read the same two rows of
  the stacked left reference, so the per-phase where-chains collapse
  into one masked select-accumulate per distinct ip — for shallow
  angles that is ONE op instead of N (e.g. angle 2 at N=8: all eight
  phases share ip=0);
- **unified reference stack** (negative horizontal angles): the
  spec's ref-array extension (INV_ANGLE projection of the top row) is
  prepended to the left stack once per mode, turning the per-(row,
  phase) extension branches of v1 into the same grouped slices;
- **WHT-linearity shortcuts** for DC / pure-horizontal (10) /
  pure-vertical (26): their predictions are constant along one block
  axis, so WHT2D(x - pred) differs from the precomputed F = WHT2D(x)
  in a single row / lane column — three full SATD passes become
  one-row adjustments of the precomputed |F| block sums;
- **packed cost*64+mode min**: the running (cost, mode) pair reduces
  with one jnp.minimum on cost*64+mode (SATD < 2^25 even at N=32, and
  equal-cost ties resolve to the lowest mode index exactly like v1's
  strict-< chain).

Reference files for parity: reference intra.py:78 (angular
projection), metrics.py (SATD decision target).
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
from nanohevc_tpu.kernels.mode_search_slab import (
    _left_col,
    _satd,
    _wht_lanes,
    _wht_rows,
)


# experiment toggles (temporary; flipped by the perf harness)
import os as _os
_GROUPED_HORIZ = _os.environ.get("MSV2_GROUPED", "1") == "1"
_F_SHORTCUTS = _os.environ.get("MSV2_SHORTCUTS", "1") == "1"
_VERT_CONCAT = _os.environ.get("MSV2_VCONCAT", "1") == "1"


def _phase_groups(angle: int, n: int) -> list[tuple[int, list[int]]]:
    """[(ip, [phases...])] for phases grouped by integer projection."""
    groups: dict[int, list[int]] = {}
    for p in range(n):
        ip = ((p + 1) * angle) >> 5
        groups.setdefault(ip, []).append(p)
    return sorted(groups.items())


def _search_block_row_v2(scal_ref, x, above, lx_rows, top_edge,
                         t_ref, tt_ref, wfwd_ref, winv_ref, n: int):
    """35-mode search + pipeline tail for one (n, W) block-row.

    Identical contract to mode_search_slab._search_block_row.
    """
    w = x.shape[1]
    boundary = scal_ref[0, 6]
    phase = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1) % n
    col = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    first_block = col < n

    # ---- Reference machinery --------------------------------------------
    lc = jnp.where(first_block, boundary, _left_col(x, phase, n))   # (n, W)
    lx = jnp.where(first_block, boundary, _left_col(lx_rows, phase, n))
    l_stack = jnp.concatenate([lc, lx, lx[n - 1 : n, :]], axis=0)   # (2n+1, W)

    corner = _spread_phase(_roll(above, 1), 0, phase, n)            # (1, W)
    corner = jnp.where(first_block, boundary, corner)
    corner = jnp.where(top_edge, boundary, corner)

    last_val = above[:, w - 1 : w]                                  # (1, 1)
    topshift = {}
    for s in range(0, n + 2):
        r = _roll(above, -s)
        topshift[s] = jnp.where(col > w - 1 - s, last_val, r) if s else above
    negshift = {0: above}
    for s in range(1, n + 1):
        negshift[s] = _roll(above, s)

    def top_at(idx: int) -> jnp.ndarray:
        return topshift[idx] if idx >= 0 else negshift[-idx]

    # anchors: above[block_start + s] spread across the block (the
    # horizontal modes' top-row extension is block-anchored, not
    # lane-relative); anchor(-1) is the corner.
    anchor_cache: dict[int, jnp.ndarray] = {-1: corner}

    def anchor(s: int) -> jnp.ndarray:
        if s not in anchor_cache:
            anchor_cache[s] = _spread_phase(above, s, phase, n)
        return anchor_cache[s]

    def vert_ext(j: int, inv: int) -> jnp.ndarray:
        if j == 0:
            return corner
        proj = ((j + 1) * inv + 128) >> 8
        return corner if proj == 0 else lc[proj - 1 : proj, :]

    def horiz_ext(j: int, inv: int) -> jnp.ndarray:
        if j == 0:
            return corner
        proj = ((j + 1) * inv + 128) >> 8
        # above[block_start + proj - 1]; proj == 0 is the corner
        return anchor(proj - 1)

    # ---- Precompute F = WHT2D(x) and its block sums ----------------------
    f_x = _wht_lanes(_wht_rows(x, n), phase, n)                      # (n, W)
    abs_f = jnp.abs(f_x)
    s_all = _block_sum(abs_f.sum(axis=0, keepdims=True), phase, n)   # (1, W)
    ph0 = (phase == 0).astype(jnp.int32)

    rows_i = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    total = _block_sum(above, phase, n) + lc.sum(axis=0, keepdims=True)
    dc_row = (total + n) // (2 * n)                                  # (1, W)
    dc_pred = jnp.broadcast_to(dc_row, (n, w))

    # ---- Planar (full SATD: the rounding is not separable) ---------------
    tr = _spread_phase(above, n - 1, phase, n)
    bl = _spread_phase(lc[n - 1 : n, :], n - 1, phase, n)
    # one-multiply lerp: (n-q)*a + q*b == n*a + q*(b-a)
    h = n * lc + (phase + 1) * (tr - lc)
    v = n * above + (rows_i + 1) * (bl - above)
    pl_pred = (h + v + n) >> n.bit_length()

    best_pred = pl_pred
    best_packed = _satd(x - pl_pred, phase, n) * 64                  # mode 0

    def consider_cost(pred, cost, mode_idx, best):
        bp, bpk = best
        packed = cost * 64 + mode_idx
        take = packed < bpk
        return (
            jnp.where(take, pred + jnp.zeros_like(x), bp),
            jnp.minimum(packed, bpk),
        )

    def consider(pred, mode_idx, best):
        return consider_cost(pred, _satd(x - pred, phase, n), mode_idx, best)

    # ---- DC via the F shortcut: T differs from F only at (0, 0) ----------
    if _F_SHORTCUTS:
        f0 = f_x[0:1, :]
        dc_adj = (jnp.abs(f0 - n * n * dc_row) - jnp.abs(f0)) * ph0
        dc_cost = s_all + _block_sum(dc_adj, phase, n)
        best = consider_cost(dc_pred, dc_cost, 1, (best_pred, best_packed))
    else:
        best = consider(dc_pred, 1, (best_pred, best_packed))

    for mode in range(2, 35):
        angle = INTRA_PRED_ANGLE[mode - 2]
        vertical = mode >= 18

        if angle == 0 and _F_SHORTCUTS:
            if vertical:  # mode 26: pred == above, T differs in row 0
                wla = _wht_lanes(above, phase, n)
                adj = jnp.abs(f0 - n * wla) - jnp.abs(f0)
                cost = s_all + _block_sum(adj, phase, n)
                pred = jnp.broadcast_to(above, (n, w))
            else:         # mode 10: pred == lc, T differs at phase-0 lanes
                wr_lc = _wht_rows(lc, n)
                adj = ((jnp.abs(f_x - n * wr_lc) - abs_f) * ph0).sum(
                    axis=0, keepdims=True
                )
                cost = s_all + _block_sum(adj, phase, n)
                pred = lc
            best = consider_cost(pred, cost, mode, best)
            continue

        if vertical and angle >= 0 and _VERT_CONCAT:
            # rows i share the cached global rolls; one (n, W) lerp
            a_side = jnp.concatenate(
                [top_at(((i + 1) * angle) >> 5) for i in range(n)], axis=0
            )
            b_side = jnp.concatenate(
                [top_at((((i + 1) * angle) >> 5) + 1) for i in range(n)],
                axis=0,
            )
            fv = ((rows_i + 1) * angle) & 31                     # (n, 1)
            pred = ((a_side << 5) + fv * (b_side - a_side) + 16) >> 5
            best = consider(pred, mode, best)
            continue

        if vertical and angle >= 0:
            rows = []
            for i in range(n):
                proj = (i + 1) * angle
                ip, f = proj >> 5, proj & 31
                a_side = top_at(ip)
                b_side = top_at(ip + 1)
                rows.append(((a_side << 5) + f * (b_side - a_side) + 16) >> 5)
            best = consider(jnp.concatenate(rows, axis=0), mode, best)
            continue

        if vertical:
            # negative vertical: v1 structure (per-row base + straddle)
            inv = INV_ANGLE[angle]
            rows = []
            for i in range(n):
                proj = (i + 1) * angle
                ip, f = proj >> 5, proj & 31
                ta, tb = top_at(ip), top_at(ip + 1)
                base = ((ta << 5) + f * (tb - ta) + 16) >> 5
                row = base
                for p in range(0, min(-ip, n)):
                    ri = p + 1 + ip
                    ea = vert_ext(ri, inv)
                    eb = (
                        vert_ext(ri + 1, inv) if ri + 1 <= 0 else negshift[p]
                    )
                    val = ((ea << 5) + f * (eb - ea) + 16) >> 5
                    row = jnp.where(phase == p, val, row)
                rows.append(row)
            best = consider(jnp.concatenate(rows, axis=0), mode, best)
            continue

        if not _GROUPED_HORIZ:
            # v1 per-phase horizontal construction
            pred = jnp.zeros_like(x)
            inv = INV_ANGLE.get(angle, 0)
            for p in range(n):
                proj = (p + 1) * angle
                ip, f = proj >> 5, proj & 31
                if ip >= 0:
                    a_side = l_stack[ip : ip + n, :]
                    b_side = l_stack[ip + 1 : ip + 1 + n, :]
                    pred_p = ((a_side << 5) + f * (b_side - a_side) + 16) >> 5
                else:
                    def h_ext(j: int) -> jnp.ndarray:
                        if j == 0:
                            return corner
                        prj = ((j + 1) * inv + 128) >> 8
                        if prj == 0:
                            return corner
                        return top_at(prj - 1 - p) if prj - 1 - p >= 0 else \
                            negshift[p + 1 - prj]
                    row_list = []
                    for i in range(n):
                        ri = i + 1 + ip
                        if ri >= 1:
                            a_side = l_stack[ri - 1 : ri, :]
                            b_side = l_stack[ri : ri + 1, :]
                        else:
                            a_side = h_ext(ri)
                            b_side = (
                                h_ext(ri + 1) if ri + 1 <= 0
                                else l_stack[0:1, :]
                            )
                        row_list.append(
                            ((a_side << 5) + f * (b_side - a_side) + 16) >> 5
                        )
                    pred_p = jnp.concatenate(row_list, axis=0)
                pred = jnp.where(phase == p, pred_p, pred)
            best = consider(pred, mode, best)
            continue

        # ---- horizontal family: grouped phases over a unified stack ----
        groups = _phase_groups(angle, n)
        if angle > 0:
            stack = l_stack
            k_off = 0
        else:
            inv = INV_ANGLE[angle]
            k = -groups[0][0]          # deepest extension, k >= 1
            ext_rows = [horiz_ext(t + 1, inv) for t in range(-k, 0)]
            stack = jnp.concatenate(ext_rows + [l_stack], axis=0)
            k_off = k
        fvec = ((phase + 1) * angle) & 31
        ipvec = jax.lax.shift_right_arithmetic(
            (phase + 1) * angle, jnp.int32(5)
        )
        if len(groups) == 1:
            ip = groups[0][0]
            sa = stack[k_off + ip : k_off + ip + n, :]
            sb = stack[k_off + ip + 1 : k_off + ip + 1 + n, :]
        else:
            ip = groups[-1][0]
            sa = stack[k_off + ip : k_off + ip + n, :]
            sb = stack[k_off + ip + 1 : k_off + ip + 1 + n, :]
            for ip, _ in reversed(groups[:-1]):
                m = ipvec == ip
                sa = jnp.where(m, stack[k_off + ip : k_off + ip + n, :], sa)
                sb = jnp.where(
                    m, stack[k_off + ip + 1 : k_off + ip + 1 + n, :], sb
                )
        pred = ((sa << 5) + fvec * (sb - sa) + 16) >> 5
        best = consider(pred, mode, best)

    best_pred, best_packed = best
    best_mode = best_packed % 64

    level, recon = _transform_quant_recon(
        scal_ref, x, best_pred, t_ref, tt_ref, wfwd_ref, winv_ref, n
    )
    return level, recon, best_mode


def _kernel(scal_ref, slab_ref, above_ref, next_ref, t_ref, tt_ref,
            wfwd_ref, winv_ref, recon_ref, levels_ref, modes_ref, n: int):
    """Grid step over slabs; same plumbing as mode_search_slab._kernel."""
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
        level, recon, best_mode = _search_block_row_v2(
            scal_ref, slab_ref[r * n : (r + 1) * n, :], above, lx_rows,
            top_edge, t_ref, tt_ref, wfwd_ref, winv_ref, n,
        )
        sl = slice(r * n, (r + 1) * n)
        levels_ref[sl, :] = level
        recon_ref[sl, :] = recon
        modes_ref[sl, :] = jnp.broadcast_to(best_mode, recon.shape)


@lru_cache(maxsize=None)
def _build(n: int, height: int, width: int, interpret: bool,
           use_dst: bool = False):
    t_host = np.asarray(transform_matrix(n, use_dst=use_dst), dtype=np.int32)
    slab_rows = _slab_rows(n)
    nslabs = height // slab_rows
    wfwd = _col_weights(t_host, width, n)
    winv = _col_weights(t_host.T, width, n)

    slab_spec = pl.BlockSpec((slab_rows, width), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        partial(_kernel, n=n),
        grid=(nslabs,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            slab_spec,
            pl.BlockSpec((slab_rows, width),
                         lambda i: (jnp.maximum(i - 1, 0), 0),
                         memory_space=pltpu.VMEM),
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
    )

    def run(scalars, plane):
        return call(
            scalars, plane, plane, plane,
            jnp.asarray(t_host),
            jnp.asarray(np.ascontiguousarray(t_host.T)),
            jnp.asarray(wfwd), jnp.asarray(winv),
        )

    return run


def mode_search_encode_plane_v2(plane: jnp.ndarray, qp: int, n: int,
                                *, bit_depth: int = 8,
                                interpret: bool | None = None,
                                use_dst: bool = False,
                                dequant_rescale: bool = False):
    """Drop-in replacement for mode_search_encode_plane (bit-exact)."""
    h, w = plane.shape
    if w % n or n not in (4, 8, 16, 32):
        raise ValueError("mode-search kernel: need N in (4,8,16,32), W%N==0")
    if use_dst and n != 4:
        raise ValueError("DST-VII is only defined at 4x4")
    if interpret is None:
        interpret = _interpret_default()
    nby = h // n
    src = plane.astype(jnp.int32)

    slab_rows = _slab_rows(n)
    rows_needed = nby * n
    h_pad = -(-(rows_needed + n) // slab_rows) * slab_rows
    x = jnp.concatenate(
        [src, jnp.broadcast_to(src[h - 1 : h, :], (h_pad - h, w))], axis=0
    )
    run = _build(n, h_pad, w, interpret, use_dst)
    recon, levels, modes = run(
        _qp_scalars(qp, n, bit_depth, dequant_rescale), x
    )
    recon, levels, modes = (
        recon[:rows_needed], levels[:rows_needed], modes[:rows_needed]
    )
    if rows_needed != h:
        recon = jnp.concatenate([recon, src[rows_needed:, :]], axis=0)
    return {"recon": recon, "levels_slab": levels, "modes_slab": modes}
