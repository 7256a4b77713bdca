"""In-kernel closed-loop wavefront: the whole diagonal scan in one Pallas call.

The XLA wavefront (models/wavefront.py) is already gather-free, but it
still pays ~40 HLO ops of launch/latency per diagonal — 374 times per
1080p frame.  This kernel collapses each diagonal step to ONE grid
iteration of one Pallas program, with the cross-step reconstruction
state living in VMEM scratch that persists across the (sequential) TPU
grid:

- the diagonal's blocks arrive as a "diagonal slab" (N, B*nby*N):
  lane c belongs to frame f = c//(nby*N) and wavefront slot
  by = (c//N) % nby (the block-row; each anti-diagonal holds at most
  one block per block-row) with phase c%N.  Packing the frame batch
  into lanes (not the grid) keeps the sequential depth at ndiag for
  any batch — B frames' same-index diagonals per step.  All the
  slab-pipeline lane algebra (rolls, butterfly block sums, phase
  spreads — kernels/slab_pipeline.py) applies unchanged with
  W = B*nby*N lanes;
- the only state prediction needs is one bottom row and one right
  column per slot, both naturally lane-shaped:
    bot  (1, W): last diagonal's reconstructed bottom rows.  Slot by's
         top reference is slot by-1's entry — `roll(bot, N)`, one op;
    rc   (N, W): last diagonal's right columns, pre-spread across each
         slot's lanes.  Slot by's left reference is its own entry —
         no shift at all (slot by encoded block (by, bx-1) last step);
- boundary fills: slot 0 masks its rolled-in top to 1<<(bd-1); the
  slot with bx == 0 (lane test `c//N == d`) masks its left the same
  way.  Invalid slots (bx out of range) compute garbage that provably
  only ever flows to other invalid slots, and the host-side unskew
  drops it;
- mode decision is the open-loop DC/planar parity rule (top_right =
  top[N-1], bottom_left = left[N-1] — reference __main__.py:167-168),
  so no reference-array extensions are needed at all.

Per-step cost falls from ~40 XLA ops to one fused VPU program over
(N, nby*N) lanes; the 374-step dependency chain stays, but each link
is now microseconds.  Bit-exact vs models/wavefront.py (and therefore
vs the sequential per-block oracle): tests/test_wavefront.py.

Scope: dc_planar mode set with energy decision (the closed-loop
flagship config), N in {4, 8, 16, 32}, DCT or DST-VII (N == 4), any
bit depth, parity or spec-rescale dequant.  The 35-mode SATD search
stays on the XLA wavefront path.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nanohevc_tpu.kernels.slab_pipeline import (
    _block_sum,
    _roll,
    _spread_phase,
    _transform_quant_recon,
    _col_weights,
    _interpret_default,
)
from nanohevc_tpu.tables import transform_matrix


def _kernel(scal_ref, blocks_ref, t_ref, tt_ref, wfwd_ref, winv_ref,
            rec_ref, lev_ref, modes_ref, bot_ref, rc_ref,
            *, n: int, nby: int, ndiag: int):
    """One diagonal: (N, B*nby*N) blocks + VMEM state -> recon/levels/mode.

    The frame-batch axis is packed into LANES (frame f's slot by at
    lanes [f*nby*n + by*n, +n)), not the grid: B frames' same-index
    diagonals run in one step (multi-frame diagonal interleaving), so
    the sequential grid depth stays ndiag regardless of batch.  All
    lane algebra is n-group-local; the one cross-group op, the
    roll-by-n feeding slot by from by-1, crosses frame boundaries only
    into slot by == 0, which is masked to the boundary fill anyway.
    """
    d = pl.program_id(0)
    w_d = blocks_ref.shape[1]
    boundary = scal_ref[0, 6]

    @pl.when(d == 0)
    def _():
        bot_ref[:, :] = jnp.zeros_like(bot_ref)
        rc_ref[:, :] = jnp.zeros_like(rc_ref)

    x = blocks_ref[0:n, :]                                   # (n, W)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, w_d), 1)
    phase = lane % n
    slot = (lane // n) % nby                                 # block-row by

    # Top reference: slot by reads slot by-1's bottom row from last step.
    top = _roll(bot_ref[0:1, :], n)
    top = jnp.where(slot == 0, boundary, top)                # by == 0 edge
    # Left reference: slot by encoded block (by, bx-1) last step — its
    # right column is already in this slot's lanes, pre-spread.
    lc = jnp.where(slot == d, boundary, rc_ref[0:n, :])      # bx == 0 edge

    # DC = floor((sum top + sum left + N) / 2N) per block.
    top_sum = _block_sum(top, phase, n)
    left_sum = lc.sum(axis=0, keepdims=True)
    dc_pred = (top_sum + left_sum + n) // (2 * n)

    # Planar (parity: top_right = top[N-1], bottom_left = left[N-1]).
    tr = _spread_phase(top, n - 1, phase, n)
    bl = lc[n - 1 : n, :]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    # one-multiply lerp: (n-q)*a + q*b == n*a + q*(b-a)
    hor = n * lc + (phase + 1) * (tr - lc)
    ver = n * top + (rows + 1) * (bl - top)
    pl_pred = (hor + ver + n) >> n.bit_length()

    # Energy decision (ties -> DC), then the shared pipeline tail.
    rd = x - dc_pred
    rp = x - pl_pred
    e_dc = _block_sum((rd * rd).sum(axis=0, keepdims=True), phase, n)
    e_pl = _block_sum((rp * rp).sum(axis=0, keepdims=True), phase, n)
    use_dc = e_dc <= e_pl
    pred = jnp.where(use_dc, dc_pred + jnp.zeros_like(x), pl_pred)
    level, recon = _transform_quant_recon(
        scal_ref, x, pred, t_ref, tt_ref, wfwd_ref, winv_ref, n
    )

    # Persist the two reconstruction boundaries for the next diagonal.
    bot_ref[0:1, :] = recon[n - 1 : n, :]
    rc_ref[0:n, :] = _spread_phase(recon, n - 1, phase, n)

    rec_ref[0:n, :] = recon
    lev_ref[0:n, :] = level
    modes_ref[:, :] = jnp.broadcast_to(
        use_dc.astype(jnp.int32), modes_ref.shape
    )


@lru_cache(maxsize=None)
def _build(n: int, nby: int, ndiag: int, batch: int, interpret: bool,
           use_dst: bool):
    w_d = batch * nby * n               # frames packed along lanes
    slab = max(n, 8)                    # Mosaic sublane minimum
    t_host = np.asarray(transform_matrix(n, use_dst=use_dst), dtype=np.int32)
    wfwd = _col_weights(t_host, w_d, n)
    winv = _col_weights(t_host.T, w_d, n)

    def slab_spec():
        return pl.BlockSpec(
            (slab, w_d), lambda d: (d, 0), memory_space=pltpu.VMEM,
        )

    call = pl.pallas_call(
        partial(_kernel, n=n, nby=nby, ndiag=ndiag),
        grid=(ndiag,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            slab_spec(),
            pl.BlockSpec((n, n), lambda d: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n), lambda d: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * n - 1, w_d), lambda d: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * n - 1, w_d), lambda d: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            slab_spec(),
            slab_spec(),
            # Mosaic needs >= 8 sublanes per block; row 0 carries the
            # decision, rows 1-7 are padding.
            pl.BlockSpec((8, w_d), lambda d: (d, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((ndiag * slab, w_d), jnp.int32),
            jax.ShapeDtypeStruct((ndiag * slab, w_d), jnp.int32),
            jax.ShapeDtypeStruct((ndiag * 8, w_d), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, w_d), jnp.int32),      # bot rows
            pltpu.VMEM((n, w_d), jnp.int32),      # right cols (spread)
        ],
        interpret=interpret,
    )

    def run(scalars, diag_slabs):
        return call(
            scalars, diag_slabs,
            jnp.asarray(t_host),
            jnp.asarray(np.ascontiguousarray(t_host.T)),
            jnp.asarray(wfwd), jnp.asarray(winv),
        )

    return run


def _qp_scalars_traced(qp, n: int, bit_depth: int,
                       dequant_rescale: bool) -> jnp.ndarray:
    """SMEM scalar vector from a TRACED qp (device table lookups)."""
    from nanohevc_tpu.tables import DEQUANT_SCALE, QUANT_SCALE

    qp_c = jnp.clip(jnp.asarray(qp, jnp.int32), 0, 51)
    per, rem = qp_c // 6, qp_c % 6
    log2n = n.bit_length() - 1
    qshift = 14 + per + log2n
    dq_shift = (6 - log2n if dequant_rescale else 4) - per
    return jnp.stack(
        [
            jnp.take(jnp.asarray(QUANT_SCALE, jnp.int32), rem),
            qshift,
            (jnp.left_shift(1, qshift)) // 3,
            jnp.take(jnp.asarray(DEQUANT_SCALE, jnp.int32), rem),
            dq_shift,
            jnp.int32((1 << bit_depth) - 1),
            jnp.int32(1 << (bit_depth - 1)),
        ]
    ).reshape(1, 7)


def wavefront_kernel_supported(n: int, mode_set: str, decision: str,
                               use_dst: bool) -> bool:
    """Whether the fused wavefront kernel covers this configuration."""
    return (
        mode_set == "dc_planar"
        and decision == "energy"
        and n in (4, 8, 16, 32)
        and (not use_dst or n == 4)
    )


def wavefront_encode_blocks(
    blocks_sk: jnp.ndarray,
    qp,
    *,
    n: int,
    nby: int,
    use_dst: bool = False,
    bit_depth: int = 8,
    dequant_rescale: bool = False,
    interpret: bool | None = None,
):
    """Skewed blocks (..., ndiag, nby, N, N) -> (rec, levels, dc_wins).

    Input and outputs share the skewed (diagonal, slot) layout of
    models/wavefront.py; the caller owns tiling/unskewing.  A leading
    batch axis is optional.  dc_wins is (..., ndiag, nby) int32 (1 where
    DC won), matching decide_modes' tie-to-DC rule.
    """
    if interpret is None:
        interpret = _interpret_default()
    squeeze = blocks_sk.ndim == 4
    if squeeze:
        blocks_sk = blocks_sk[None]
    batch, ndiag = blocks_sk.shape[0], blocks_sk.shape[1]
    w_d = batch * nby * n
    slab = max(n, 8)

    # (B, ndiag, nby, N, N) -> diagonal slabs (ndiag*slab, B*nby*N):
    # frames side by side in lanes, one slab row-group per diagonal.
    diag = blocks_sk.transpose(1, 3, 0, 2, 4).reshape(ndiag, n, w_d)
    if slab != n:
        diag = jnp.concatenate(
            [diag, jnp.zeros((ndiag, slab - n, w_d), jnp.int32)], axis=1
        )
    diag = diag.reshape(ndiag * slab, w_d)

    run = _build(n, nby, ndiag, batch, interpret, use_dst)
    scal = _qp_scalars_traced(qp, n, bit_depth, dequant_rescale)
    rec, lev, modes = run(scal, diag)

    def unslab(a):
        a = a.reshape(ndiag, slab, batch, nby, n)[:, :n]
        a = a.transpose(2, 0, 3, 1, 4)                # (B, ndiag, nby, N, N)
        return a[0] if squeeze else a

    # per-lane dc_wins -> one value per slot (uniform within a block)
    dc_wins = modes.reshape(ndiag, 8, batch, nby, n)[:, 0, :, :, 0]
    dc_wins = dc_wins.transpose(1, 0, 2)              # (B, ndiag, nby)
    if squeeze:
        dc_wins = dc_wins[0]
    return unslab(rec), unslab(lev), dc_wins
