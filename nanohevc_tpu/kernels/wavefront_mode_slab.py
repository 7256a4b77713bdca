"""In-kernel closed-loop wavefront with the FULL 35-mode SATD search.

kernels/wavefront_slab.py fuses the dc_planar closed loop into one
Pallas grid; the 35-mode search stayed on the XLA scan (374 dispatches
of a (nby, 33, N, N)-intermediate HBM-bound search per 1080p frame,
~163 Mpix/s at the measured batch-4 sweet spot).  This kernel runs the
whole search in VMEM per diagonal, reusing the open-loop slab search's
lane algebra (kernels/mode_search_slab._mode_sweep) with the reference
machinery swapped from source pixels to the persistent reconstruction
state:

- `bot` (1, W): last diagonal's reconstructed bottom rows; slot by's
  top row T[1..N] is slot by-1's entry — `roll(bot, N)`;
- `rc` (N, W): last diagonal's right columns, pre-spread; slot by's
  left column L[1..N] is its own entry (block (by, bx-1) was encoded
  by the same slot one step earlier);
- `corner` (1, W): T[0] = L[0] = the bottom-right pixel of block
  (by-1, bx-1).  That pixel is the last row of slot by-1's `rc` as it
  stood BEFORE the previous step's update, so each step saves
  `roll(rc_old[N-1], N)` before overwriting `rc` — a one-step-delayed
  relay instead of a second history buffer;
- reference EXTENSIONS follow the closed-loop availability rule the
  XLA wavefront defines (models/wavefront.py:_read_refs_skewed): the
  top-right extension T[N+1..2N] is the not-yet-reconstructed block
  (by-1, bx+1) — same diagonal, so it reads as unwritten zeros —
  except at the frame's last block-column, where the buffer tail
  replicates T[N]; symmetrically the below-left extension L[N+1..2N]
  is zeros except at the last block-row (replicates L[N]).  Frame
  edges (by == 0 / bx == 0) fill the whole side with 1 << (bd-1).

Everything else — the WHT-shortcut DC/10/26 costs, concatenated-lerp
vertical family, per-phase horizontal slices, packed (cost, mode) min,
fused transform/quant/recon tail — is shared code with the open-loop
kernel, so decision semantics are identical to
decide_modes(mode_set="all", decision="satd") over closed-loop
references.  Bit-exact vs the XLA wavefront (itself pinned to the
sequential per-block oracle): tests/test_wavefront.py.

Scope: N in {4, 8, 16, 32}, DCT or DST-VII (N == 4), any bit depth,
parity or spec-rescale dequant; smoothing stays on the XLA path.
Reference scope note: the reference encoder has no closed loop and no
mode search beyond DC/planar (reference __main__.py:162-179); this is
a capability extension, mirrored by the decoder in models/wavefront.py.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nanohevc_tpu.tables import transform_matrix
from nanohevc_tpu.kernels.slab_pipeline import (
    _col_weights,
    _interpret_default,
    _roll,
    _spread_phase,
    _transform_quant_recon,
)
from nanohevc_tpu.kernels.mode_search_slab import _mode_sweep, _packed_min_ok
from nanohevc_tpu.kernels.wavefront_slab import _qp_scalars_traced


def _kernel(scal_ref, blocks_ref, t_ref, tt_ref, wfwd_ref, winv_ref,
            rec_ref, lev_ref, modes_ref, bot_ref, rc_ref, corner_ref,
            *, n: int, nby: int, nbx: int, packed_min: bool):
    """One diagonal: (N, B*nby*N) blocks + recon state -> 35-mode outputs.

    Lane layout as in wavefront_slab._kernel: frame f's wavefront slot
    by (the block-row; bx = d - by) occupies lanes
    [f*nby*n + by*n, +n).  Invalid slots (bx out of range) compute
    garbage that only ever flows to other invalid slots (the valid
    window moves one slot down per step, exactly like the state relay);
    the host-side deskew drops it.
    """
    d = pl.program_id(0)
    w_d = blocks_ref.shape[1]
    boundary = scal_ref[0, 6]

    @pl.when(d == 0)
    def _():
        bot_ref[:, :] = jnp.zeros_like(bot_ref)
        rc_ref[:, :] = jnp.zeros_like(rc_ref)
        corner_ref[:, :] = jnp.zeros_like(corner_ref)

    x = blocks_ref[0:n, :]                                   # (n, W)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, w_d), 1)
    phase = lane % n
    slot = (lane // n) % nby                                 # block-row by

    top_edge = slot == 0                                     # by == 0
    left_edge = slot == d                                    # bx == 0
    last_bcol = slot == d - (nbx - 1)                        # bx == nbx-1
    last_brow = slot == nby - 1                              # by == nby-1

    rc_raw = rc_ref[0:n, :]

    # ---- Closed-loop reference machinery ---------------------------------
    above = jnp.where(top_edge, boundary, _roll(bot_ref[0:1, :], n))
    # T[N+1..2N]: zeros (block (by-1, bx+1) is on THIS diagonal, not yet
    # reconstructed) except frame-right replication of T[N]; a top-edge
    # block's whole top row (extension included) is the boundary fill.
    ext_t = jnp.where(
        top_edge, boundary,
        jnp.where(last_bcol, _spread_phase(above, n - 1, phase, n), 0),
    )
    corner = jnp.where(top_edge | left_edge, boundary, corner_ref[0:1, :])
    lc = jnp.where(left_edge, boundary, rc_raw)              # (n, W)
    # L[N+1..2N]: zeros except frame-bottom replication of L[N]; a
    # left-edge block's whole left column is the boundary fill (lc is
    # already boundary there, so reusing its last row covers both).
    ext_l = jnp.where(left_edge | last_brow, lc[n - 1 : n, :], 0)
    l_stack = jnp.concatenate([lc] + [ext_l] * (n + 1), axis=0)  # (2n+1, W)

    # topshift[s][p] = T[1 + s + p]: within-block lanes come from
    # `above`, lanes past the block's top row spill into the extension
    # row (per-slot constant, so its roll alignment is phase algebra).
    topshift = {0: above}
    for s in range(1, n + 2):
        topshift[s] = jnp.where(
            phase < n - s, _roll(above, -s), _roll(ext_t, n - s)
        )
    negshift = {0: above}
    for s in range(1, n + 1):
        negshift[s] = _roll(above, s)

    def top_at(idx: int) -> jnp.ndarray:
        return topshift[idx] if idx >= 0 else negshift[-idx]

    best_pred, best_mode = _mode_sweep(
        x, above, lc, l_stack, corner, top_at, negshift, phase, n,
        packed_min,
    )
    level, recon = _transform_quant_recon(
        scal_ref, x, best_pred, t_ref, tt_ref, wfwd_ref, winv_ref, n
    )

    # ---- State relay for the next diagonal -------------------------------
    # Next step's corner for slot by+1 = bottom-right of (by, bx-1) =
    # the last row of THIS step's pre-update rc, shifted one slot down.
    corner_ref[0:1, :] = _roll(rc_raw[n - 1 : n, :], n)
    bot_ref[0:1, :] = recon[n - 1 : n, :]
    rc_ref[0:n, :] = _spread_phase(recon, n - 1, phase, n)

    rec_ref[0:n, :] = recon
    lev_ref[0:n, :] = level
    modes_ref[:, :] = jnp.broadcast_to(best_mode, modes_ref.shape)


def _lane_pad(w_d: int) -> int:
    """Lane width rounded up to a vreg multiple (128 lanes).

    The mode sweep's row-concat patterns (_mode_sweep) only Mosaic-
    compile when the lane axis is 128-aligned — at e.g. w_d = 1080
    (1080p, batch 1) tpu.concatenate fails with a layout-offset
    mismatch.  Pad lanes form fake wavefront slots whose garbage only
    ever reaches real lanes through the +n state-relay rolls into
    slot 0, where top_edge/left_edge boundary fills override it; the
    host-side unslab drops the pad columns.
    """
    return -(-w_d // 128) * 128


@lru_cache(maxsize=None)
def _build(n: int, nby: int, nbx: int, ndiag: int, batch: int,
           interpret: bool, use_dst: bool, packed_min: bool):
    w_d = _lane_pad(batch * nby * n)
    slab = max(n, 8)
    t_host = np.asarray(transform_matrix(n, use_dst=use_dst), dtype=np.int32)
    wfwd = _col_weights(t_host, w_d, n)
    winv = _col_weights(t_host.T, w_d, n)

    def slab_spec():
        return pl.BlockSpec(
            (slab, w_d), lambda d: (d, 0), memory_space=pltpu.VMEM,
        )

    call = pl.pallas_call(
        partial(_kernel, n=n, nby=nby, nbx=nbx, packed_min=packed_min),
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
            pltpu.VMEM((1, w_d), jnp.int32),      # delayed corner relay
        ],
        interpret=interpret,
        # The 33-mode sweep's live (N, W_d) temporaries exceed the 16 MB
        # scoped-VMEM default once W_d (= batch * nby * N) passes ~2k
        # lanes; the chip has 128 MB, so raise the cap.
        compiler_params=(
            None if interpret
            else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
        ),
    )

    def run(scalars, diag_slabs):
        return call(
            scalars, diag_slabs,
            jnp.asarray(t_host),
            jnp.asarray(np.ascontiguousarray(t_host.T)),
            jnp.asarray(wfwd), jnp.asarray(winv),
        )

    return run


def wavefront_mode_kernel_supported(n: int, mode_set: str, decision: str,
                                    use_dst: bool) -> bool:
    """Whether the fused 35-mode wavefront kernel covers this config."""
    return (
        mode_set == "all"
        and decision == "satd"
        and n in (4, 8, 16, 32)
        and (not use_dst or n == 4)
    )


def wavefront_mode_search_blocks(
    blocks_sk: jnp.ndarray,
    qp,
    *,
    n: int,
    nby: int,
    nbx: int,
    use_dst: bool = False,
    bit_depth: int = 8,
    dequant_rescale: bool = False,
    interpret: bool | None = None,
):
    """Skewed blocks (..., ndiag, nby, N, N) -> (rec, levels, modes).

    Same layout contract as wavefront_slab.wavefront_encode_blocks,
    with `modes` carrying the full 35-mode decision index
    (0 = planar, 1 = DC, 2-34 angular) per (..., ndiag, nby) slot.
    """
    if interpret is None:
        interpret = _interpret_default()
    squeeze = blocks_sk.ndim == 4
    if squeeze:
        blocks_sk = blocks_sk[None]
    batch, ndiag = blocks_sk.shape[0], blocks_sk.shape[1]
    w_d = batch * nby * n
    w_pad = _lane_pad(w_d)
    slab = max(n, 8)

    diag = blocks_sk.transpose(1, 3, 0, 2, 4).reshape(ndiag, n, w_d)
    if w_pad != w_d:
        diag = jnp.concatenate(
            [diag, jnp.zeros((ndiag, n, w_pad - w_d), jnp.int32)], axis=2
        )
    if slab != n:
        diag = jnp.concatenate(
            [diag, jnp.zeros((ndiag, slab - n, w_pad), jnp.int32)], axis=1
        )
    diag = diag.reshape(ndiag * slab, w_pad)

    run = _build(n, nby, nbx, ndiag, batch, interpret, use_dst,
                 _packed_min_ok(n, bit_depth))
    scal = _qp_scalars_traced(qp, n, bit_depth, dequant_rescale)
    rec, lev, modes = run(scal, diag)

    def unslab(a):
        a = a.reshape(ndiag, slab, w_pad)[:, :n, :w_d]
        a = a.reshape(ndiag, n, batch, nby, n)
        a = a.transpose(2, 0, 3, 1, 4)                # (B, ndiag, nby, N, N)
        return a[0] if squeeze else a

    modes_s = modes.reshape(ndiag, 8, w_pad)[:, :, :w_d]
    modes_s = modes_s.reshape(ndiag, 8, batch, nby, n)[:, 0, :, :, 0]
    modes_s = modes_s.transpose(1, 0, 2)              # (B, ndiag, nby)
    if squeeze:
        modes_s = modes_s[0]
    return unslab(rec), unslab(lev), modes_s
