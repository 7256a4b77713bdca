"""Grouped-interleaved closed-loop wavefront 35-mode search.

wavefront_mode_slab.py runs the full 35-mode SATD search in VMEM per
diagonal, but lays the frame batch out along the LANE axis
(W_d = batch * nby * N) with only N sublanes live.  That inherits the
per-block-row slab kernel's two costs: every (1, W)-shaped op (the
`above` row, corner relay, cost/min reductions, DC row) uses one of
the 8 sublanes, and every row-concat (_wht_rows, the vertical family's
stacked lerp operands) slices single sublanes — a Mosaic relayout per
row.  The open-loop grouped kernel (mode_search_grouped.py) showed the
fix is worth ~2.3x: pack independent block-rows into the SUBLANE axis
in row-interleaved order so row ops become 8-row tile-aligned group
ops.

Here the independent work per diagonal step is the FRAME BATCH (the
multi-frame diagonal interleave, models/wavefront.py docstring): g
frames' same-index diagonals pack into sublanes as

    slab row  s = i * g + q   <->  row i of frame q,

lanes = one frame's wavefront width (nby * N; slot by at lanes
[by*N, by*N+N)).  Every lane-algebra op of the sweep is byte-identical
to the slab kernel's; the (1, W) reference rows become (g, W) and all
row slices become g-row groups (tile-aligned at g == 8).  The sweep
itself is shared code (mode_search_grouped._mode_sweep_g), so decision
semantics are identical to decide_modes(mode_set="all",
decision="satd") over closed-loop references.

Closed-loop reference machinery (per frame q, mirroring
wavefront_mode_slab.py's relay, all buffers grouped):

- `bot` (g, W): last diagonal's reconstructed bottom rows; slot by's
  top row T[1..N] is slot by-1's entry — `roll(bot, N)` along lanes;
- `rc` (N*g, W): last diagonal's right columns, pre-spread,
  interleaved rows i*g+q; slot by's left column L[1..N] is its own
  entry (block (by, bx-1) was encoded by the same slot one step
  earlier);
- `corner` (g, W): T[0] = L[0] = bottom-right of block (by-1, bx-1) =
  the last i-group of the previous step's PRE-update rc, rolled one
  slot down — the same one-step-delayed relay;
- extensions follow the closed-loop availability rule
  (models/wavefront.py:_read_refs_skewed): T[N+1..2N] is zeros (the
  not-yet-reconstructed same-diagonal block) except frame-right
  replication of T[N]; L[N+1..2N] is zeros except frame-bottom
  replication of L[N]; frame edges fill with 1 << (bd-1).

Bit-exact vs the XLA wavefront scan (itself pinned to the sequential
per-block oracle): tests/test_wavefront.py.  Scope: N in {4, 8}, DCT
or DST-VII (N == 4), batch a positive multiple of 8 on real TPU (any
batch in interpret mode); other configs stay on wavefront_mode_slab /
the XLA scan.

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
)
from nanohevc_tpu.kernels.mode_search_grouped import (
    _mode_sweep_g,
    _transform_quant_recon_g,
)
from nanohevc_tpu.kernels.mode_search_slab import _packed_min_ok
from nanohevc_tpu.kernels.wavefront_slab import _qp_scalars_traced


def _kernel(scal_ref, blocks_ref, wfwd_ref, winv_ref,
            rec_ref, lev_ref, modes_ref, bot_ref, rc_ref, corner_ref,
            *, n: int, g: int, nby: int, nbx: int, packed_min: bool,
            t_host):
    """One diagonal: (N*g, m*nby*N) grouped blocks + recon state.

    Lanes tile m frames' wavefronts back to back (frame j at lanes
    [j*nby*N, +nby*N), slot by at frame-local lanes [by*N, +N));
    sublane row i*g+q is row i of sublane-frame q, so frame q*m+j
    lives at (sublane group q, lane group j).  All boundary masks use
    the FRAME-LOCAL slot, so every frame runs the same diagonal
    schedule independently.  Invalid slots (bx = d - by out of range)
    compute garbage that only ever flows to other invalid slots (the
    valid window moves one slot down per step, exactly like the state
    relay); the host-side deskew drops it.  Cross-frame and pad-lane
    leakage can only travel through the +N state-relay rolls into a
    frame's slot 0, where the top_edge/left_edge boundary fills
    override it (leftward sweep rolls are block-local by the phase
    split, so they never cross a block boundary, let alone a frame's).
    """
    d = pl.program_id(0)
    w = blocks_ref.shape[1]
    fw = nby * n                                             # frame lane width
    boundary = scal_ref[0, 6]

    @pl.when(d == 0)
    def _():
        bot_ref[:, :] = jnp.zeros_like(bot_ref)
        rc_ref[:, :] = jnp.zeros_like(rc_ref)
        corner_ref[:, :] = jnp.zeros_like(corner_ref)

    x = blocks_ref[:, :]                                     # (n*g, W)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    phase = lane % n
    slot = (lane % fw) // n                                  # frame-local by

    # Wrapped schedule: each slot streams F frames back to back, i.e.
    # the standard wavefront over the horizontally CONCATENATED wide
    # frame (nby x F*nbx blocks), so the frame-edge masks are periodic
    # in the frame-local block column bxl = (d - slot) mod nbx.  koff
    # (a compile-time multiple of nbx >= nby-1) keeps the dividend
    # non-negative so `%` is plain remainder.  At F == 1 this agrees
    # with the un-wrapped masks on every valid slot; out-of-stream
    # slots compute garbage that only ever flows to other invalid
    # slots (the valid window moves one slot down per step).
    koff = -(-nby // nbx) * nbx
    bxl = (d - slot + koff) % nbx
    top_edge = slot == 0                                     # by == 0
    left_edge = bxl == 0                                     # frame bx == 0
    last_bcol = bxl == nbx - 1                               # frame bx == nbx-1
    last_brow = slot == nby - 1                              # by == nby-1

    rc_raw = rc_ref[:, :]                                    # (n*g, W)

    # ---- Closed-loop reference machinery ---------------------------------
    above = jnp.where(top_edge, boundary, _roll(bot_ref[:, :], n))  # (g, W)
    # T[N+1..2N]: zeros (block (by-1, bx+1) is on THIS diagonal, not yet
    # reconstructed) except frame-right replication of T[N]; a top-edge
    # block's whole top row (extension included) is the boundary fill.
    ext_t = jnp.where(
        top_edge, boundary,
        jnp.where(last_bcol, _spread_phase(above, n - 1, phase, n), 0),
    )
    corner = jnp.where(top_edge | left_edge, boundary, corner_ref[:, :])
    lc = jnp.where(left_edge, boundary, rc_raw)              # (n*g, W)
    # L[N+1..2N]: zeros except frame-bottom replication of L[N]; a
    # left-edge block's whole left column is the boundary fill (lc is
    # already boundary there, so reusing its last group covers both).
    ext_l = jnp.where(left_edge | last_brow, lc[(n - 1) * g : n * g, :], 0)
    l_stack = jnp.concatenate([lc] + [ext_l] * (n + 1), axis=0)

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

    best_pred, best_mode = _mode_sweep_g(
        x, above, lc, l_stack, corner, top_at, negshift, phase, n, g,
        packed_min,
    )
    level, recon = _transform_quant_recon_g(
        scal_ref, x, best_pred, t_host, wfwd_ref, winv_ref, n, g
    )

    # ---- State relay for the next diagonal -------------------------------
    # Next step's corner for slot by+1 = bottom-right of (by, bx-1) =
    # the last i-group of THIS step's pre-update rc, one slot down.
    corner_ref[:, :] = _roll(rc_raw[(n - 1) * g : n * g, :], n)
    bot_ref[:, :] = recon[(n - 1) * g : n * g, :]
    rc_ref[:, :] = _spread_phase(recon, n - 1, phase, n)

    rec_ref[:, :] = recon
    lev_ref[:, :] = level
    modes_ref[:, :] = best_mode


@lru_cache(maxsize=None)
def _build(n: int, g: int, nby: int, nbx: int, ndiag: int, w_pad: int,
           interpret: bool, use_dst: bool, packed_min: bool):
    t_host = np.asarray(transform_matrix(n, use_dst=use_dst), dtype=np.int32)
    slab_rows = n * g
    wfwd = _col_weights(t_host, w_pad, n)
    winv = _col_weights(t_host.T, w_pad, n)

    slab_spec = pl.BlockSpec((slab_rows, w_pad), lambda d: (d, 0),
                             memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        partial(_kernel, n=n, g=g, nby=nby, nbx=nbx, packed_min=packed_min,
                t_host=t_host),
        grid=(ndiag,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            slab_spec,
            pl.BlockSpec((2 * n - 1, w_pad), lambda d: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * n - 1, w_pad), lambda d: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            slab_spec,
            slab_spec,
            pl.BlockSpec((g, w_pad), lambda d: (d, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((ndiag * slab_rows, w_pad), jnp.int32),
            jax.ShapeDtypeStruct((ndiag * slab_rows, w_pad), jnp.int32),
            jax.ShapeDtypeStruct((ndiag * g, w_pad), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((g, w_pad), jnp.int32),        # bot rows
            pltpu.VMEM((n * g, w_pad), jnp.int32),    # right cols (spread)
            pltpu.VMEM((g, w_pad), jnp.int32),        # delayed corner relay
        ],
        interpret=interpret,
        # The grouped sweep's live (n*g, W) temporaries exceed the 16 MB
        # scoped-VMEM default at n*g = 64; the chip has 128 MB, so raise
        # the cap (same rationale as the open-loop grouped kernel).
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
            if n * g > 32 and not interpret else None
        ),
    )

    def run(scalars, diag_slabs):
        return call(scalars, diag_slabs, jnp.asarray(wfwd), jnp.asarray(winv))

    return run


def wavefront_mode_grouped_supported(n: int, batch: int, mode_set: str,
                                     decision: str, use_dst: bool,
                                     interpret: bool | None = None) -> bool:
    """Whether the grouped closed-loop 35-mode kernel covers this config.

    On real TPU the frame batch packs the sublane axis, so it must be a
    positive multiple of 8 (Mosaic block tiling of the (g, W) state and
    modes buffers); interpret mode takes any batch >= 1.

    n == 16 rides the same kernel (round 5): the sweep and the closed-
    loop reference machinery are generic in n — the sublane group is
    simply 2 vregs tall — and bit-exactness vs the XLA scan at 16 is
    pinned in tests/test_wavefront.py.  32 stays on the slab kernel
    (the (2n+1)*g-row L stack and the 33-mode unroll blow VMEM/compile
    budgets there).
    """
    if interpret is None:
        interpret = _interpret_default()
    return (
        mode_set == "all"
        and decision == "satd"
        and n in (4, 8, 16)
        and (not use_dst or n == 4)
        and batch >= 1
        and (interpret or batch % 8 == 0)
    )


def _factor_gmf(batch: int, interpret: bool, group, lanes, wrap):
    """Split the frame batch into (g sublane, m lane, F wrap) factors.

    g rides the sublane axis (8 = the vreg sublane count, so grouped
    row ops are tile-aligned); m frames tile the lane axis back to
    back, multiplying per-diagonal work; F frames stream through each
    (g, m) slot in time (the wrapped wavefront), cutting the skew's
    idle slots from (nby-1) per frame to (nby-1) per F frames.  Lane
    width raises Mosaic compile time steeply (~2 min at m=1, ~7 min at
    m=2 through a degraded tunnel) while wrap is compile-FREE (same
    lane width at any F), and on-chip 1080p measurements put all-wrap
    ahead anyway (g8/m1/F4 = 842 Mpix/s vs 396 for the lane-packed
    b=16 layout; tools/measure_wrap.py, 2026-08-20), so the auto split
    keeps m = 1 and sends the whole per-group factor to F.  Explicit
    lanes= opts in if a config ever wants the wider layout.
    Interpret mode keeps g=batch, m=F=1 (no tiling) unless overridden.
    """
    for name, v in (("group", group), ("lanes", lanes), ("wrap", wrap)):
        if v is not None and v <= 0:
            raise ValueError(f"kernel split {name} must be positive, got {v}")
    if group is None and lanes is None and wrap is None and interpret:
        return batch, 1, 1
    g = group if group is not None else (batch if interpret else 8)
    k, rem = divmod(batch, g)
    if rem:
        raise ValueError(f"batch {batch} not divisible by group {g}")
    if lanes is None and wrap is None:
        m = 1
    else:
        m = lanes if lanes is not None else k // wrap
    f, rem = divmod(k, m)
    if wrap is not None and f != wrap:
        raise ValueError(f"batch {batch} != group*lanes*wrap")
    if rem:
        raise ValueError(f"batch/group {k} not divisible by lanes {m}")
    return g, m, f


def wavefront_mode_search_raster_grouped(
    blocks: jnp.ndarray,
    qp,
    *,
    n: int,
    nby: int,
    nbx: int,
    use_dst: bool = False,
    bit_depth: int = 8,
    dequant_rescale: bool = False,
    interpret: bool | None = None,
    group: int | None = None,
    lanes: int | None = None,
    wrap: int | None = None,
):
    """Raster blocks (B, nby*nbx, N, N) -> raster (rec, levels, modes).

    rec/levels are (B, nb, N, N), modes (B, nb), identical bit-for-bit
    to the XLA wavefront scan per frame.  The batch factors as
    B = g * m * F: frame ((q*m + j) * F + fi) runs at sublane group q,
    lane group j, stream position fi.  Wrapping is the standard skew
    over the F frames CONCATENATED horizontally (one nby x F*nbx wide
    frame per (q, j) slot) with nbx-periodic frame-edge masks in the
    kernel, so slot by starts frame fi+1's row the step after it
    finishes frame fi's: total steps F*nbx + nby - 1 instead of
    F*(nbx + nby - 1).  group/lanes/wrap override the auto split
    (tests force m, F > 1 in interpret mode with them).
    """
    if interpret is None:
        interpret = _interpret_default()
    batch = blocks.shape[0]
    g, m, f = _factor_gmf(batch, interpret, group, lanes, wrap)
    from nanohevc_tpu.models.wavefront import _deskew_blocks, _skew_blocks

    nbw = f * nbx                       # wide-frame block columns
    ndiag = nbw + nby - 1
    w_d = m * nby * n
    w_pad = -(-w_d // 128) * 128

    # concat each slot's F frames along the block-column axis, then the
    # plain wavefront shear of the wide frame IS the wrapped schedule.
    wide = blocks.reshape(g * m, f, nby, nbx, n, n)
    wide = wide.transpose(0, 2, 1, 3, 4, 5).reshape(g * m, nby * nbw, n, n)
    blocks_sk = _skew_blocks(wide, nby, nbw)      # (g*m, ndiag, nby, N, N)

    # rows (i, q) interleaved, lanes (j, by, c): one transpose+reshape.
    b6 = blocks_sk.reshape(g, m, ndiag, nby, n, n)
    diag = b6.transpose(2, 4, 0, 1, 3, 5).reshape(ndiag, n * g, w_d)
    if w_pad != w_d:
        diag = jnp.concatenate(
            [diag, jnp.zeros((ndiag, n * g, w_pad - w_d), jnp.int32)], axis=2
        )
    diag = diag.reshape(ndiag * n * g, w_pad)

    run = _build(n, g, nby, nbx, ndiag, w_pad, interpret, use_dst,
                 _packed_min_ok(n, bit_depth))
    scal = _qp_scalars_traced(qp, n, bit_depth, dequant_rescale)
    rec, lev, modes = run(scal, diag)

    def unwide(a):
        # (g*m, nby * nbw, ...) wide raster -> (B, nby*nbx, ...)
        rest = a.shape[2:]
        a = a.reshape(g * m, nby, f, nbx, *rest)
        a = a.transpose(0, 2, 1, 3, *range(4, 4 + len(rest)))
        return a.reshape(batch, nby * nbx, *rest)

    def unslab(a):
        a = a.reshape(ndiag, n, g, w_pad)[:, :, :, :w_d]
        a = a.reshape(ndiag, n, g, m, nby, n)
        a = a.transpose(2, 3, 0, 4, 1, 5)     # (g, m, ndiag, nby, N, N)
        a = a.reshape(g * m, ndiag, nby, n, n)
        return unwide(_deskew_blocks(a, nby, nbw))

    modes_s = modes.reshape(ndiag, g, w_pad)[:, :, :w_d]
    modes_s = modes_s.reshape(ndiag, g, m, nby, n)[:, :, :, :, 0]
    modes_s = modes_s.transpose(1, 2, 0, 3).reshape(g * m, ndiag, nby)
    modes_r = unwide(_deskew_blocks(modes_s, nby, nbw))
    return unslab(rec), unslab(lev), modes_r
