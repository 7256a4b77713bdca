"""Fused all-intra block pipeline as one Pallas TPU kernel.

One kernel launch processes the whole frame: for each chunk of blocks
(grid dimension) it runs DC + planar prediction, energy-based mode
decision, residual, two-pass forward DCT, quantization, dequantization,
two-pass inverse DCT, reconstruction and clipping — entirely in VMEM.
The XLA path (ops/ + models/all_intra.py) materializes each stage to
HBM between fusion islands; this kernel reads the block tensor once
and writes recon + levels once, the HBM-bandwidth floor for the op.

Numerics: transforms run on the MXU in float32, which is exact here —
every accumulator is an integer bounded by 32*90*2047 < 2^24 for
8-bit video (see ops/transform.py for the bound derivation); rounding
shifts are floor(x * 2^-s) on integer-valued floats.  Quant/dequant
stay in int32 on the VPU.  Bit-exactness vs the jnp path (and hence
the numpy oracle / reference) is asserted in tests/test_pallas.py.

Scope: the dc_planar decision path at 8-bit depth (the flagship bench
config).  The 35-mode search and 10-bit depths stay on the XLA path.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nanohevc_tpu.tables import transform_matrix

_LANES = 128


def _kernel(scal_ref, x_ref, refs_ref, t_ref, recon_ref, levels_ref, n: int):
    """One grid step: C blocks through the full pipeline.

    scal_ref (SMEM, (6,)): mf, qshift, qoffset, dscale, qp_per, max_pix
    x_ref:     (C, N, N) int32 source blocks
    refs_ref:  (C, 4N+2) int32 combined top|left reference vectors
    t_ref:     (N, N) int32 transform matrix
    """
    x = x_ref[:]
    refs = refs_ref[:]
    c = x.shape[0]

    # --- DC prediction: floor((sum top + sum left + N) / 2N) ------------
    top = refs[:, 1 : n + 1]                       # (C, N)
    left = refs[:, 2 * n + 2 : 3 * n + 2]          # (C, N)
    dc = (top.sum(axis=1) + left.sum(axis=1) + n) // (2 * n)
    dc_pred = dc[:, None, None]

    # --- Planar prediction (spec 8.4.4.2.4, parity top_right=top[N]) ----
    tr = refs[:, n][:, None, None]                 # top[-1] convention
    bl = refs[:, 3 * n + 1][:, None, None]
    xs = jax.lax.broadcasted_iota(jnp.int32, (1, n, n), 2)
    ys = jax.lax.broadcasted_iota(jnp.int32, (1, n, n), 1)
    shift_pl = n.bit_length()
    h = (n - 1 - xs) * left[:, :, None] + (xs + 1) * tr
    v = (n - 1 - ys) * top[:, None, :] + (ys + 1) * bl
    pl_pred = (h + v + n) >> shift_pl

    # --- Energy decision (ties -> DC, reference __main__.py:173) --------
    rd = x - dc_pred
    rp = x - pl_pred
    e_dc = (rd * rd).sum(axis=(1, 2))
    e_pl = (rp * rp).sum(axis=(1, 2))
    use_dc = (e_dc <= e_pl)[:, None, None]
    pred = jnp.where(use_dc, dc_pred, jnp.zeros_like(x) + pl_pred)
    res = x - pred

    # --- Forward transform: two MXU passes with floor-rounding ----------
    t = t_ref[:].astype(jnp.float32)
    tshift = n.bit_length() - 1 + 5
    rnd = 1 << (tshift - 1)
    scale = jnp.float32(2.0 ** (-tshift))

    def rshift_f(acc):  # exact: integer-valued f32, |acc|+rnd < 2^24
        return jnp.floor((acc + rnd) * scale).astype(jnp.int32)

    f = res.astype(jnp.float32)
    # temp[b,i,j] = sum_k T[i,k] X[b,k,j]  -> computed as (C, j, i)
    tpj = rshift_f(
        jax.lax.dot_general(f, t, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    )
    # coeff[b,i,j] = sum_k temp[b,i,k] T[j,k] ; temp[b,i,k] = tpj[b,k,i]
    coeff = rshift_f(
        jax.lax.dot_general(tpj.astype(jnp.float32), t,
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    )

    # --- Quantize (int32 VPU; exact for |coeff| <= 65000) ---------------
    mf = scal_ref[0]
    qshift = scal_ref[1]
    qoffset = scal_ref[2]
    level = jnp.right_shift(jnp.abs(coeff) * mf + qoffset, qshift)
    level = jnp.sign(coeff) * level
    levels_ref[:] = level

    # --- Dequantize -----------------------------------------------------
    dscale = scal_ref[3]
    qp_per = scal_ref[4]
    base = level * dscale
    sh = jnp.maximum(4 - qp_per, 1)
    down = jnp.right_shift(base + jnp.left_shift(1, sh - 1), sh)
    up = jnp.left_shift(base, jnp.maximum(qp_per - 4, 0))
    deq = jnp.where(qp_per < 4, down, up)

    # --- Inverse transform: T^T C then (.) T ----------------------------
    g = deq.astype(jnp.float32)
    # ti[b,i,j] = sum_k T[k,i] C[b,k,j] -> (C, j, i)
    ti = rshift_f(
        jax.lax.dot_general(g, t, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    )
    # r[b,i,j] = sum_k ti2[b,i,k] T[k,j]; ti2[b,i,k] = ti[b,k,i]
    rec_res = rshift_f(
        jax.lax.dot_general(ti.astype(jnp.float32), t,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    )

    # --- Reconstruct + clip ---------------------------------------------
    recon_ref[:] = jnp.clip(pred + rec_res, 0, scal_ref[5])


@lru_cache(maxsize=None)
def _build(n: int, chunk: int, nb_pad: int, interpret: bool):
    t_host = np.asarray(transform_matrix(n, use_dst=False), dtype=np.int32)
    grid = nb_pad // chunk

    kernel = partial(_kernel, n=n)
    call = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk, n, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 4 * n + 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((chunk, n, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, n, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb_pad, n, n), jnp.int32),
            jax.ShapeDtypeStruct((nb_pad, n, n), jnp.int32),
        ),
        interpret=interpret,
    )

    def run(blocks, refs, scalars):
        return call(scalars, blocks, refs, jnp.asarray(t_host))

    return run


def fused_encode_blocks(
    blocks: jnp.ndarray,
    refs: jnp.ndarray,
    qp: int,
    *,
    bit_depth: int = 8,
    chunk: int = 256,
    interpret: bool = False,
):
    """(nb, N, N) blocks + (nb, 4N+2) refs -> (recon, levels), fused.

    qp must be a static Python int (the kernel takes the derived
    constants through SMEM; recompilation per QP is avoided by passing
    them as data — one compiled kernel serves all QPs).
    """
    nb, n, _ = blocks.shape
    qp_c = max(0, min(51, int(qp)))
    from nanohevc_tpu.tables import DEQUANT_SCALE, QUANT_SCALE

    qp_per, qp_rem = qp_c // 6, qp_c % 6
    qshift = 14 + qp_per + (n.bit_length() - 1)
    scalars = jnp.asarray(
        [
            QUANT_SCALE[qp_rem],
            qshift,
            (1 << qshift) // 3,          # intra dead zone
            DEQUANT_SCALE[qp_rem],
            qp_per,
            (1 << bit_depth) - 1,
        ],
        dtype=jnp.int32,
    )

    chunk = min(chunk, max(8, nb))
    nb_pad = ((nb + chunk - 1) // chunk) * chunk
    if nb_pad != nb:
        pad = nb_pad - nb
        blocks = jnp.concatenate(
            [blocks, jnp.zeros((pad, n, n), blocks.dtype)], axis=0
        )
        refs = jnp.concatenate(
            [refs, jnp.full((pad, 4 * n + 2), 128, refs.dtype)], axis=0
        )
    run = _build(n, chunk, nb_pad, interpret)
    recon, levels = run(blocks.astype(jnp.int32), refs.astype(jnp.int32), scalars)
    return recon[:nb], levels[:nb]
