"""Sharded multi-frame encoding over a (frame, space) mesh.

The scaling model (SURVEY §5 "long-context" analog): throughput scales
by sharding the frame batch across chips ('frame' axis, zero
communication) and optionally splitting each plane's rows across the
'space' axis (XLA inserts the one-row halo exchange for the top-
neighbor gather as a collective-permute on ICI).  Metric reductions
(mean PSNR) are the only other collective.

Everything is expressed as sharding annotations on a single jitted
program — no explicit communication code, per the XLA/jit SPMD model.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nanohevc_tpu.config import EncoderConfig
from nanohevc_tpu.models.all_intra import encode_plane_full
from nanohevc_tpu.ops.metrics import psnr


def _batch_step(planes: jnp.ndarray, qp: jnp.ndarray, *, config: EncoderConfig,
                is_luma: bool = True, allow_fast: bool = True):
    """(F, H, W) int32 planes -> dict of batched outputs + mean PSNR.

    Uses the fused slab-kernel fast path when the configuration allows
    (dc_planar/energy or all/satd, W % N == 0) — ~7x the XLA path on
    TPU — else the general XLA pipeline.  allow_fast=False forces the
    XLA pipeline; under a mesh the sharded kernel path lives in
    spatial.py (the SPMD partitioner cannot split a Pallas call, so
    make_batch_encoder routes there explicitly).
    """
    from nanohevc_tpu.models.all_intra import (
        encode_plane_fast,
        encode_plane_fast_modes,
        supports_fast_path,
        supports_mode_search_fast_path,
    )

    n = config.block_size if is_luma else config.chroma_block_size()
    width = planes.shape[-1]

    # rdo_cbf / rdoq run RD stages only the XLA path has — a fused
    # fast path would silently drop them
    if config.rdo_cbf or config.rdoq:
        allow_fast = False
    if allow_fast and supports_fast_path(config, n, width, is_luma):
        def one(plane):
            return encode_plane_fast(
                plane, config.qp, n=n, bit_depth=config.bit_depth,
                scan=config.scan, use_dst=config.use_dst(n, is_luma),
                dequant_rescale=config.dequant_rescale,
            )
    elif allow_fast and supports_mode_search_fast_path(config, n, width, is_luma):
        def one(plane):
            return encode_plane_fast_modes(
                plane, config.qp, n=n, bit_depth=config.bit_depth,
                scan=config.scan, use_dst=config.use_dst(n, is_luma),
                dequant_rescale=config.dequant_rescale,
            )
    else:
        def one(plane):
            return encode_plane_full(
                plane,
                qp,
                n=n,
                mode_set=(config.mode_set if is_luma
                          else config.chroma_modes()),
                decision=config.decision,
                use_dst=config.use_dst(n, is_luma),
                is_intra=config.is_intra,
                bit_depth=config.bit_depth,
                scan=config.scan,
                rdo_cbf=config.rdo_cbf,
                rdoq=config.rdoq,
                dequant_rescale=config.dequant_rescale,
                intra_smoothing=config.intra_smoothing and is_luma,
            )

    out = jax.vmap(one)(planes)
    frame_psnr = jax.vmap(psnr)(planes, out["recon"])
    out["psnr"] = frame_psnr
    out["mean_psnr"] = jnp.mean(frame_psnr)   # cross-chip all-reduce under jit
    return out


@lru_cache(maxsize=64)
def _batch_encoder_unsharded(
    config: EncoderConfig, is_luma: bool, donate: bool,
    honor_runtime_qp: bool,
) -> Callable:
    step = partial(
        _batch_step, config=config, is_luma=is_luma,
        allow_fast=not honor_runtime_qp,
    )
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_batch_encoder(
    config: EncoderConfig,
    mesh: Mesh | None = None,
    is_luma: bool = True,
    donate: bool = False,
    honor_runtime_qp: bool = False,
) -> Callable:
    """Compile a sharded multi-frame plane encoder.

    Returns fn(planes (F, H, W) int32, qp scalar) -> dict.  With a
    mesh, inputs are annotated P('frame', 'space', None): the frame
    batch spreads over the 'frame' axis and plane rows over 'space'.

    When the config is covered by a fused kernel (dc_planar/energy or
    all/satd), the sharded call routes through the shard_map harness
    (spatial.py: explicit ppermute halos around the Pallas kernels) —
    the kernels are NOT forfeited under a mesh.  The fast paths bake
    config.qp (a Pallas-static scalar); like the unsharded fast path,
    the runtime qp argument is ignored there.  honor_runtime_qp=True
    forces the XLA path so the traced qp argument is always respected
    (what rate control needs: one compiled program, any QP).
    """
    if mesh is None:
        # Cached on the (hashable, frozen) config: a fresh jax.jit
        # wrapper per call would retrace AND recompile the same program
        # every encode_sequence/CLI invocation (measured ~7 s per plane
        # kind on the tunnel backend — it was the sequence bench's
        # hidden "dispatch" wall).
        return _batch_encoder_unsharded(
            config, is_luma, donate, honor_runtime_qp
        )

    in_shardings = (
        NamedSharding(mesh, P("frame", "space", None)),
        NamedSharding(mesh, P()),
    )
    xla_fn = jax.jit(
        partial(_batch_step, config=config, is_luma=is_luma, allow_fast=False),
        in_shardings=in_shardings,
        donate_argnums=(0,) if donate else (),
    )

    fast_cache: dict[str, Callable] = {}

    def _fast_with_metrics(variant: str) -> Callable:
        from nanohevc_tpu.parallel.spatial import make_sharded_fast_encoder

        fast = make_sharded_fast_encoder(config, mesh, variant, is_luma)

        def run(planes, qp):
            del qp  # fast kernels bake config.qp (Pallas-static)
            out = dict(fast(planes))
            frame_psnr = jax.vmap(psnr)(planes.astype(jnp.int32), out["recon"])
            out["psnr"] = frame_psnr
            out["mean_psnr"] = jnp.mean(frame_psnr)
            out["nnz"] = (out["levels"] != 0).sum(axis=-1)
            return out

        return jax.jit(run, in_shardings=in_shardings)

    def dispatch(planes, qp):
        from nanohevc_tpu.parallel.spatial import sharded_fast_supported

        h, w = planes.shape[-2:]
        variant = (
            None
            if config.rdo_cbf or config.rdoq or honor_runtime_qp
            else sharded_fast_supported(config, mesh, h, w, is_luma)
        )
        if variant is None:
            return xla_fn(planes, qp)
        if variant not in fast_cache:
            fast_cache[variant] = _fast_with_metrics(variant)
        return fast_cache[variant](planes, qp)

    return dispatch


def make_closed_loop_encoder(
    config: EncoderConfig,
    mesh: Mesh | None = None,
    is_luma: bool = True,
    donate: bool = False,
) -> Callable:
    """Compile a sharded multi-frame CLOSED-LOOP (wavefront) encoder.

    Returns fn(planes (F, H, W) int32, qp scalar) -> dict with batched
    recon/levels/modes plus per-frame and mean PSNR.  Closed-loop
    frames are independent of each other, so the batch shards over the
    'frame' axis with zero communication (the wavefront dependency is
    *within* a frame); rows are replicated — the diagonal recurrence
    cannot split spatially.  Under a mesh the per-shard encode runs in
    `shard_map` (the fused wavefront kernels are custom calls the SPMD
    partitioner cannot split), so path auto-selection applies per
    shard: the 35-mode SATD search rides kernels/wavefront_mode_slab,
    dc_planar multi-frame shards ride the XLA scan (the measured
    winner at batch >= 2 — see models/wavefront.py).  mean_psnr is a
    `pmean` over 'frame' (even frame split, so it equals the global
    mean).
    """
    from nanohevc_tpu.models.wavefront import encode_planes_closed_loop

    n = config.block_size if is_luma else config.chroma_block_size()

    def local_step(planes, qp):
        out = encode_planes_closed_loop(
            planes.astype(jnp.int32),
            qp,
            n=n,
            mode_set=(config.mode_set if is_luma
                      else config.chroma_modes()),
            decision=config.decision,
            use_dst=config.use_dst(n, is_luma),
            bit_depth=config.bit_depth,
            scan=config.scan,
            dequant_rescale=config.dequant_rescale,
            intra_smoothing=config.intra_smoothing and is_luma,
            deblock=config.deblock,
            deblock_chroma=not is_luma,
            sao=config.sao,
            sao_ctb=config.sao_ctb,
            sao_tile=config.sao_tile,
            rdoq=config.rdoq,
        )
        frame_psnr = jax.vmap(psnr)(planes.astype(jnp.int32), out["recon"])
        out["psnr"] = frame_psnr
        out["mean_psnr"] = jnp.mean(frame_psnr)
        return out

    if mesh is None:
        return jax.jit(local_step, donate_argnums=(0,) if donate else ())

    from jax import shard_map

    def sharded_step(planes, qp):
        out = local_step(planes, qp)
        out["mean_psnr"] = jax.lax.pmean(out["mean_psnr"], "frame")
        return out

    out_specs = {
        "recon": P("frame", None, None),
        "levels": P("frame", None, None),
        "modes": P("frame", None),
        "psnr": P("frame"),
        "mean_psnr": P(),
    }
    if config.sao:
        # per-frame ((F,) type, (F,) band_pos, (F, 4) offsets)
        out_specs["sao"] = (P("frame"), P("frame"), P("frame", None))
    if config.sao_ctb:
        # (F, nty, ntx) type/band maps + (F, nty, ntx, 4) offsets
        out_specs["sao_ctb"] = (
            P("frame", None, None),
            P("frame", None, None),
            P("frame", None, None, None),
        )
    fn = shard_map(
        sharded_step,
        mesh=mesh,
        in_specs=(P("frame", None, None), P()),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(fn, donate_argnums=(0,) if donate else ())


def encode_batch_sharded(
    planes,
    qp: int,
    config: EncoderConfig,
    mesh: Mesh,
):
    """Convenience wrapper: device_put with sharding, then encode."""
    sharding = NamedSharding(mesh, P("frame", "space", None))
    planes = jax.device_put(jnp.asarray(planes, dtype=jnp.int32), sharding)
    fn = make_batch_encoder(config, mesh)
    return fn(planes, jnp.int32(qp))
