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

from functools import partial
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
    (dc_planar/energy, N % 8 == 0, W % N == 0) — ~7x the XLA path on
    TPU — else the general XLA pipeline.  The fast path is disabled
    under a sharded mesh (the SPMD partitioner cannot split the
    Pallas custom call).
    """
    from nanohevc_tpu.models.all_intra import (
        encode_plane_fast,
        encode_plane_fast_modes,
        supports_fast_path,
        supports_mode_search_fast_path,
    )

    n = config.block_size if is_luma else config.chroma_block_size()
    width = planes.shape[-1]

    if allow_fast and supports_fast_path(config, n, width, is_luma):
        def one(plane):
            return encode_plane_fast(
                plane, config.qp, n=n, bit_depth=config.bit_depth,
                scan=config.scan,
            )
    elif allow_fast and supports_mode_search_fast_path(config, n, width, is_luma):
        def one(plane):
            return encode_plane_fast_modes(
                plane, config.qp, n=n, bit_depth=config.bit_depth,
                scan=config.scan,
            )
    else:
        def one(plane):
            return encode_plane_full(
                plane,
                qp,
                n=n,
                mode_set=config.mode_set,
                decision=config.decision,
                use_dst=config.use_dst(n, is_luma),
                is_intra=config.is_intra,
                bit_depth=config.bit_depth,
                scan=config.scan,
            )

    out = jax.vmap(one)(planes)
    frame_psnr = jax.vmap(psnr)(planes, out["recon"])
    out["psnr"] = frame_psnr
    out["mean_psnr"] = jnp.mean(frame_psnr)   # cross-chip all-reduce under jit
    return out


def make_batch_encoder(
    config: EncoderConfig,
    mesh: Mesh | None = None,
    is_luma: bool = True,
    donate: bool = False,
) -> Callable:
    """Compile a sharded multi-frame plane encoder.

    Returns fn(planes (F, H, W) int32, qp scalar) -> dict.  With a
    mesh, inputs are annotated P('frame', 'space', None): the frame
    batch spreads over the 'frame' axis and plane rows over 'space'.
    """
    step = partial(
        _batch_step, config=config, is_luma=is_luma, allow_fast=mesh is None
    )
    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())
    in_shardings = (
        NamedSharding(mesh, P("frame", "space", None)),
        NamedSharding(mesh, P()),
    )
    return jax.jit(
        step,
        in_shardings=in_shardings,
        donate_argnums=(0,) if donate else (),
    )


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
