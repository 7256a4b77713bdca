"""Spatially-sharded fast path: the slab kernel under shard_map.

The automatic SPMD partitioner cannot split a Pallas custom call, so
the sharded fast path is expressed manually: shard_map splits the
frame batch over 'frame' and plane rows over 'space'; each device runs
the fused slab kernel on its row shard, and the one cross-device
dependency — the top-neighbor row of each shard's first block-row —
arrives by an explicit jax.lax.ppermute along 'space' (one (1, W) row
per device per frame, riding ICI).

This is the hand-written counterpart of what XLA inserts automatically
for the jnp path in sharding.py, and the pattern scales to pods: all
communication is nearest-neighbor on the 'space' ring.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from nanohevc_tpu.config import EncoderConfig


def make_sharded_fast_encoder(config: EncoderConfig, mesh: Mesh):
    """Compile a (frame, space)-sharded slab-kernel encoder.

    Returns fn(planes (F, H, W) int32) -> dict(recon (F, H, W),
    levels (F, nb, N*N) scan-packed, modes (F, nb)).  Requires the
    fast-path config (dc_planar/energy), H/space_size % N == 0 and
    W % N == 0.
    """
    from jax import shard_map

    from nanohevc_tpu.kernels.slab_pipeline import slab_encode_plane
    from nanohevc_tpu import ops
    from nanohevc_tpu.ops.intra import DC_MODE, PLANAR_MODE

    n = config.block_size
    space = mesh.shape["space"]

    def shard_fn(planes):           # planes: (F/fd, H/sd, W) local shard
        def one(plane):
            h, w = plane.shape
            # Fetch the last row of the previous shard ('space' ring):
            # it is the top reference for this shard's first block-row.
            last_row = plane[-1:, :]
            prev_last = jax.lax.ppermute(
                last_row,
                "space",
                [(i, (i + 1) % space) for i in range(space)],
            )
            sidx = jax.lax.axis_index("space")
            # Prepend one padding block-row whose last row is the halo:
            # the shard's first real block-row then reads it as its top
            # reference.  Shard 0's halo is the 128 boundary fill, so
            # frame-top semantics are reproduced exactly; the padding
            # row's own (garbage) output is dropped.
            halo = jnp.where(sidx == 0, 128, prev_last)
            padded = jnp.concatenate(
                [jnp.broadcast_to(halo, (n, w)), plane], axis=0
            )
            out = slab_encode_plane(
                padded, config.qp, n, bit_depth=config.bit_depth,
                with_modes=True,
            )
            recon = out["recon"][n:]
            levels = out["levels_slab"][n:]
            modes_slab = out["modes_slab"][n:]
            packed = ops.scan_pack(ops.tile_plane(levels, n), config.scan)
            dc_wins = modes_slab[::n, ::n].reshape(-1)
            modes = jnp.where(dc_wins == 1, DC_MODE, PLANAR_MODE).astype(
                jnp.int32
            )
            return recon, packed, modes

        recon, levels, modes = jax.vmap(one)(planes)
        return {"recon": recon, "levels": levels, "modes": modes}

    inner = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=P("frame", "space", None),
        out_specs={
            "recon": P("frame", "space", None),
            "levels": P("frame", "space", None),
            "modes": P("frame", "space"),
        },
        check_vma=False,
    )

    @jax.jit
    def run(planes):
        return inner(planes.astype(jnp.int32))

    return run
