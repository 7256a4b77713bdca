"""Spatially-sharded fast path: the fused kernels under shard_map.

The automatic SPMD partitioner cannot split a Pallas custom call, so
the sharded fast path is expressed manually: shard_map splits the
frame batch over 'frame' and plane rows over 'space'; each device runs
a fused slab kernel on its row shard, and the cross-device
dependencies arrive by explicit jax.lax.ppermute along 'space':

- the top-neighbor row of each shard's first block-row (one (1, W)
  row per device per frame, shifted DOWN the ring) — both kernels;
- the first N rows of the NEXT shard (shifted UP the ring) — the
  mode-search kernel only: angular modes read the left reference's
  rows N..2N-1, which live below the shard's last block-row.

This is the hand-written counterpart of what XLA inserts automatically
for the jnp path in sharding.py, and the pattern scales to pods: all
communication is nearest-neighbor on the 'space' ring.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from nanohevc_tpu.config import EncoderConfig


def sharded_fast_supported(config: EncoderConfig, mesh: Mesh,
                           height: int, width: int,
                           is_luma: bool = True) -> str | None:
    """Which sharded kernel covers this (config, mesh, plane): 'slab',
    'mode_search', or None.

    Each row shard must be a whole number of block-rows (the halo is
    one block-row deep).
    """
    from nanohevc_tpu.models.all_intra import (
        supports_fast_path,
        supports_mode_search_fast_path,
    )

    n = config.block_size if is_luma else config.chroma_block_size()
    space = mesh.shape["space"]
    # Row shards must be whole block-rows; make_sharded_fast_encoder
    # pads the frame bottom to a space*n multiple (replicating the last
    # row, which matches the kernels' own bottom-clamp semantics), so
    # any whole-block-row height shards — 1080p at space 2/4 included.
    if height % n != 0:
        return None
    if supports_fast_path(config, n, width, is_luma):
        return "slab"
    if supports_mode_search_fast_path(config, n, width, is_luma):
        return "mode_search"
    return None


def make_sharded_fast_encoder(config: EncoderConfig, mesh: Mesh,
                              variant: str = "slab",
                              is_luma: bool = True):
    """Compile a (frame, space)-sharded fused-kernel encoder.

    Returns fn(planes (F, H, W) int32) -> dict(recon (F, H, W),
    levels (F, nb, N*N) scan-packed, modes (F, nb)).  Requires a
    fast-path config (variant='slab': dc_planar/energy;
    'mode_search': all/satd), H/space % N == 0 and W % N == 0.
    """
    from jax import shard_map

    from nanohevc_tpu.kernels.mode_search_grouped import (
        mode_search_encode_plane_auto,
    )
    from nanohevc_tpu.kernels.slab_pipeline import slab_encode_plane
    from nanohevc_tpu import ops
    from nanohevc_tpu.ops.intra import DC_MODE, PLANAR_MODE

    n = config.block_size if is_luma else config.chroma_block_size()
    use_dst = config.use_dst(n, is_luma)
    boundary = 1 << (config.bit_depth - 1)
    space = mesh.shape["space"]
    fwd = [(i, (i + 1) % space) for i in range(space)]   # halo moves down
    bwd = [(i, (i - 1) % space) for i in range(space)]   # halo moves up

    def shard_fn(planes):           # planes: (F/fd, H/sd, W) local shard
        def one(plane):
            h, w = plane.shape
            sidx = jax.lax.axis_index("space")
            # Last row of the previous shard: the top reference for
            # this shard's first block-row.  Shard 0 takes the
            # boundary fill, reproducing frame-top semantics exactly.
            prev_last = jax.lax.ppermute(plane[-1:, :], "space", fwd)
            halo_top = jnp.where(sidx == 0, boundary, prev_last)
            # One padding block-row whose last row is the halo; its own
            # (garbage) output rows are dropped below.
            padded = jnp.concatenate(
                [jnp.broadcast_to(halo_top, (n, w)), plane], axis=0
            )
            if variant == "slab":
                out = slab_encode_plane(
                    padded, config.qp, n, bit_depth=config.bit_depth,
                    with_modes=True, use_dst=use_dst,
                    dequant_rescale=config.dequant_rescale,
                )
            else:
                # The mode search also reads left-reference rows N..2N-1
                # (below each block-row): append the next shard's first
                # N rows; the last shard replicates its own last row,
                # which is exactly extract_refs' bottom clamp.
                next_first = jax.lax.ppermute(plane[:n, :], "space", bwd)
                halo_bot = jnp.where(
                    sidx == space - 1,
                    jnp.broadcast_to(plane[-1:, :], (n, w)),
                    next_first,
                )
                padded = jnp.concatenate([padded, halo_bot], axis=0)
                out = mode_search_encode_plane_auto(
                    padded, config.qp, n, bit_depth=config.bit_depth,
                    use_dst=use_dst,
                    dequant_rescale=config.dequant_rescale,
                )
            recon = out["recon"][n : n + h]
            levels = out["levels_slab"][n : n + h]
            modes_slab = out["modes_slab"][n : n + h]
            mode_vals = modes_slab[::n, ::n].reshape(-1)
            if variant == "slab":
                modes = jnp.where(
                    mode_vals == 1, DC_MODE, PLANAR_MODE
                ).astype(jnp.int32)
            else:
                modes = mode_vals.astype(jnp.int32)
            packed = ops.scan_pack(
                ops.tile_plane(levels, n), config.scan, modes=modes
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
        planes = planes.astype(jnp.int32)
        f, h, w = planes.shape
        # Pad the frame bottom so every row shard is a whole number of
        # block-rows (1080 has 135 8x8 block-rows: not splittable at
        # space=2 without this).  Replicating the last row matches the
        # kernels' own bottom clamp, so padded output is bit-exact to
        # the single-device kernels; the pad blocks are cropped below.
        unit = space * n
        h_pad = -(-h // unit) * unit
        if h_pad != h:
            planes = jnp.concatenate(
                [
                    planes,
                    jnp.broadcast_to(
                        planes[:, h - 1 : h, :], (f, h_pad - h, w)
                    ),
                ],
                axis=1,
            )
        out = inner(planes)
        if h_pad != h:
            nb = (h // n) * (w // n)
            out = {
                "recon": out["recon"][:, :h],
                "levels": out["levels"][:, :nb],
                "modes": out["modes"][:, :nb],
            }
        return out

    return run
