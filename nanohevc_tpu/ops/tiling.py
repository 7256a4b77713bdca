"""Plane <-> block-tensor tiling and batched neighbor extraction.

The fundamental device array is `(num_blocks, N, N)`: a reshape/
transpose tiling of an `(H, W)` plane in raster block order.  Partial
edge blocks are dropped, matching the reference's iterate_blocks
semantics (/root/reference/nano_hevc/block.py:68-74).

`extract_refs` replaces the reference's per-block neighbor methods
(block.py:38-57) with one batched gather producing, for every block,
the full-length HEVC reference layout:

    refs[b] = [ top_-1..top_2N-1 | left_-1..left_2N-1 ]   (length 4N+2)

where index 0 (and 2N+1) hold the top-left corner.  Out-of-frame
positions use the 128 boundary fill; beyond-frame-edge extensions
replicate the last in-frame sample (equivalent to the reference's
truncate-then-pad-last behavior in _build_ref_array, intra.py:173-178).
Neighbors are read from the *source* plane, matching the reference
encoder (not the true HEVC reconstruction wavefront; see SURVEY §3.1).
"""

from __future__ import annotations

import jax.numpy as jnp

BOUNDARY_FILL = 128


def num_blocks(height: int, width: int, n: int) -> tuple[int, int]:
    """(blocks per column, blocks per row) of full NxN blocks."""
    return height // n, width // n


def tile_plane(plane: jnp.ndarray, n: int) -> jnp.ndarray:
    """(H, W) -> (nby*nbx, N, N) in raster block order; edges dropped."""
    h, w = plane.shape
    nby, nbx = h // n, w // n
    x = plane[: nby * n, : nbx * n].reshape(nby, n, nbx, n)
    return x.transpose(0, 2, 1, 3).reshape(nby * nbx, n, n)


def untile_plane(
    blocks: jnp.ndarray, height: int, width: int, fill: int = 0
) -> jnp.ndarray:
    """(nb, N, N) -> (H, W); dropped edge regions take `fill`."""
    nb, n, _ = blocks.shape
    nby, nbx = height // n, width // n
    body = (
        blocks.reshape(nby, nbx, n, n)
        .transpose(0, 2, 1, 3)
        .reshape(nby * n, nbx * n)
    )
    if nby * n == height and nbx * n == width:
        return body
    out = jnp.full((height, width), fill, dtype=blocks.dtype)
    return out.at[: nby * n, : nbx * n].set(body)


def extract_refs_at(
    plane: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray, n: int,
    boundary: int = BOUNDARY_FILL,
) -> jnp.ndarray:
    """Neighbor extraction for an arbitrary set of block origins.

    (H, W), (m,) block-row indices, (m,) block-col indices -> (m, 4N+2)
    in the same layout as extract_refs.  Used by the closed-loop
    wavefront encoder, where each anti-diagonal's blocks read
    neighbors from the evolving reconstruction.
    """
    h, w = plane.shape
    p = plane.astype(jnp.int32)
    y0 = (ys * n)[:, None]
    x0 = (xs * n)[:, None]
    i = jnp.arange(2 * n + 1, dtype=jnp.int32)[None, :]

    tcol = jnp.clip(x0 + (i - 1), 0, w - 1)
    trow = jnp.clip(y0 - 1, 0, h - 1)
    top = p[jnp.broadcast_to(trow, tcol.shape), tcol]
    top = jnp.where(y0 == 0, boundary, top)
    top = top.at[:, 0].set(
        jnp.where((y0[:, 0] == 0) | (x0[:, 0] == 0), boundary, top[:, 0])
    )

    lrow = jnp.clip(y0 + (i - 1), 0, h - 1)
    lcol = jnp.clip(x0 - 1, 0, w - 1)
    left = p[lrow, jnp.broadcast_to(lcol, lrow.shape)]
    left = jnp.where(x0 == 0, boundary, left)
    left = left.at[:, 0].set(
        jnp.where((y0[:, 0] == 0) | (x0[:, 0] == 0), boundary, left[:, 0])
    )
    return jnp.concatenate([top, left], axis=-1)


def extract_refs(
    plane: jnp.ndarray, n: int, boundary: int = BOUNDARY_FILL
) -> jnp.ndarray:
    """Batched neighbor extraction: (H, W) -> (nb, 4N+2) int32.

    Layout per block: positions 0..2N are the top reference with the
    corner at 0; positions 2N+1..4N+1 are the left reference with the
    corner at 2N+1.
    """
    h, w = plane.shape
    nby, nbx = h // n, w // n
    p = plane.astype(jnp.int32)

    y0 = (jnp.arange(nby, dtype=jnp.int32) * n)[:, None]          # (nby, 1)
    x0 = (jnp.arange(nbx, dtype=jnp.int32) * n)[None, :]          # (1, nbx)

    i = jnp.arange(2 * n + 1, dtype=jnp.int32)                    # 0..2N

    # Top: row y0-1, columns x0-1+i (clamped right; i>=1 never goes left).
    tcol = jnp.clip(x0[:, :, None] + (i - 1)[None, None, :], 0, w - 1)
    trow = jnp.clip(y0[:, :, None] - 1, 0, h - 1)
    top = p[trow, tcol]                                           # (nby, nbx, 2N+1)
    top = jnp.where(y0[:, :, None] == 0, boundary, top)
    top = top.at[:, :, 0].set(
        jnp.where((y0 == 0) | (x0 == 0), boundary, top[:, :, 0])
    )

    # Left: column x0-1, rows y0-1+i (clamped down).
    lrow = jnp.clip(y0[:, :, None] + (i - 1)[None, None, :], 0, h - 1)
    lcol = jnp.clip(x0[:, :, None] - 1, 0, w - 1)
    left = p[lrow, lcol]
    left = jnp.where(x0[:, :, None] == 0, boundary, left)
    left = left.at[:, :, 0].set(
        jnp.where((y0 == 0) | (x0 == 0), boundary, left[:, :, 0])
    )

    refs = jnp.concatenate([top, left], axis=-1)                  # (nby, nbx, 4N+2)
    return refs.reshape(nby * nbx, 4 * n + 2)
