"""Measure the wrapped closed-loop wavefront kernel on the real chip.

Usage: python tools/measure_wrap.py GROUP LANES WRAP [H W QP]

Times wavefront_mode_search_raster_grouped at 1080p (default) for one
(g, m, F) batch factorization, batch = g*m*F, using the bench's
enqueue-K-batches / one-scalar-fetch pattern (the only honest sync
through the axon tunnel).  One config per process so a tunnel wedge
loses only that config.  Prints one JSON line:
  {"g":, "m":, "f":, "batch":, "compile_s":, "mpix_s":}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    g, m, f = (int(a) for a in sys.argv[1:4])
    rest = [int(a) for a in sys.argv[4:7]]
    h, w, qp = rest if rest else (1080, 1920, 22)

    import jax
    import jax.numpy as jnp

    from nanohevc_tpu import ops
    from nanohevc_tpu.kernels.wavefront_mode_grouped import (
        wavefront_mode_search_raster_grouped,
    )

    n = 8
    nby, nbx = h // n, w // n
    b = g * m * f
    rng = np.random.default_rng(7)
    planes = jnp.asarray(rng.integers(0, 256, (b, h, w)).astype(np.int32))
    blocks = jax.jit(jax.vmap(lambda p: ops.tile_plane(p, n)))(planes)
    blocks.block_until_ready()

    fn = jax.jit(
        lambda bl: wavefront_mode_search_raster_grouped(
            bl, jnp.int32(qp), n=n, nby=nby, nbx=nbx,
            group=g, lanes=m, wrap=f, interpret=False,
        )
    )

    t0 = time.time()
    rec, lev, modes = fn(blocks)
    sync = int(jax.device_get(rec[0, 0, 0, 0]))
    compile_s = time.time() - t0
    print(f"[g{g} m{m} f{f}] compile+first: {compile_s:.1f}s",
          file=sys.stderr, flush=True)

    iters = 4
    while True:
        t0 = time.time()
        out = None
        for _ in range(iters):
            out = fn(blocks)
        _ = int(jax.device_get(out[0][0, 0, 0, 0]))
        dt = time.time() - t0
        print(f"[g{g} m{m} f{f}] {iters} batches: {dt:.2f}s",
              file=sys.stderr, flush=True)
        if dt > 6.0 or iters >= 4096:
            break
        iters = min(iters * 4, max(iters + 1, int(iters * 6.6 / max(dt, 0.3))))

    mpix_s = h * w * b * iters / dt / 1e6
    print(json.dumps({
        "g": g, "m": m, "f": f, "batch": b,
        "compile_s": round(compile_s, 1), "mpix_s": round(mpix_s, 1),
        "sync": sync,
    }), flush=True)


if __name__ == "__main__":
    main()
