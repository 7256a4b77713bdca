"""Benchmark: 1080p all-intra luma full-pipeline throughput on one chip.

Measures the flagship path (BASELINE.json north star): tile ->
neighbor refs -> DC/planar mode decision -> predict -> residual ->
8x8 DCT -> quantize(QP22) -> scan-pack -> dequantize -> inverse ->
reconstruct -> clip, as one jitted device graph, end to end, on
whatever backend the ambient environment provides (the real TPU chip
under the driver).

Prints ONE JSON line:
  {"metric": ..., "value": Mpix/s, "unit": "Mpix/s", "vs_baseline": x}

vs_baseline is the speedup over the reference's measured full-pipeline
rate of ~0.10 Mpix/s on one CPU core (BASELINE.md).  A bit-exactness
spot check against the numpy oracle runs first and is reported on
stderr; the benchmark aborts if any block mismatches.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_MPIX_S = 0.10  # reference full per-block pipeline, BASELINE.md
H, W, N, QP = 1080, 1920, 8, 22
WARMUP, ITERS = 3, 20


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def check_bit_exact(fn, plane, qp, host_plane) -> float:
    """% of blocks whose full pipeline output matches the numpy oracle.

    The axon tunnel's device->host path is slow (~MB/s), so only the
    256 sampled blocks are fetched: a device-side gather cuts the
    transfer from ~25 MB to ~130 KB.
    """
    import jax
    import jax.numpy as jnp

    from nanohevc_tpu import ref as oracle
    from nanohevc_tpu.ops import scan_unpack, tile_plane

    rng = np.random.default_rng(0)
    nb = (H // N) * (W // N)
    nbx = W // N
    sample = rng.choice(nb, size=256, replace=False)
    idx = jnp.asarray(sample)

    @jax.jit
    def run_and_gather(p, q):
        out = fn(p, q)
        return (
            scan_unpack(out["levels"])[idx],
            tile_plane(out["recon"], N)[idx],
        )

    levels_s, recon_s = run_and_gather(plane, qp)
    levels_s = np.asarray(levels_s)
    recon_s = np.asarray(recon_s)

    p = host_plane
    src_blocks = {
        b: p[(b // nbx) * N : (b // nbx) * N + N, (b % nbx) * N : (b % nbx) * N + N]
        for b in sample
    }
    bad = 0
    for k, b in enumerate(sample):
        y0, x0 = (b // nbx) * N, (b % nbx) * N
        top = np.full(N, 128, np.int16) if y0 == 0 else p[y0 - 1, x0 : x0 + N].astype(np.int16)
        left = np.full(N, 128, np.int16) if x0 == 0 else p[y0 : y0 + N, x0 - 1].astype(np.int16)
        dc = oracle.intra_dc_predict(top, left, N)
        pl = oracle.intra_planar_predict(top, left, int(top[-1]), int(left[-1]), N)
        e_dc = oracle.residual_energy(oracle.residual_block(src_blocks[b], dc))
        e_pl = oracle.residual_energy(oracle.residual_block(src_blocks[b], pl))
        pred = dc if e_dc <= e_pl else pl
        res = src_blocks[b].astype(np.int32) - pred.astype(np.int32)
        coeff = oracle.forward_transform(res)
        lvl = oracle.quantize(coeff, QP, N)
        rec = oracle.dequantize(lvl, QP, N)
        inv = oracle.inverse_transform(rec)
        recon = np.clip(pred.astype(np.int32) + inv, 0, 255)
        if not (np.array_equal(lvl, levels_s[k]) and np.array_equal(recon, recon_s[k])):
            bad += 1
    return 100.0 * (len(sample) - bad) / len(sample)


def main() -> None:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import entry

    log(f"backend: {jax.devices()}")
    fn_raw, (plane, qp) = entry()
    fn = jax.jit(fn_raw)
    host_plane = np.random.default_rng(0).integers(0, 256, (H, W)).astype(np.int32)
    assert np.array_equal(host_plane[:2, :8], np.asarray(plane[:2, :8])), (
        "entry() example plane must match bench host seed"
    )

    t0 = time.time()
    out = fn(plane, qp)
    out["recon"].block_until_ready()
    log(f"compile+first run: {time.time() - t0:.1f}s")

    pct = check_bit_exact(fn_raw, plane, qp, host_plane)
    log(f"bit-exact blocks vs numpy oracle: {pct:.1f}% (256 sampled)")
    if pct < 100.0:
        print(json.dumps({"metric": "BIT-EXACTNESS FAILURE", "value": pct,
                          "unit": "%", "vs_baseline": 0.0}))
        sys.exit(1)

    for _ in range(WARMUP):
        out = fn(plane, qp)
    out["recon"].block_until_ready()

    t0 = time.time()
    for _ in range(ITERS):
        out = fn(plane, qp)
    out["recon"].block_until_ready()
    dt = time.time() - t0

    mpix_s = (H * W * ITERS) / dt / 1e6
    log(f"{ITERS} frames in {dt * 1e3:.1f} ms -> {mpix_s:.1f} Mpix/s "
        f"({dt / ITERS * 1e3:.2f} ms/frame)")
    print(json.dumps({
        "metric": "1080p all-intra luma full pipeline (predict+DCT+Q+IQ+recon), 1 chip",
        "value": round(mpix_s, 1),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / BASELINE_MPIX_S, 1),
    }))


if __name__ == "__main__":
    main()
