"""Benchmark: 1080p all-intra luma full-pipeline throughput on one chip.

Measures the flagship path (BASELINE.json north star): the fused
slab Pallas kernel — neighbor refs -> DC/planar mode decision ->
predict -> residual -> 8x8 DCT -> quantize(QP22) -> dequantize ->
inverse -> reconstruct -> clip, whole plane per launch — on the
ambient backend (the real TPU chip under the driver).

Prints ONE JSON line:
  {"metric": ..., "value": Mpix/s, "unit": "Mpix/s", "vs_baseline": x}

vs_baseline is the speedup over the reference's measured full-pipeline
rate of ~0.10 Mpix/s on one CPU core (BASELINE.md).

Methodology, shaped by the axon tunnel's failure modes (device->host
transfers are slow and can wedge; per-dispatch overhead ~10 ms):
- FRAMES frames are encoded per dispatch (vmapped batch - the
  production serving shape and BASELINE config 5), amortizing the
  tunnel's dispatch latency;
- only the 256-block oracle check fetches data, after timing, via a
  device-side gather (~130 KB);
- the whole run executes in a subprocess with a timeout and retries,
  so a wedged transfer cannot hang the driver.

A 256-block bit-exactness check against the numpy oracle gates the
result (any mismatch -> exit 1).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

BASELINE_MPIX_S = 0.10  # reference full per-block pipeline, BASELINE.md
H, W, N, QP = 1080, 1920, 8, 22
FRAMES, WARMUP, ITERS = 32, 3, 20
ATTEMPT_TIMEOUT_S = 600
ATTEMPTS = 3


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def check_bit_exact(plane, host_plane) -> float:
    """% of 256 sampled blocks matching the numpy oracle bit-for-bit.

    Only the sampled blocks are fetched (device-side gather, ~130 KB).
    """
    import jax
    import jax.numpy as jnp

    from nanohevc_tpu import ref as oracle
    from nanohevc_tpu.ops import tile_plane

    from nanohevc_tpu.kernels.slab_pipeline import slab_encode_plane

    rng = np.random.default_rng(0)
    nb = (H // N) * (W // N)
    nbx = W // N
    sample = rng.choice(nb, size=256, replace=False)
    idx = jnp.asarray(sample)

    @jax.jit
    def run_and_gather(p):
        out = slab_encode_plane(p, QP, N)
        return (
            tile_plane(out["levels_slab"], N)[idx],
            tile_plane(out["recon"], N)[idx],
        )

    levels_s, recon_s = run_and_gather(plane)
    levels_s = np.asarray(levels_s)
    recon_s = np.asarray(recon_s)

    p = host_plane
    bad = 0
    for k, b in enumerate(sample):
        y0, x0 = (b // nbx) * N, (b % nbx) * N
        blk = p[y0 : y0 + N, x0 : x0 + N]
        top = np.full(N, 128, np.int16) if y0 == 0 else p[y0 - 1, x0 : x0 + N].astype(np.int16)
        left = np.full(N, 128, np.int16) if x0 == 0 else p[y0 : y0 + N, x0 - 1].astype(np.int16)
        dc = oracle.intra_dc_predict(top, left, N)
        pln = oracle.intra_planar_predict(top, left, int(top[-1]), int(left[-1]), N)
        e_dc = oracle.residual_energy(oracle.residual_block(blk, dc))
        e_pl = oracle.residual_energy(oracle.residual_block(blk, pln))
        pred = dc if e_dc <= e_pl else pln
        res = blk.astype(np.int32) - pred.astype(np.int32)
        lvl = oracle.quantize(oracle.forward_transform(res), QP, N)
        inv = oracle.inverse_transform(oracle.dequantize(lvl, QP, N))
        recon = np.clip(pred.astype(np.int32) + inv, 0, 255)
        if not (np.array_equal(lvl, levels_s[k]) and np.array_equal(recon, recon_s[k])):
            bad += 1
    return 100.0 * (len(sample) - bad) / len(sample)


def run_bench() -> None:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from __graft_entry__ import entry

    log(f"backend: {jax.devices()}")
    _, (plane, qp) = entry()
    host_plane = np.random.default_rng(0).integers(0, 256, (H, W)).astype(np.int32)

    # Per-dispatch tunnel overhead is ~10 ms, far above the device time
    # for one 1080p frame, so the production-shaped measurement batches
    # FRAMES frames per dispatch (vmapped encode = BASELINE config 5's
    # multi-frame throughput shape) and times ITERS dispatches.
    from nanohevc_tpu.kernels.slab_pipeline import slab_encode_plane

    frames = jnp.stack([plane] * FRAMES)
    batch_fn = jax.jit(jax.vmap(lambda p: slab_encode_plane(p, QP, N)))

    t0 = time.time()
    out = batch_fn(frames)
    _ = int(out["recon"][0, 0, 0])  # real fetch: block_until_ready lies
    log(f"compile+first batch({FRAMES} frames): {time.time() - t0:.1f}s")

    # Enqueue K batches, then one 4-byte fetch of the LAST result -
    # the only honest sync through the tunnel.  Grow K until compute
    # dominates the fetch's constant overhead; report the conservative
    # quotient (includes that overhead, so it undercounts slightly).
    iters = ITERS
    while True:
        t0 = time.time()
        out = None
        for _ in range(iters):
            out = batch_fn(frames)
        _ = int(out["recon"][0, 0, 0])
        dt = time.time() - t0
        log(f"{iters} x {FRAMES}-frame batches: {dt:.2f}s wall")
        if dt > 20.0 or iters >= 4096:
            break
        iters = min(iters * 4, max(iters + 1, int(iters * 22.0 / max(dt, 0.5))))

    mpix_s = (H * W * FRAMES * iters) / dt / 1e6
    log(f"-> {mpix_s:.1f} Mpix/s ({dt/(iters*FRAMES)*1e3:.3f} ms/frame incl "
        "tunnel sync overhead)")

    pct = check_bit_exact(plane, host_plane)
    log(f"bit-exact blocks vs numpy oracle: {pct:.1f}% (256 sampled)")
    if pct < 100.0:
        print(json.dumps({"metric": "BIT-EXACTNESS FAILURE", "value": pct,
                          "unit": "%", "vs_baseline": 0.0}))
        sys.exit(1)

    print(json.dumps({
        "metric": "1080p all-intra luma full pipeline (predict+DCT+Q+IQ+recon), 1 chip",
        "value": round(mpix_s, 1),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / BASELINE_MPIX_S, 1),
    }))


def main() -> None:
    if os.environ.get("NANOHEVC_BENCH_INNER") == "1":
        run_bench()
        return
    env = dict(os.environ, NANOHEVC_BENCH_INNER="1")
    for attempt in range(1, ATTEMPTS + 1):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                timeout=ATTEMPT_TIMEOUT_S,
                capture_output=True,
                text=True,
            )
            sys.stderr.write(proc.stderr)
            if proc.returncode == 0 and proc.stdout.strip():
                sys.stdout.write(proc.stdout)
                return
            log(f"attempt {attempt} failed (rc={proc.returncode})")
        except subprocess.TimeoutExpired as e:
            if e.stderr:
                sys.stderr.write(e.stderr if isinstance(e.stderr, str)
                                 else e.stderr.decode())
            log(f"attempt {attempt} timed out after {ATTEMPT_TIMEOUT_S}s "
                "(axon tunnel wedge?)")
        time.sleep(10)
    print(json.dumps({"metric": "BENCH FAILED (tunnel wedge)", "value": 0.0,
                      "unit": "Mpix/s", "vs_baseline": 0.0}))
    sys.exit(1)


if __name__ == "__main__":
    main()
