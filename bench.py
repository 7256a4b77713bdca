"""Benchmark: all-intra encode throughput on one chip, multi-config.

Rows (each timed separately and gated on bit-exactness):
  1. flagship — 1080p luma, 8x8 dc_planar/energy full pipeline on the
     fused slab kernel (BASELINE.json north star); gated on a 256-block
     bit-exactness check vs the numpy oracle.
  2. mode_search_8x8 — 1080p luma, full 35-mode SATD search fused in
     VMEM; gated on whole-frame equality vs the XLA decide_modes path
     (itself oracle-fuzzed in tests/test_reference_parity.py).
  3. mode_search_4x4_dst — 1080p luma, 35-mode SATD at 4x4 with the
     DST-VII transform (the HEVC 4x4 luma intra rule); same gate.
  4. full_yuv — 1080p 4:2:0 frame (Y 8x8 + U/V 4x4 chroma) through the
     slab kernels; gated on whole-plane equality vs the XLA path.
  5. uhd_4k — 2160x3840 luma, 8x8 dc_planar slab; 256-block oracle gate.
  6. wavefront — 1080p closed-loop (reconstruction-fed prediction),
     32-frame diagonal interleave;
     gated on whole-output equality vs the XLA scan path (itself
     verified against the sequential per-block oracle in
     tests/test_wavefront.py).
  7. closed_loop_35 — 1080p closed-loop 35-mode SATD search (batch 4,
     2-step scan unroll); gated on pixel-exact decode_plane round-trip.
  8-11. 16x16 / 32x32 slab + mode-search gates (Mosaic-compiled, small
     planes); whole-output equality vs the XLA path.
  12. wavefront single-frame crossover — fused kernel vs XLA at b=1.
  13. sequence e2e — 120-frame 1080p closed-loop sequence to a real
     bitstream (device + host entropy + NAL write), decode-verified,
     with an entropy-tiles A/B.

Prints ONE JSON line; the top-level metric/value is the flagship row,
and the full row set rides in "rows":
  {"metric": ..., "value": Mpix/s, "unit": "Mpix/s", "vs_baseline": x,
   "rows": [{"metric": ..., "value": ..., "unit": "Mpix/s",
             "bit_exact": true}, ...]}

vs_baseline is the speedup over the reference's measured full-pipeline
rate of ~0.10 Mpix/s on one CPU core (BASELINE.md).

Methodology, shaped by the axon tunnel's failure modes (device->host
transfers are slow and can wedge; per-dispatch overhead ~10 ms):
- several frames are encoded per dispatch (vmapped batch - the
  production serving shape), amortizing the tunnel's dispatch latency;
- timing syncs via one 4-byte scalar fetch of the LAST result (the
  only honest sync through the tunnel: block_until_ready resolves at
  enqueue);
- gates fetch at most ~130 KB (sampled blocks) or one comparison
  scalar computed on device;
- the whole run executes in a subprocess with a timeout and retries,
  so a wedged transfer cannot hang the driver.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

BASELINE_MPIX_S = 0.10  # reference full per-block pipeline, BASELINE.md
# NANOHEVC_BENCH_SMOKE=1: tiny shapes / CPU-runnable structural check of
# every row and gate (validates the bench itself, not performance).
SMOKE = os.environ.get("NANOHEVC_BENCH_SMOKE") == "1"
H, W, QP = (72, 128, 22) if SMOKE else (1080, 1920, 22)
UHD_H, UHD_W = (144, 256) if SMOKE else (2160, 3840)
GATE_H, GATE_W = (128, 256) if SMOKE else (512, 1024)
SEQ_FRAMES = 3 if SMOKE else 120
TARGET_SCALE = 0.02 if SMOKE else 1.0
ATTEMPT_TIMEOUT_S = 3600  # tunnel-state dependent: large-N Mosaic
                          # compiles alone can take 5-6 min each
ATTEMPTS = 3


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_batch(batch_fn, frames, sync, pixels_per_iter, target_s, label):
    """Enqueue-K-batches/one-scalar-fetch timing loop -> Mpix/s."""
    target_s *= TARGET_SCALE
    t0 = time.time()
    out = batch_fn(frames)
    sync(out)
    log(f"[{label}] compile+first batch: {time.time() - t0:.1f}s")

    iters = 4
    while True:
        t0 = time.time()
        out = None
        for _ in range(iters):
            out = batch_fn(frames)
        sync(out)
        dt = time.time() - t0
        log(f"[{label}] {iters} batches: {dt:.2f}s wall")
        if dt > target_s or iters >= 4096:
            break
        iters = min(
            iters * 4,
            max(iters + 1, int(iters * (target_s * 1.1) / max(dt, 0.3))),
        )
    mpix_s = pixels_per_iter * iters / dt / 1e6
    log(f"[{label}] -> {mpix_s:.1f} Mpix/s")
    return mpix_s


def oracle_gate(plane, host_plane, n, height, width) -> float:
    """% of 256 sampled blocks matching the numpy oracle bit-for-bit.

    Only the sampled blocks are fetched (device-side gather, ~130 KB).
    """
    import jax
    import jax.numpy as jnp

    from nanohevc_tpu import ref as oracle
    from nanohevc_tpu.ops import tile_plane
    from nanohevc_tpu.kernels.slab_pipeline import slab_encode_plane

    rng = np.random.default_rng(0)
    nb = (height // n) * (width // n)
    nbx = width // n
    sample = rng.choice(nb, size=min(256, nb), replace=False)
    idx = jnp.asarray(sample)

    @jax.jit
    def run_and_gather(p):
        out = slab_encode_plane(p, QP, n)
        return (
            tile_plane(out["levels_slab"], n)[idx],
            tile_plane(out["recon"], n)[idx],
        )

    levels_s, recon_s = run_and_gather(plane)
    levels_s = np.asarray(levels_s)
    recon_s = np.asarray(recon_s)

    p = host_plane
    bad = 0
    for k, b in enumerate(sample):
        y0, x0 = (b // nbx) * n, (b % nbx) * n
        blk = p[y0 : y0 + n, x0 : x0 + n]
        top = np.full(n, 128, np.int16) if y0 == 0 else p[y0 - 1, x0 : x0 + n].astype(np.int16)
        left = np.full(n, 128, np.int16) if x0 == 0 else p[y0 : y0 + n, x0 - 1].astype(np.int16)
        dc = oracle.intra_dc_predict(top, left, n)
        pln = oracle.intra_planar_predict(top, left, int(top[-1]), int(left[-1]), n)
        e_dc = oracle.residual_energy(oracle.residual_block(blk, dc))
        e_pl = oracle.residual_energy(oracle.residual_block(blk, pln))
        pred = dc if e_dc <= e_pl else pln
        res = blk.astype(np.int32) - pred.astype(np.int32)
        lvl = oracle.quantize(oracle.forward_transform(res), QP, n)
        inv = oracle.inverse_transform(oracle.dequantize(lvl, QP, n))
        recon = np.clip(pred.astype(np.int32) + inv, 0, 255)
        if not (np.array_equal(lvl, levels_s[k]) and np.array_equal(recon, recon_s[k])):
            bad += 1
    return 100.0 * (len(sample) - bad) / len(sample)


def device_equal(a, b) -> bool:
    """Whole-array equality computed on device; one scalar fetched."""
    import jax.numpy as jnp

    return bool(jnp.array_equal(a, b))


def bench_sequence_e2e(num_frames: int = SEQ_FRAMES) -> dict:
    """BASELINE config 5: 120-frame 1080p sequence, device encode +
    host entropy + bitstream write, END-TO-END Mpix/s (wall clock from
    raw YUV file to finished bitstream, everything included).

    Closed-loop (reconstruction-fed) so the stream is pixel-exactly
    decodable; the gate decodes 2 sampled frames and compares them to
    an independent re-encode of the same source frames.  Also runs a
    16-frame entropy-tiles A/B (tiles=4 vs 1) and reports the host
    entropy-stage ratio (1-core container: expect ~1.0; the win needs
    real cores).
    """
    import tempfile

    import jax.numpy as jnp

    from nanohevc_tpu.config import EncoderConfig
    from nanohevc_tpu.models.sequence import decode_sequence_levels, encode_sequence
    from nanohevc_tpu.models.wavefront import encode_frame_closed_loop
    from nanohevc_tpu.frame import Frame

    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:H, 0:W]
    frame_bytes = H * W * 3 // 2
    tmp = tempfile.mkdtemp(prefix="nhseq_")
    src_path = os.path.join(tmp, "in.yuv")
    bs_path = os.path.join(tmp, "out.bin")
    # moving synthetic content: cheap to generate, non-trivial to code
    log("[sequence] generating source...")
    with open(src_path, "wb") as f:
        for i in range(num_frames):
            y = (128 + 80 * np.sin(xx / 19 + i * 0.3) * np.cos(yy / 23)
                 + rng.normal(0, 6, (H, W)))
            u = np.full((H // 2, W // 2), 128, np.uint8)
            f.write(np.clip(y, 0, 255).astype(np.uint8).tobytes())
            f.write(u.tobytes())
            f.write(u.tobytes())
    config = EncoderConfig(block_size=8, qp=30)

    log("[sequence] encoding...")
    t0 = time.time()
    res = encode_sequence(
        src_path, W, H, num_frames, config, bs_path,
        batch=8, resume=False, closed_loop=True,
    )
    dt = time.time() - t0
    mpix = num_frames * H * W * 1.5 / dt / 1e6
    log(f"[sequence] {num_frames} frames in {dt:.1f}s end-to-end "
        f"-> {mpix:.1f} Mpix/s (YUV pixels, host entropy included)")

    # decode-verify gate: 2 sampled frames decode == independent
    # closed-loop re-encode of the same source frames
    log("[sequence] decode-verify gate...")
    frames_lv = decode_sequence_levels(bs_path)
    ok = len(frames_lv) == num_frames
    if ok:
        from nanohevc_tpu.models.wavefront import decode_plane

        for fi in (0, num_frames - 1):
            with open(src_path, "rb") as f:
                f.seek(fi * frame_bytes)
                fr = Frame.from_yuv420p(f.read(frame_bytes), H, W)
            recon, _ = encode_frame_closed_loop(fr, config)
            sl = frames_lv[fi]["Y"]
            got = decode_plane(
                jnp.asarray(sl["levels"]),
                jnp.asarray(sl["modes"]),
                jnp.int32(sl.get("qp", config.qp)),
                n=config.block_size, height=H, width=W,
                scan=config.scan,
            )
            ok = ok and np.array_equal(
                np.asarray(got), recon.y.data.astype(np.int32)
            )
            if not ok:
                log(f"[sequence] decode-verify FAILED at frame {fi}")
                break

    # entropy-tiles A/B on a 16-frame prefix: entropy-stage wall ratio
    ab = {}
    for tiles in (1, 4):
        t0 = time.time()
        encode_sequence(
            src_path, W, H, 16, config,
            os.path.join(tmp, f"ab{tiles}.bin"),
            batch=8, resume=False, closed_loop=True, entropy_tiles=tiles,
        )
        ab[tiles] = time.time() - t0
    ratio = ab[1] / max(ab[4], 1e-9)
    log(f"[sequence] entropy-tiles A/B (16 frames): tiles=1 {ab[1]:.1f}s, "
        f"tiles=4 {ab[4]:.1f}s -> speedup {ratio:.2f}x")

    for p in os.listdir(tmp):
        os.unlink(os.path.join(tmp, p))
    os.rmdir(tmp)
    return {
        "metric": f"{num_frames}-frame {H}p sequence end-to-end "
                  "(device + host entropy + bitstream, closed loop)",
        "value": round(mpix, 1),
        "unit": "Mpix/s",
        "bit_exact": bool(ok),
        "coded_bytes": int(res.bytes_written),
        "entropy_tiles4_speedup": round(ratio, 2),
    }


def run_bench() -> None:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from nanohevc_tpu.kernels.mode_search_slab import mode_search_encode_plane
    from nanohevc_tpu.kernels.slab_pipeline import slab_encode_plane
    from nanohevc_tpu.models.all_intra import encode_plane_full

    log(f"backend: {jax.devices()}")
    rng = np.random.default_rng(0)
    host_plane = rng.integers(0, 256, (H, W)).astype(np.int32)
    plane = jnp.asarray(host_plane)

    def sync_recon(out):
        _ = int(out["recon"][0, 0, 0])

    rows = []
    gates_ok = True

    def add_row(metric, value, bit_exact):
        nonlocal gates_ok
        rows.append({
            "metric": metric,
            "value": round(value, 1),
            "unit": "Mpix/s",
            "bit_exact": bool(bit_exact),
        })
        log(f"[{metric}] bit_exact={bit_exact}")
        gates_ok = gates_ok and bit_exact

    # ---- Row 1: flagship 1080p 8x8 dc_planar slab ------------------------
    frames32 = jnp.stack([plane] * 32)
    flag_fn = jax.jit(jax.vmap(lambda p: slab_encode_plane(p, QP, 8)))
    flagship = time_batch(
        flag_fn, frames32, sync_recon, H * W * 32, 15.0, "flagship"
    )
    pct = oracle_gate(plane, host_plane, 8, H, W)
    log(f"[flagship] oracle gate: {pct:.1f}% of 256 blocks")
    add_row("1080p luma 8x8 dc_planar full pipeline", flagship, pct == 100.0)

    # ---- Row 2: 1080p 35-mode SATD search (8x8) --------------------------
    # Rides the shipped auto dispatch (grouped-interleaved kernel at
    # N=8: 1065 vs 455 Mpix/s for the slab kernel, scan-chained 1080p).
    from nanohevc_tpu.kernels.mode_search_grouped import (
        mode_search_encode_plane_auto,
    )

    frames8 = jnp.stack([plane] * 8)
    ms8_fn = jax.jit(
        jax.vmap(lambda p: mode_search_encode_plane_auto(p, QP, 8))
    )
    ms8 = time_batch(ms8_fn, frames8, sync_recon, H * W * 8, 8.0, "mode8")
    got = ms8_fn(frames8)
    want = jax.jit(
        lambda p: encode_plane_full(
            p, jnp.int32(QP), n=8, mode_set="all", decision="satd"
        )
    )(plane)
    ok = device_equal(got["recon"][0], want["recon"]) and device_equal(
        got["modes_slab"][0][::8, ::8].reshape(-1), want["modes"]
    )
    add_row("1080p luma 35-mode SATD search, 8x8", ms8, ok)

    # ---- Row 3: 1080p 35-mode SATD search at 4x4 + DST-VII ---------------
    # 4x4 rides the grouped-interleaved kernel (8 block-rows per sublane
    # tile); gate is vs the XLA decide_modes path as before.
    from nanohevc_tpu.kernels.mode_search_grouped import (
        mode_search_encode_plane_grouped,
    )

    frames4 = jnp.stack([plane] * 4)
    ms4_fn = jax.jit(
        jax.vmap(
            lambda p: mode_search_encode_plane_grouped(p, QP, 4, use_dst=True)
        )
    )
    ms4 = time_batch(ms4_fn, frames4, sync_recon, H * W * 4, 8.0, "mode4")
    got = ms4_fn(frames4)
    want = jax.jit(
        lambda p: encode_plane_full(
            p, jnp.int32(QP), n=4, mode_set="all", decision="satd",
            use_dst=True,
        )
    )(plane)
    ok = device_equal(got["recon"][0], want["recon"]) and device_equal(
        got["modes_slab"][0][::4, ::4].reshape(-1), want["modes"]
    )
    add_row("1080p luma 35-mode SATD search, 4x4 DST-VII", ms4, ok)

    # ---- Row 4: full 4:2:0 YUV frame (Y 8x8 + U/V 4x4) -------------------
    host_u = rng.integers(0, 256, (H // 2, W // 2)).astype(np.int32)
    host_v = rng.integers(0, 256, (H // 2, W // 2)).astype(np.int32)
    u = jnp.asarray(host_u)
    v = jnp.asarray(host_v)

    def yuv_one(y, u, v):
        ry = slab_encode_plane(y, QP, 8)["recon"]
        ru = slab_encode_plane(u, QP, 4)["recon"]
        rv = slab_encode_plane(v, QP, 4)["recon"]
        return ry, ru, rv

    yuv_fn = jax.jit(jax.vmap(yuv_one))
    yuv_frames = (
        jnp.stack([plane] * 16), jnp.stack([u] * 16), jnp.stack([v] * 16)
    )
    yuv = time_batch(
        lambda t: yuv_fn(*t), yuv_frames,
        lambda out: int(out[0][0, 0, 0]),
        int(H * W * 1.5) * 16, 8.0, "yuv",
    )
    ry, ru, rv = yuv_fn(*yuv_frames)
    want_y = jax.jit(lambda p: encode_plane_full(p, jnp.int32(QP), n=8))(plane)
    want_u = jax.jit(lambda p: encode_plane_full(p, jnp.int32(QP), n=4))(u)
    ok = device_equal(ry[0], want_y["recon"]) and device_equal(
        ru[0], want_u["recon"]
    )
    add_row("1080p 4:2:0 YUV frame (Y 8x8 + UV 4x4)", yuv, ok)

    # ---- Row 5: 4K luma ---------------------------------------------------
    host_4k = np.random.default_rng(0).integers(0, 256, (UHD_H, UHD_W)).astype(np.int32)
    p4k = jnp.asarray(host_4k)
    frames4k = jnp.stack([p4k] * 8)
    f4k_fn = jax.jit(jax.vmap(lambda p: slab_encode_plane(p, QP, 8)))
    r4k = time_batch(
        f4k_fn, frames4k, sync_recon, UHD_H * UHD_W * 8, 8.0, "4k"
    )
    pct = oracle_gate(p4k, host_4k, 8, UHD_H, UHD_W)
    log(f"[4k] oracle gate: {pct:.1f}% of 256 blocks")
    add_row("4K (2160x3840) luma 8x8 dc_planar full pipeline", r4k, pct == 100.0)

    # ---- Row 6: 1080p closed-loop wavefront (fused Pallas kernel) --------
    from nanohevc_tpu.models.wavefront import (
        encode_plane_closed_loop,
        encode_planes_closed_loop,
    )

    frames_wf = jnp.stack([plane] * 32)
    wf_fn = jax.jit(
        lambda ps: encode_planes_closed_loop(ps, jnp.int32(QP), n=8)
    )
    wf = time_batch(
        wf_fn, frames_wf, lambda out: int(out["recon"][0, 0, 0]),
        H * W * 32, 8.0, "wavefront",
    )
    # Cross-implementation gate: the batched XLA scan vs the fused
    # Pallas wavefront kernel (each independently oracle-pinned in
    # tests/test_wavefront.py).
    got = wf_fn(frames_wf)
    want = jax.jit(
        lambda p: encode_plane_closed_loop(
            p, jnp.int32(QP), n=8, allow_fast=True
        )
    )(plane)
    ok = (
        device_equal(got["recon"][0], want["recon"])
        and device_equal(got["levels"][0], want["levels"])
        and device_equal(got["modes"][0], want["modes"])
    )
    add_row("1080p closed-loop wavefront (reconstruction-fed), 8x8", wf, ok)

    # ---- Row 7: closed-loop 35-mode SATD search (the honest encoder's
    # closed-loop config), on the fused wavefront mode-search kernel
    # (kernels/wavefront_mode_slab.py; auto-selected).  Two gates: the
    # XLA-scan path must agree bit-exactly on one frame (the scan is
    # itself pinned to the sequential per-block oracle), and
    # decode_plane must reproduce the encoder's reconstruction exactly
    # from (levels, modes) alone — the defining closed-loop property.
    from nanohevc_tpu.models.wavefront import decode_plane

    cl_b = int(os.environ.get("NANOHEVC_BENCH_CL_BATCH", "4"))
    # escape hatch: NANOHEVC_BENCH_CL_XLA=1 forces the XLA scan path
    # (e.g. if the fused kernel's Mosaic compile misbehaves on a
    # degraded tunnel; the row is then the round-2 configuration)
    cl_fast = None if os.environ.get("NANOHEVC_BENCH_CL_XLA") != "1" else False
    frames_cl = jnp.stack([plane] * cl_b)
    cl_fn = jax.jit(
        lambda ps: encode_planes_closed_loop(
            ps, jnp.int32(QP), n=8, mode_set="all", decision="satd",
            allow_fast=cl_fast, unroll=2 if cl_fast is False else 1,
        )
    )
    cl = time_batch(
        cl_fn, frames_cl, lambda out: int(out["recon"][0, 0, 0]),
        H * W * cl_b, 8.0, "closed_loop_35",
    )
    got = cl_fn(frames_cl)
    want = jax.jit(
        lambda p: encode_plane_closed_loop(
            p, jnp.int32(QP), n=8, mode_set="all", decision="satd",
            allow_fast=False,
        )
    )(plane)
    ok = all(
        device_equal(got[k][0], want[k]) for k in ("recon", "levels", "modes")
    )
    dec = jax.jit(
        lambda lv, md: decode_plane(
            lv, md, jnp.int32(QP), n=8, height=H, width=W
        )
    )(got["levels"][0], got["modes"][0])
    ok = ok and device_equal(dec, got["recon"][0])
    add_row("1080p closed-loop 35-mode SATD search, 8x8", cl, ok)

    # ---- Rows 8-11: 16x16 / 32x32 Mosaic-compiled gates ------------------
    # Smaller planes: the point is on-chip (not interpret-mode) coverage
    # of the large-N kernels, with bit-exactness gates, at bounded cost.
    host_g = rng.integers(0, 256, (GATE_H, GATE_W)).astype(np.int32)
    plane_g = jnp.asarray(host_g)
    frames_g = jnp.stack([plane_g] * 8)
    for ng in (16, 32):
        sl_fn = jax.jit(jax.vmap(lambda p, ng=ng: slab_encode_plane(p, QP, ng)))
        v = time_batch(
            sl_fn, frames_g, sync_recon, GATE_H * GATE_W * 8, 4.0, f"slab{ng}"
        )
        got = sl_fn(frames_g)
        want = jax.jit(
            lambda p, ng=ng: encode_plane_full(p, jnp.int32(QP), n=ng)
        )(plane_g)
        from nanohevc_tpu import ops as _ops

        lv_packed = jax.jit(
            lambda l, ng=ng: _ops.scan_pack(_ops.tile_plane(l, ng))
        )(got["levels_slab"][0])
        ok = device_equal(got["recon"][0], want["recon"]) and device_equal(
            lv_packed, want["levels"]
        )
        add_row(f"{GATE_H}x{GATE_W} luma {ng}x{ng} dc_planar full pipeline", v, ok)

        ms_fn = jax.jit(
            jax.vmap(lambda p, ng=ng: mode_search_encode_plane(p, QP, ng))
        )
        v = time_batch(
            ms_fn, frames_g, sync_recon, GATE_H * GATE_W * 8, 4.0, f"mode{ng}"
        )
        got = ms_fn(frames_g)
        want = jax.jit(
            lambda p, ng=ng: encode_plane_full(
                p, jnp.int32(QP), n=ng, mode_set="all", decision="satd"
            )
        )(plane_g)
        ok = device_equal(got["recon"][0], want["recon"]) and device_equal(
            got["modes_slab"][0][::ng, ::ng].reshape(-1), want["modes"]
        )
        add_row(f"{GATE_H}x{GATE_W} luma 35-mode SATD search, {ng}x{ng}", v, ok)

    # ---- Row 12: wavefront kernel vs XLA at batch 1 (the crossover) ------
    # The fused kernel exists for single-frame latency; auto-select uses
    # it only at b==1 (models/wavefront.py).  Measure both sides so a
    # regression in the crossover assumption is visible in the bench.
    wf1_k = jax.jit(
        lambda p: encode_plane_closed_loop(
            p, jnp.int32(QP), n=8, allow_fast=True
        )
    )
    wf1_x = jax.jit(
        lambda p: encode_plane_closed_loop(
            p, jnp.int32(QP), n=8, allow_fast=False
        )
    )
    v_k = time_batch(
        wf1_k, plane, lambda o: int(o["recon"][0, 0]), H * W, 4.0, "wf1_kernel"
    )
    v_x = time_batch(
        wf1_x, plane, lambda o: int(o["recon"][0, 0]), H * W, 4.0, "wf1_xla"
    )
    got, want = wf1_k(plane), wf1_x(plane)
    ok = device_equal(got["recon"], want["recon"]) and device_equal(
        got["levels"], want["levels"]
    )
    log(f"[wf1] kernel {v_k:.1f} vs XLA {v_x:.1f} Mpix/s at b=1 "
        f"(speedup {v_k / max(v_x, 1e-9):.2f}x; auto-select assumes >= 1)")
    add_row("1080p closed-loop wavefront single-frame (fused kernel)", v_k, ok)
    rows[-1]["xla_b1"] = round(v_x, 1)
    rows[-1]["kernel_b1_speedup"] = round(v_k / max(v_x, 1e-9), 2)

    # ---- Row 13: end-to-end 120-frame 1080p sequence (BASELINE config 5) -
    seq = bench_sequence_e2e()
    rows.append(seq)
    log(f"[sequence] {seq}")
    gates_ok = gates_ok and seq["bit_exact"]

    # ---- Emit -------------------------------------------------------------
    if not gates_ok:
        print(json.dumps({
            "metric": "BIT-EXACTNESS FAILURE", "value": 0.0, "unit": "Mpix/s",
            "vs_baseline": 0.0, "rows": rows,
        }))
        sys.exit(1)

    print(json.dumps({
        "metric": "1080p all-intra luma full pipeline (predict+DCT+Q+IQ+recon), 1 chip",
        "value": round(flagship, 1),
        "unit": "Mpix/s",
        "vs_baseline": round(flagship / BASELINE_MPIX_S, 1),
        "rows": rows,
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
