"""Benchmark: all-intra encode throughput on one chip, multi-config.

Rows, in PRIORITY order (each timed separately, gated on bit-exactness):
  flagship      1080p luma, 8x8 dc_planar/energy full pipeline on the
                fused slab kernel (BASELINE.json north star); 256-block
                bit-exactness gate vs the numpy oracle.
  mode8         1080p luma, full 35-mode SATD search fused in VMEM
                (grouped-interleaved kernel); gated on whole-frame
                equality vs the XLA decide_modes path (itself
                oracle-fuzzed in tests/test_reference_parity.py).
  mode4         1080p luma, 35-mode SATD at 4x4 with DST-VII (the HEVC
                4x4 luma intra rule); same gate.
  closed_loop_35  1080p closed-loop (reconstruction-fed) 35-mode SATD
                search; gates: XLA-scan equality + pixel-exact
                decode_plane round trip.
  wavefront     1080p closed-loop dc_planar, 32-frame diagonal
                interleave; whole-output equality vs the fused kernel.
  sequence      24-frame 1080p closed-loop sequence to a real bitstream
                (device + host entropy + NAL write), decode-verified,
                plus two A/Bs: loop-filters+spec-CABAC on/off cost, and
                entropy tiles 4 vs 1.
  yuv           1080p 4:2:0 frame (Y 8x8 + U/V 4x4 chroma).
  uhd_4k        2160x3840 luma, 8x8 dc_planar slab.
  wf1           closed-loop single-frame crossover: fused kernel vs XLA.
  slab16/mode16/slab32/mode32  large-N Mosaic-compiled gates on small
                planes (on-chip coverage of the 16x16/32x32 kernels).

DRIVER-SAFETY DESIGN (this is what round 3 lacked — its all-at-the-end
emission lost everything to a driver timeout, BENCH_r03.json rc=124):
  - after EVERY row the inner process prints the full cumulative JSON
    line to real (uncaptured, line-flushed) stdout, so the driver's
    last-line parse always sees the newest complete result even if it
    kills the process mid-run;
  - a total wall budget (NANOHEVC_BENCH_BUDGET_S, default 2250 s) is
    enforced BEFORE each row using per-row cost estimates; rows that
    don't fit are emitted as {"skipped": true} instead of dying;
  - completed rows persist to a state file, so a retry after a wedge
    resumes instead of re-measuring (this, not the jax persistent
    compilation cache, is the recompile-avoidance mechanism: measured
    on this container 2026-08-19, cache WRITES work on the axon
    backend but cache HITS wedge the process >120 s where the cold
    compile takes 1.7 s — do not enable jax_compilation_cache_dir
    here); a row that *started* twice without completing is presumed
    to wedge the tunnel and is skipped.

Output: ONE JSON line per emission; the top-level metric/value is the
flagship row and the full row set rides in "rows":
  {"metric": ..., "value": Mpix/s, "unit": "Mpix/s", "vs_baseline": x,
   "rows": [{"metric": ..., "value": ..., "unit": "Mpix/s",
             "bit_exact": true}, ...]}

vs_baseline is the speedup over the reference's measured full-pipeline
rate of ~0.10 Mpix/s on one CPU core (BASELINE.md).

Timing methodology, shaped by the axon tunnel's failure modes
(device->host transfers are slow and can wedge; ~10 ms per dispatch):
several frames per dispatch (vmapped batch — the production serving
shape); sync via one 4-byte scalar fetch of the LAST result (the only
honest sync through the tunnel: block_until_ready resolves at enqueue);
gates fetch at most ~130 KB (sampled blocks) or one on-device
comparison scalar.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

BASELINE_MPIX_S = 0.10  # reference full per-block pipeline, BASELINE.md
# NANOHEVC_BENCH_SMOKE=1: tiny shapes / CPU-runnable structural check of
# every row and gate (validates the bench itself, not performance).
SMOKE = os.environ.get("NANOHEVC_BENCH_SMOKE") == "1"
H, W, QP = (72, 128, 22) if SMOKE else (1080, 1920, 22)
UHD_H, UHD_W = (144, 256) if SMOKE else (2160, 3840)
GATE_H, GATE_W = (128, 256) if SMOKE else (512, 1024)
SEQ_FRAMES = 3 if SMOKE else 24
TARGET_SCALE = 0.02 if SMOKE else 1.0
# Smoke's purpose is validating every row + gate on CPU, so its budget
# is sized to run them all (~12 min); the real-run default is sized to
# the driver's window.
BUDGET_S = float(os.environ.get("NANOHEVC_BENCH_BUDGET_S",
                                "1800" if SMOKE else "2250"))
EMIT_RESERVE_S = 5.0
STATE_PATH = os.environ.get(
    "NANOHEVC_BENCH_STATE",
    os.path.join(tempfile.gettempdir(), "nanohevc_bench_state.json"),
)
FLAGSHIP_METRIC = (
    "1080p all-intra luma full pipeline (predict+DCT+Q+IQ+recon), 1 chip"
)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# --------------------------------------------------------------------------
# State: completed rows + started counts, shared across attempts.
# --------------------------------------------------------------------------

def load_state() -> dict:
    try:
        with open(STATE_PATH) as f:
            st = json.load(f)
        if isinstance(st, dict) and "rows" in st:
            return st
    except (OSError, ValueError):
        pass
    return {"rows": {}, "order": [], "started": {}, "t0": time.time()}


def save_state(st: dict) -> None:
    tmp = STATE_PATH + ".tmp"
    with open(tmp, "w") as f:
        json.dump(st, f)
    os.replace(tmp, STATE_PATH)


def cumulative_json(st: dict) -> str:
    rows = [st["rows"][k] for k in st["order"] if k in st["rows"]]
    flag = next(
        (r for r in rows
         if r.get("label") == "flagship" and not r.get("skipped")),
        None,
    )
    gates_ok = all(
        r.get("bit_exact", True) for r in rows if not r.get("skipped")
    )
    out_rows = [{k: v for k, v in r.items() if k != "label"} for r in rows]
    if not gates_ok:
        return json.dumps({
            "metric": "BIT-EXACTNESS FAILURE", "value": 0.0,
            "unit": "Mpix/s", "vs_baseline": 0.0, "rows": out_rows,
        })
    v = float(flag["value"]) if flag else 0.0
    return json.dumps({
        "metric": FLAGSHIP_METRIC,
        "value": round(v, 1),
        "unit": "Mpix/s",
        "vs_baseline": round(v / BASELINE_MPIX_S, 1),
        "rows": out_rows,
    })


def emit(st: dict) -> None:
    """Print the cumulative JSON line to REAL stdout, flushed.

    The inner process inherits the parent's stdout (no capture), so
    this line is visible to the driver the moment it's printed — a
    later timeout cannot erase it."""
    print(cumulative_json(st), flush=True)


# --------------------------------------------------------------------------
# Shared measurement helpers
# --------------------------------------------------------------------------

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


def oracle_gate(plane, host_plane, n, height, width, qp=QP) -> float:
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
        out = slab_encode_plane(p, qp, n)
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
        lvl = oracle.quantize(oracle.forward_transform(res), qp, n)
        inv = oracle.inverse_transform(oracle.dequantize(lvl, qp, n))
        recon = np.clip(pred.astype(np.int32) + inv, 0, 255)
        if not (np.array_equal(lvl, levels_s[k]) and np.array_equal(recon, recon_s[k])):
            bad += 1
    return 100.0 * (len(sample) - bad) / len(sample)


def device_equal(a, b) -> bool:
    """Whole-array equality computed on device; one scalar fetched."""
    import jax.numpy as jnp

    return bool(jnp.array_equal(a, b))


# --------------------------------------------------------------------------
# Row context: lazily-built shared inputs (plane stacks etc.)
# --------------------------------------------------------------------------

class Ctx:
    """Lazy shared inputs so skipped rows cost nothing."""

    def __init__(self):
        self._cache = {}

    def _get(self, key, builder):
        if key not in self._cache:
            self._cache[key] = builder()
        return self._cache[key]

    @property
    def host_plane(self):
        return self._get("host_plane", lambda: np.random.default_rng(0)
                         .integers(0, 256, (H, W)).astype(np.int32))

    @property
    def plane(self):
        import jax.numpy as jnp

        return self._get("plane", lambda: jnp.asarray(self.host_plane))

    def frames(self, k):
        import jax.numpy as jnp

        return self._get(("frames", k), lambda: jnp.stack([self.plane] * k))


def sync_recon(out):
    _ = int(out["recon"][0, 0, 0])


# --------------------------------------------------------------------------
# Rows. Each returns a row dict: {"metric", "value", "unit", "bit_exact"}.
# est = worst-case seconds on a degraded tunnel (compiles 1-5 min).
# --------------------------------------------------------------------------

def row_flagship(ctx):
    import jax
    import jax.numpy as jnp

    from nanohevc_tpu.kernels.slab_pipeline import slab_encode_plane

    flag_fn = jax.jit(jax.vmap(lambda p: slab_encode_plane(p, QP, 8)))
    v = time_batch(
        flag_fn, ctx.frames(32), sync_recon, H * W * 32, 15.0, "flagship"
    )
    pct = oracle_gate(ctx.plane, ctx.host_plane, 8, H, W)
    log(f"[flagship] oracle gate: {pct:.1f}% of 256 blocks")
    return {
        "metric": "1080p luma 8x8 dc_planar full pipeline",
        "value": round(v, 1), "unit": "Mpix/s", "bit_exact": pct == 100.0,
    }


def row_mode8(ctx):
    import jax
    import jax.numpy as jnp

    from nanohevc_tpu.kernels.mode_search_grouped import (
        mode_search_encode_plane_auto,
    )
    from nanohevc_tpu.models.all_intra import encode_plane_full

    fn = jax.jit(jax.vmap(lambda p: mode_search_encode_plane_auto(p, QP, 8)))
    v = time_batch(fn, ctx.frames(8), sync_recon, H * W * 8, 8.0, "mode8")
    got = fn(ctx.frames(8))
    want = jax.jit(
        lambda p: encode_plane_full(
            p, jnp.int32(QP), n=8, mode_set="all", decision="satd"
        )
    )(ctx.plane)
    ok = device_equal(got["recon"][0], want["recon"]) and device_equal(
        got["modes_slab"][0][::8, ::8].reshape(-1), want["modes"]
    )
    return {
        "metric": "1080p luma 35-mode SATD search, 8x8",
        "value": round(v, 1), "unit": "Mpix/s", "bit_exact": ok,
    }


def row_mode4(ctx):
    import jax
    import jax.numpy as jnp

    from nanohevc_tpu.kernels.mode_search_grouped import (
        mode_search_encode_plane_grouped,
    )
    from nanohevc_tpu.models.all_intra import encode_plane_full

    fn = jax.jit(jax.vmap(
        lambda p: mode_search_encode_plane_grouped(p, QP, 4, use_dst=True)
    ))
    v = time_batch(fn, ctx.frames(4), sync_recon, H * W * 4, 8.0, "mode4")
    got = fn(ctx.frames(4))
    want = jax.jit(
        lambda p: encode_plane_full(
            p, jnp.int32(QP), n=4, mode_set="all", decision="satd",
            use_dst=True,
        )
    )(ctx.plane)
    ok = device_equal(got["recon"][0], want["recon"]) and device_equal(
        got["modes_slab"][0][::4, ::4].reshape(-1), want["modes"]
    )
    return {
        "metric": "1080p luma 35-mode SATD search, 4x4 DST-VII",
        "value": round(v, 1), "unit": "Mpix/s", "bit_exact": ok,
    }


def row_closed_loop_35(ctx):
    """Closed-loop 35-mode SATD search (the honest encoder's closed-loop
    config), fused wavefront mode-search kernel (auto-selected).  Two
    gates: the XLA-scan path must agree bit-exactly on one frame (the
    scan is itself pinned to the sequential per-block oracle), and
    decode_plane must reproduce the encoder's reconstruction exactly
    from (levels, modes) alone — the defining closed-loop property."""
    import jax
    import jax.numpy as jnp

    from nanohevc_tpu.models.wavefront import (
        decode_plane,
        encode_plane_closed_loop,
        encode_planes_closed_loop,
    )

    # batch 32 = g8 (sublane groups) x m1 x F4 (wrapped wavefront: 4
    # frames stream through each slot in time).  Pinned split: wrap is
    # compile-free (same lane width as b=8, ~126 s Mosaic compile on a
    # degraded tunnel) where the lane-packed m=2 layouts compile ~400 s
    # and do not fit the driver window.  Measured 842 Mpix/s on chip
    # (2026-08-20, tools/measure_wrap.py) vs 281 at the round-3 b=8.
    cl_b = int(os.environ.get("NANOHEVC_BENCH_CL_BATCH",
                              "8" if SMOKE else "32"))
    split_env = os.environ.get("NANOHEVC_BENCH_CL_SPLIT", "0,0,0")
    try:
        cl_split = tuple(int(x) for x in split_env.split(","))
    except ValueError:
        cl_split = ()
    if len(cl_split) != 3 or any(v < 0 for v in cl_split) or (
        any(cl_split) and not all(cl_split)
    ):
        # fail at the env var, not via tuple-unpack/divmod deep inside
        # the kernel: exactly three ints, all positive or all 0 (auto)
        raise ValueError(
            f"NANOHEVC_BENCH_CL_SPLIT={split_env!r}: need 'g,m,F' with "
            "three positive ints (or '0,0,0' for auto)"
        )
    cl_split = cl_split if all(cl_split) else ((8, 1, cl_b // 8)
                                               if cl_b % 8 == 0 else None)
    # escape hatch: NANOHEVC_BENCH_CL_XLA=1 forces the XLA scan path
    cl_fast = None if os.environ.get("NANOHEVC_BENCH_CL_XLA") != "1" else False
    fn = jax.jit(
        lambda ps: encode_planes_closed_loop(
            ps, jnp.int32(QP), n=8, mode_set="all", decision="satd",
            allow_fast=cl_fast, unroll=2 if cl_fast is False else 1,
            kernel_split=None if cl_fast is False else cl_split,
        )
    )
    v = time_batch(
        fn, ctx.frames(cl_b), lambda out: int(out["recon"][0, 0, 0]),
        H * W * cl_b, 8.0, "closed_loop_35",
    )
    got = fn(ctx.frames(cl_b))
    want = jax.jit(
        lambda p: encode_plane_closed_loop(
            p, jnp.int32(QP), n=8, mode_set="all", decision="satd",
            allow_fast=False,
        )
    )(ctx.plane)
    ok = all(
        device_equal(got[k][0], want[k]) for k in ("recon", "levels", "modes")
    )
    dec = jax.jit(
        lambda lv, md: decode_plane(
            lv, md, jnp.int32(QP), n=8, height=H, width=W
        )
    )(got["levels"][0], got["modes"][0])
    ok = ok and device_equal(dec, got["recon"][0])
    return {
        "metric": "1080p closed-loop 35-mode SATD search, 8x8",
        "value": round(v, 1), "unit": "Mpix/s", "bit_exact": ok,
    }


def row_closed_loop_35_16(ctx):
    """1080p closed-loop 35-mode SATD at 16x16 on the grouped wavefront
    kernel (round-5 extension: n=16 rides the same grouped layout, the
    sublane group is 2 vregs tall).  Gates: XLA-scan equality on one
    frame + pixel-exact decode_plane round trip."""
    import jax
    import jax.numpy as jnp

    from nanohevc_tpu.models.wavefront import (
        decode_plane,
        encode_plane_closed_loop,
        encode_planes_closed_loop,
    )

    # batch 64 = g8 x m1 x F8: the deeper wrap cuts the skew idle
    # further (steps F*nbx+nby-1 vs F*(nbx+nby-1)) — measured on chip
    # 2026-08-21: 564.9 Mpix/s at b=64 (compile 151 s) vs 470.3 at
    # b=32 (compile 257 s), both gates green.
    cl_b = int(os.environ.get("NANOHEVC_BENCH_CL16_BATCH",
                              "8" if SMOKE else "64"))
    cl_split = (8, 1, cl_b // 8) if cl_b % 8 == 0 else None
    fn = jax.jit(
        lambda ps: encode_planes_closed_loop(
            ps, jnp.int32(QP), n=16, mode_set="all", decision="satd",
            kernel_split=cl_split,
        )
    )
    v = time_batch(
        fn, ctx.frames(cl_b), lambda out: int(out["recon"][0, 0, 0]),
        H * W * cl_b, 8.0, "closed_loop_35_16",
    )
    got = fn(ctx.frames(cl_b))
    want = jax.jit(
        lambda p: encode_plane_closed_loop(
            p, jnp.int32(QP), n=16, mode_set="all", decision="satd",
            allow_fast=False,
        )
    )(ctx.plane)
    ok = all(
        device_equal(got[k][0], want[k]) for k in ("recon", "levels", "modes")
    )
    dec = jax.jit(
        lambda lv, md: decode_plane(
            lv, md, jnp.int32(QP), n=16, height=H, width=W
        )
    )(got["levels"][0], got["modes"][0])
    ok = ok and device_equal(dec, got["recon"][0])
    return {
        "metric": "1080p closed-loop 35-mode SATD search, 16x16",
        "value": round(v, 1), "unit": "Mpix/s", "bit_exact": ok,
    }


def row_wavefront(ctx):
    import jax
    import jax.numpy as jnp

    from nanohevc_tpu.models.wavefront import (
        encode_plane_closed_loop,
        encode_planes_closed_loop,
    )

    fn = jax.jit(lambda ps: encode_planes_closed_loop(ps, jnp.int32(QP), n=8))
    v = time_batch(
        fn, ctx.frames(32), lambda out: int(out["recon"][0, 0, 0]),
        H * W * 32, 8.0, "wavefront",
    )
    got = fn(ctx.frames(32))
    want = jax.jit(
        lambda p: encode_plane_closed_loop(
            p, jnp.int32(QP), n=8, allow_fast=True
        )
    )(ctx.plane)
    ok = (
        device_equal(got["recon"][0], want["recon"])
        and device_equal(got["levels"][0], want["levels"])
        and device_equal(got["modes"][0], want["modes"])
    )
    return {
        "metric": "1080p closed-loop wavefront (reconstruction-fed), 8x8",
        "value": round(v, 1), "unit": "Mpix/s", "bit_exact": ok,
    }


def row_sequence(ctx):
    """BASELINE config 5: 24-frame 1080p sequence, device encode + host
    entropy + bitstream write, END-TO-END Mpix/s (wall clock from raw
    YUV file to finished bitstream, everything included).

    Closed-loop so the stream is pixel-exactly decodable; the gate
    decodes 2 sampled frames against an independent re-encode.  Two
    8-frame A/Bs ride along: (a) loop filters + spec CABAC on vs off —
    the round-3 features' throughput and bpp cost; (b) entropy tiles
    4 vs 1 (host entropy parallelism; ~1.0 expected on 1 core)."""
    import jax.numpy as jnp

    from nanohevc_tpu.config import EncoderConfig
    from nanohevc_tpu.models.sequence import (
        decode_sequence_levels,
        encode_sequence,
    )
    from nanohevc_tpu.models.wavefront import (
        decode_plane,
        encode_frame_closed_loop,
    )
    from nanohevc_tpu.frame import Frame

    num_frames = SEQ_FRAMES
    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:H, 0:W]
    frame_bytes = H * W * 3 // 2
    tmp = tempfile.mkdtemp(prefix="nhseq_")
    src_path = os.path.join(tmp, "in.yuv")
    bs_path = os.path.join(tmp, "out.bin")
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

    # Warm the jitted encode/compact programs on one batch first — every
    # other row's timing loop also excludes compilation (time_batch's
    # untimed first batch); end-to-end wall otherwise measures mostly
    # the one-time XLA compile, not the encoder.
    log("[sequence] warmup batch (compile)...")
    t0 = time.time()
    encode_sequence(
        src_path, W, H, min(8, num_frames), config,
        os.path.join(tmp, "warm.bin"), batch=8, resume=False,
        closed_loop=True,
    )
    log(f"[sequence] warmup done in {time.time() - t0:.1f}s")

    log("[sequence] encoding...")
    t0 = time.time()
    res = encode_sequence(
        src_path, W, H, num_frames, config, bs_path,
        batch=8, resume=False, closed_loop=True,
    )
    dt = time.time() - t0
    mpix = num_frames * H * W * 1.5 / dt / 1e6
    stage_s = {
        k: round(v["total_s"], 2)
        for k, v in res.stats.items()
        if isinstance(v, dict) and "total_s" in v
    }
    log(f"[sequence] {num_frames} frames in {dt:.1f}s end-to-end "
        f"-> {mpix:.1f} Mpix/s (YUV pixels, host entropy included); "
        f"stages {stage_s}")

    # decode-verify gate: 2 sampled frames decode == independent
    # closed-loop re-encode of the same source frames
    log("[sequence] decode-verify gate...")
    frames_lv = decode_sequence_levels(bs_path)
    ok = len(frames_lv) == num_frames
    if ok:
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

    # A/B 1: round-3 features cost — deblock+SAO+spec-CABAC on vs off,
    # 8-frame re-encodes; report Mpix/s ratio and coded-size delta.
    ab_n = min(8, num_frames)
    feats = {}
    for name, cfg in (
        ("off", config),
        ("on", EncoderConfig(block_size=8, qp=30, deblock=True, sao=True,
                             entropy_coder="cabac")),
    ):
        p = os.path.join(tmp, f"feat_{name}.bin")
        # warm THIS config's jits untimed: the encoder jit cache makes
        # repeat configs free, so without a per-config warmup the "on"
        # side would pay its one-time compile inside the timed window
        # while "off" reuses the main row's cached programs
        encode_sequence(src_path, W, H, min(8, ab_n), cfg,
                        os.path.join(tmp, f"feat_{name}_warm.bin"),
                        batch=8, resume=False, closed_loop=True)
        t0 = time.time()
        r = encode_sequence(src_path, W, H, ab_n, cfg, p,
                            batch=8, resume=False, closed_loop=True)
        feats[name] = (time.time() - t0, int(r.bytes_written))
    feat_speed = feats["off"][0] / max(feats["on"][0], 1e-9)
    feat_bpp = feats["on"][1] / max(feats["off"][1], 1e-9)
    log(f"[sequence] features A/B ({ab_n} frames): off {feats['off'][0]:.1f}s"
        f"/{feats['off'][1]}B, on(deblock+sao+hevc-cabac) "
        f"{feats['on'][0]:.1f}s/{feats['on'][1]}B -> on runs at "
        f"{feat_speed:.2f}x of off's speed, {feat_bpp:.2f}x bytes")

    # A/B 2: entropy tiles (host entropy parallelism)
    ab = {}
    for tiles in (1, 4):
        t0 = time.time()
        encode_sequence(
            src_path, W, H, ab_n, config,
            os.path.join(tmp, f"ab{tiles}.bin"),
            batch=8, resume=False, closed_loop=True, entropy_tiles=tiles,
        )
        ab[tiles] = time.time() - t0
    ratio = ab[1] / max(ab[4], 1e-9)
    log(f"[sequence] entropy-tiles A/B ({ab_n} frames): tiles=1 {ab[1]:.1f}s,"
        f" tiles=4 {ab[4]:.1f}s -> speedup {ratio:.2f}x")

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
        "stage_seconds": stage_s,
        "features_on_speed_ratio": round(feat_speed, 2),
        "features_on_bytes_ratio": round(feat_bpp, 2),
        "entropy_tiles4_speedup": round(ratio, 2),
    }


def row_yuv(ctx):
    import jax
    import jax.numpy as jnp

    from nanohevc_tpu.kernels.slab_pipeline import slab_encode_plane
    from nanohevc_tpu.models.all_intra import encode_plane_full

    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.integers(0, 256, (H // 2, W // 2)).astype(np.int32))
    v = jnp.asarray(rng.integers(0, 256, (H // 2, W // 2)).astype(np.int32))

    def yuv_one(y, u, v):
        ry = slab_encode_plane(y, QP, 8)["recon"]
        ru = slab_encode_plane(u, QP, 4)["recon"]
        rv = slab_encode_plane(v, QP, 4)["recon"]
        return ry, ru, rv

    yuv_fn = jax.jit(jax.vmap(yuv_one))
    yuv_frames = (ctx.frames(16), jnp.stack([u] * 16), jnp.stack([v] * 16))
    val = time_batch(
        lambda t: yuv_fn(*t), yuv_frames,
        lambda out: int(out[0][0, 0, 0]),
        int(H * W * 1.5) * 16, 8.0, "yuv",
    )
    ry, ru, rv = yuv_fn(*yuv_frames)
    want_y = jax.jit(lambda p: encode_plane_full(p, jnp.int32(QP), n=8))(ctx.plane)
    want_u = jax.jit(lambda p: encode_plane_full(p, jnp.int32(QP), n=4))(u)
    ok = device_equal(ry[0], want_y["recon"]) and device_equal(
        ru[0], want_u["recon"]
    )
    return {
        "metric": "1080p 4:2:0 YUV frame (Y 8x8 + UV 4x4)",
        "value": round(val, 1), "unit": "Mpix/s", "bit_exact": ok,
    }


def row_4k(ctx):
    import jax
    import jax.numpy as jnp

    from nanohevc_tpu.kernels.slab_pipeline import slab_encode_plane

    host_4k = np.random.default_rng(0).integers(
        0, 256, (UHD_H, UHD_W)
    ).astype(np.int32)
    p4k = jnp.asarray(host_4k)
    frames4k = jnp.stack([p4k] * 8)
    fn = jax.jit(jax.vmap(lambda p: slab_encode_plane(p, QP, 8)))
    v = time_batch(fn, frames4k, sync_recon, UHD_H * UHD_W * 8, 8.0, "4k")
    pct = oracle_gate(p4k, host_4k, 8, UHD_H, UHD_W)
    log(f"[4k] oracle gate: {pct:.1f}% of 256 blocks")
    return {
        "metric": "4K (2160x3840) luma 8x8 dc_planar full pipeline",
        "value": round(v, 1), "unit": "Mpix/s", "bit_exact": pct == 100.0,
    }


def row_wf1(ctx):
    """Closed-loop single-frame crossover: fused kernel vs XLA scan.
    Auto-select assumes the kernel wins at b==1; measure both sides so
    a regression in that assumption is visible in the bench."""
    import jax
    import jax.numpy as jnp

    from nanohevc_tpu.models.wavefront import encode_plane_closed_loop

    wf1_k = jax.jit(lambda p: encode_plane_closed_loop(
        p, jnp.int32(QP), n=8, allow_fast=True))
    wf1_x = jax.jit(lambda p: encode_plane_closed_loop(
        p, jnp.int32(QP), n=8, allow_fast=False))
    v_k = time_batch(
        wf1_k, ctx.plane, lambda o: int(o["recon"][0, 0]), H * W, 4.0,
        "wf1_kernel",
    )
    v_x = time_batch(
        wf1_x, ctx.plane, lambda o: int(o["recon"][0, 0]), H * W, 4.0,
        "wf1_xla",
    )
    got, want = wf1_k(ctx.plane), wf1_x(ctx.plane)
    ok = device_equal(got["recon"], want["recon"]) and device_equal(
        got["levels"], want["levels"]
    )
    log(f"[wf1] kernel {v_k:.1f} vs XLA {v_x:.1f} Mpix/s at b=1 "
        f"(speedup {v_k / max(v_x, 1e-9):.2f}x; auto-select assumes >= 1)")
    return {
        "metric": "1080p closed-loop wavefront single-frame (fused kernel)",
        "value": round(v_k, 1), "unit": "Mpix/s", "bit_exact": ok,
        "xla_b1": round(v_x, 1),
        "kernel_b1_speedup": round(v_k / max(v_x, 1e-9), 2),
    }


def _gate_plane():
    rng = np.random.default_rng(3)
    return rng.integers(0, 256, (GATE_H, GATE_W)).astype(np.int32)


def make_row_slab_n(ng):
    def run(ctx):
        import jax
        import jax.numpy as jnp

        from nanohevc_tpu import ops as _ops
        from nanohevc_tpu.kernels.slab_pipeline import slab_encode_plane
        from nanohevc_tpu.models.all_intra import encode_plane_full

        plane_g = jnp.asarray(_gate_plane())
        frames_g = jnp.stack([plane_g] * 8)
        fn = jax.jit(jax.vmap(lambda p: slab_encode_plane(p, QP, ng)))
        v = time_batch(
            fn, frames_g, sync_recon, GATE_H * GATE_W * 8, 4.0, f"slab{ng}"
        )
        got = fn(frames_g)
        want = jax.jit(
            lambda p: encode_plane_full(p, jnp.int32(QP), n=ng)
        )(plane_g)
        lv_packed = jax.jit(
            lambda l: _ops.scan_pack(_ops.tile_plane(l, ng))
        )(got["levels_slab"][0])
        ok = device_equal(got["recon"][0], want["recon"]) and device_equal(
            lv_packed, want["levels"]
        )
        return {
            "metric": f"{GATE_H}x{GATE_W} luma {ng}x{ng} dc_planar "
                      "full pipeline",
            "value": round(v, 1), "unit": "Mpix/s", "bit_exact": ok,
        }

    return run


def make_row_mode_n(ng):
    def run(ctx):
        import jax
        import jax.numpy as jnp

        from nanohevc_tpu.kernels.mode_search_slab import (
            mode_search_encode_plane,
        )
        from nanohevc_tpu.models.all_intra import encode_plane_full

        plane_g = jnp.asarray(_gate_plane())
        frames_g = jnp.stack([plane_g] * 8)
        fn = jax.jit(jax.vmap(lambda p: mode_search_encode_plane(p, QP, ng)))
        v = time_batch(
            fn, frames_g, sync_recon, GATE_H * GATE_W * 8, 4.0, f"mode{ng}"
        )
        got = fn(frames_g)
        want = jax.jit(
            lambda p: encode_plane_full(
                p, jnp.int32(QP), n=ng, mode_set="all", decision="satd"
            )
        )(plane_g)
        ok = device_equal(got["recon"][0], want["recon"]) and device_equal(
            got["modes_slab"][0][::ng, ::ng].reshape(-1), want["modes"]
        )
        return {
            "metric": f"{GATE_H}x{GATE_W} luma 35-mode SATD search, "
                      f"{ng}x{ng}",
            "value": round(v, 1), "unit": "Mpix/s", "bit_exact": ok,
        }

    return run


# (label, est worst-case seconds on a degraded tunnel, fn) — priority order.
ROWS = [
    ("flagship", 150, row_flagship),
    ("mode8", 200, row_mode8),
    ("mode4", 200, row_mode4),
    ("closed_loop_35", 420, row_closed_loop_35),
    ("wavefront", 200, row_wavefront),
    ("sequence", 500, row_sequence),
    ("closed_loop_35_16", 420, row_closed_loop_35_16),
    ("yuv", 120, row_yuv),
    ("uhd_4k", 120, row_4k),
    ("wf1", 240, row_wf1),
    ("slab16", 150, make_row_slab_n(16)),
    ("mode16", 250, make_row_mode_n(16)),
    ("slab32", 150, make_row_slab_n(32)),
    ("mode32", 250, make_row_mode_n(32)),
]


def run_bench() -> None:
    import jax

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    log(f"backend: {jax.devices()}")

    st = load_state()
    st["order"] = [label for label, _, _ in ROWS]
    deadline = st.get("t0", time.time()) + BUDGET_S
    ctx = Ctx()

    for label, est, fn in ROWS:
        if label in st["rows"]:
            log(f"[{label}] reusing completed result from state")
            continue
        started = st["started"].get(label, 0)
        if started >= 2:
            log(f"[{label}] started {started}x without completing "
                "(tunnel wedge?) -> skipped")
            st["rows"][label] = {
                "label": label, "metric": label, "value": 0.0,
                "unit": "Mpix/s", "skipped": True, "reason": "wedged",
            }
            save_state(st)
            emit(st)
            continue
        remaining = deadline - time.time()
        if remaining < est * TARGET_SCALE + EMIT_RESERVE_S:
            log(f"[{label}] skipped: {remaining:.0f}s left < est {est}s")
            st["rows"][label] = {
                "label": label, "metric": label, "value": 0.0,
                "unit": "Mpix/s", "skipped": True, "reason": "budget",
            }
            save_state(st)
            continue
        st["started"][label] = started + 1
        save_state(st)
        t0 = time.time()
        row = fn(ctx)
        row["label"] = label
        row["seconds"] = round(time.time() - t0, 1)
        log(f"[{label}] done in {row['seconds']}s, "
            f"bit_exact={row.get('bit_exact')}")
        st["rows"][label] = row
        save_state(st)
        emit(st)

    emit(st)
    rows = [st["rows"][k] for k in st["order"] if k in st["rows"]]
    if not all(r.get("bit_exact", True) for r in rows if not r.get("skipped")):
        sys.exit(3)  # distinct from a crash (1): gate failure, no retry


def main() -> None:
    if os.environ.get("NANOHEVC_BENCH_INNER") == "1":
        run_bench()
        return
    # Fresh run: clear any stale state from a previous invocation so
    # rows re-measure (state is for intra-run retries only).
    st = load_state()
    if time.time() - st.get("t0", 0) > BUDGET_S + 600:
        try:
            os.unlink(STATE_PATH)
        except OSError:
            pass
        st = load_state()
        st["order"] = [label for label, _, _ in ROWS]
        save_state(st)
    env = dict(os.environ, NANOHEVC_BENCH_INNER="1")
    deadline = st["t0"] + BUDGET_S
    # Inner inherits stdout (line-flushed cumulative JSON emissions) so
    # the driver's last-line parse survives any kill point.
    attempt = 0
    while True:
        attempt += 1
        remaining = deadline - time.time() + EMIT_RESERVE_S
        if remaining < 30:
            break
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                timeout=remaining + 60,
            )
            if proc.returncode == 0:
                return
            log(f"attempt {attempt} failed (rc={proc.returncode})")
            if proc.returncode == 3:
                sys.exit(1)  # gate failure: loud, no retry
            # any other rc (crash, wedge-kill): retry; the state file
            # resumes completed rows and the started-counter skips a
            # row that keeps crashing
        except subprocess.TimeoutExpired:
            log(f"attempt {attempt} timed out (axon tunnel wedge?)")
        time.sleep(5)
    # Budget exhausted without a clean inner exit: emit whatever the
    # state file holds as the final line.
    st = load_state()
    if st["rows"]:
        st.setdefault("order", [label for label, _, _ in ROWS])
        print(cumulative_json(st), flush=True)
        return
    print(json.dumps({"metric": "BENCH FAILED (tunnel wedge)", "value": 0.0,
                      "unit": "Mpix/s", "vs_baseline": 0.0}))
    sys.exit(1)


if __name__ == "__main__":
    main()
