"""Fused Pallas kernel vs jnp ops path: bit-exactness (interpret mode).

On CPU the kernel runs through the Pallas interpreter; on TPU the same
code compiles via Mosaic.  Both must match the XLA ops path (which is
itself oracle-verified in test_parity.py) bit-for-bit.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from nanohevc_tpu import ops
from nanohevc_tpu.kernels import fused_encode_blocks
from nanohevc_tpu.models.all_intra import decide_modes


def reference_path(plane, n, qp):
    blocks = ops.tile_plane(plane, n)
    refs = ops.extract_refs(plane, n)
    pred, _ = decide_modes(blocks, refs, n, "dc_planar", "energy")
    res = blocks - pred
    coeff = ops.forward_transform(res, False)
    levels = ops.quantize(coeff, qp, n, True)
    deq = ops.dequantize(levels, qp, n)
    rec = ops.inverse_transform(deq, False)
    recon = jnp.clip(pred + rec, 0, 255)
    return blocks, refs, recon, levels


class TestFusedKernel:
    @pytest.mark.parametrize("n", [4, 8, 16, 32])
    def test_bit_exact_vs_ops_path(self, n):
        rng = np.random.default_rng(0)
        plane = jnp.asarray(rng.integers(0, 256, (4 * n, 8 * n)).astype(np.int32))
        blocks, refs, want_recon, want_levels = reference_path(plane, n, 22)
        recon, levels = fused_encode_blocks(
            blocks, refs, 22, chunk=8, interpret=True
        )
        assert np.array_equal(np.asarray(levels), np.asarray(want_levels))
        assert np.array_equal(np.asarray(recon), np.asarray(want_recon))

    @pytest.mark.parametrize("qp", [0, 17, 37, 51])
    def test_qp_sweep(self, qp):
        n = 8
        rng = np.random.default_rng(qp)
        plane = jnp.asarray(rng.integers(0, 256, (32, 64)).astype(np.int32))
        blocks, refs, want_recon, want_levels = reference_path(plane, n, qp)
        recon, levels = fused_encode_blocks(blocks, refs, qp, chunk=8, interpret=True)
        assert np.array_equal(np.asarray(levels), np.asarray(want_levels))
        assert np.array_equal(np.asarray(recon), np.asarray(want_recon))

    def test_padding_path(self):
        """nb not divisible by chunk exercises the pad/trim logic."""
        n = 8
        rng = np.random.default_rng(3)
        plane = jnp.asarray(rng.integers(0, 256, (24, 40)).astype(np.int32))  # 15 blocks
        blocks, refs, want_recon, want_levels = reference_path(plane, n, 30)
        recon, levels = fused_encode_blocks(blocks, refs, 30, chunk=8, interpret=True)
        assert recon.shape == blocks.shape
        assert np.array_equal(np.asarray(levels), np.asarray(want_levels))
        assert np.array_equal(np.asarray(recon), np.asarray(want_recon))

    def test_fused_encode_planes_batch(self):
        """Frame batch folds into the block axis; matches per-frame."""
        from nanohevc_tpu.kernels import fused_encode_planes

        n = 8
        rng = np.random.default_rng(7)
        planes = jnp.asarray(rng.integers(0, 256, (3, 32, 64)).astype(np.int32))
        out = fused_encode_planes(planes, 22, n, interpret=True)
        assert out["recon"].shape == (3, 32, 64)
        assert out["levels"].shape == (3, 32, 64)  # (F, nb, N*N)
        for f in range(3):
            _, _, want_recon, want_levels = reference_path(planes[f], n, 22)
            assert np.array_equal(
                np.asarray(out["recon"][f]),
                np.asarray(ops.untile_plane(want_recon, 32, 64)),
            )
            assert np.array_equal(
                np.asarray(out["levels"][f]).reshape(-1, n, n),
                np.asarray(want_levels),
            )


class TestSlabKernel:
    @pytest.mark.parametrize("n", [8, 16, 32])
    @pytest.mark.parametrize("qp", [10, 30])
    def test_bit_exact_vs_ops_path(self, n, qp):
        from nanohevc_tpu.kernels.slab_pipeline import (
            levels_plane_to_blocks,
            slab_encode_plane,
        )

        rng = np.random.default_rng(n * 100 + qp)
        h, w = 4 * n + (n // 2), 6 * n   # partial trailing rows
        plane = jnp.asarray(rng.integers(0, 256, (h, w)).astype(np.int32))
        out = slab_encode_plane(plane, qp, n, interpret=True)

        _, _, want_recon, want_levels = reference_path(plane, n, qp)
        got_recon_blocks = ops.tile_plane(out["recon"], n)
        assert np.array_equal(np.asarray(got_recon_blocks), np.asarray(want_recon))
        # trailing partial rows pass through unchanged
        assert np.array_equal(
            np.asarray(out["recon"][4 * n :, :]), np.asarray(plane[4 * n :, :])
        )
        got_levels = levels_plane_to_blocks(out["levels_slab"], n)
        assert np.array_equal(np.asarray(got_levels), np.asarray(want_levels))

    def test_width_constraint(self):
        from nanohevc_tpu.kernels.slab_pipeline import slab_encode_plane

        with pytest.raises(ValueError):
            slab_encode_plane(jnp.zeros((16, 17), jnp.int32), 22, 8)

    @pytest.mark.parametrize("shape", [(16, 16), (20, 24), (12, 16)])
    def test_n4_two_blockrows_per_slab(self, shape):
        """N == 4 packs two block-rows per slab; matches the ops path."""
        from nanohevc_tpu.kernels.slab_pipeline import (
            levels_plane_to_blocks,
            slab_encode_plane,
        )

        n = 4
        rng = np.random.default_rng(hash(shape) % 2**31)
        plane = jnp.asarray(rng.integers(0, 256, shape).astype(np.int32))
        out = slab_encode_plane(plane, 26, n, interpret=True)
        _, _, want_recon, want_levels = reference_path(plane, n, 26)
        assert np.array_equal(
            np.asarray(ops.tile_plane(out["recon"], n)), np.asarray(want_recon)
        )
        assert np.array_equal(
            np.asarray(levels_plane_to_blocks(out["levels_slab"], n)),
            np.asarray(want_levels),
        )


class TestFastPath:
    def test_encode_plane_fast_matches_full(self):
        from nanohevc_tpu.models.all_intra import encode_plane_fast, encode_plane_full

        rng = np.random.default_rng(21)
        plane = jnp.asarray(rng.integers(0, 256, (44, 64)).astype(np.int32))
        fast = encode_plane_fast(plane, 22, n=8)
        full = encode_plane_full(plane, jnp.int32(22), n=8)
        assert np.array_equal(np.asarray(fast["recon"]), np.asarray(full["recon"]))
        assert np.array_equal(np.asarray(fast["levels"]), np.asarray(full["levels"]))
        assert np.array_equal(np.asarray(fast["modes"]), np.asarray(full["modes"]))
        assert np.array_equal(np.asarray(fast["nnz"]), np.asarray(full["nnz"]))

    def test_supports_fast_path_rules(self):
        from nanohevc_tpu.config import EncoderConfig
        from nanohevc_tpu.models.all_intra import supports_fast_path

        ok = EncoderConfig(block_size=8, qp=22)
        assert supports_fast_path(ok, 8, 64)
        assert supports_fast_path(ok, 4, 64)               # 4x4 luma (DST-VII)
        assert supports_fast_path(ok, 4, 64, is_luma=False)  # 4x4 chroma ok
        assert not supports_fast_path(ok, 8, 60)           # W % N != 0
        assert supports_fast_path(
            EncoderConfig(block_size=8, qp=22, bit_depth=10), 8, 64
        )                                                   # 10-bit rides it
        assert not supports_fast_path(
            EncoderConfig(block_size=8, qp=22, mode_set="all", decision="satd"),
            8, 64,
        )

    def test_batch_encoder_uses_fast_path(self):
        """Unsharded batch encoder output is unchanged by the fast path."""
        from nanohevc_tpu.config import EncoderConfig
        from nanohevc_tpu.parallel import make_batch_encoder
        from nanohevc_tpu.models.all_intra import encode_plane_full

        rng = np.random.default_rng(22)
        frames = jnp.asarray(rng.integers(0, 256, (2, 32, 64)).astype(np.int32))
        fn = make_batch_encoder(EncoderConfig(block_size=8, qp=30))
        out = fn(frames, jnp.int32(30))
        for f in range(2):
            want = encode_plane_full(frames[f], jnp.int32(30), n=8)
            assert np.array_equal(np.asarray(out["recon"][f]), np.asarray(want["recon"]))
            assert np.array_equal(np.asarray(out["levels"][f]), np.asarray(want["levels"]))


class TestSlabKernelVariants:
    def test_dst_4x4_luma_matches_full(self):
        """DST-VII weight set on the slab kernel (4x4 luma intra rule)."""
        from nanohevc_tpu.models.all_intra import encode_plane_fast, encode_plane_full

        rng = np.random.default_rng(31)
        plane = jnp.asarray(rng.integers(0, 256, (24, 32)).astype(np.int32))
        fast = encode_plane_fast(plane, 24, n=4, use_dst=True)
        full = encode_plane_full(plane, jnp.int32(24), n=4, use_dst=True)
        for k in ("recon", "levels", "modes", "nnz"):
            assert np.array_equal(np.asarray(fast[k]), np.asarray(full[k])), k

    def test_dst_requires_4x4(self):
        from nanohevc_tpu.kernels.slab_pipeline import slab_encode_plane

        with pytest.raises(ValueError):
            slab_encode_plane(jnp.zeros((16, 16), jnp.int32), 22, 8, use_dst=True)

    @pytest.mark.parametrize("n", [4, 8])
    def test_10bit_matches_full(self, n):
        """Boundary fill / clip max ride the SMEM scalars at 10-bit."""
        from nanohevc_tpu.models.all_intra import encode_plane_fast, encode_plane_full

        rng = np.random.default_rng(41 + n)
        plane = jnp.asarray(rng.integers(0, 1024, (4 * n, 6 * n)).astype(np.int32))
        fast = encode_plane_fast(plane, 30, n=n, bit_depth=10, use_dst=(n == 4))
        full = encode_plane_full(
            plane, jnp.int32(30), n=n, bit_depth=10, use_dst=(n == 4)
        )
        for k in ("recon", "levels", "modes", "nnz"):
            assert np.array_equal(np.asarray(fast[k]), np.asarray(full[k])), k

    def test_dequant_rescale_matches_full(self):
        """Spec-correct dequant gain on the slab kernel == XLA path."""
        from nanohevc_tpu.models.all_intra import encode_plane_fast, encode_plane_full

        rng = np.random.default_rng(51)
        plane = jnp.asarray(rng.integers(0, 256, (32, 64)).astype(np.int32))
        fast = encode_plane_fast(plane, 28, n=8, dequant_rescale=True)
        full = encode_plane_full(
            plane, jnp.int32(28), n=8, dequant_rescale=True
        )
        for k in ("recon", "levels"):
            assert np.array_equal(np.asarray(fast[k]), np.asarray(full[k])), k
        # and it actually changes the recon vs parity mode at N > 4
        parity = encode_plane_fast(plane, 28, n=8)
        assert not np.array_equal(
            np.asarray(fast["recon"]), np.asarray(parity["recon"])
        )


@pytest.mark.slow
class TestModeSearchKernel:
    # interpret-mode traces of the 33-mode unrolled kernel are expensive
    # on this 1-core box: shapes are shared across tests so the Pallas
    # build caches, and n=16 runs a single QP.
    # slow: 30-200 s per test, all XLA-CPU compile of the unrolled
    # sweep; the fast profile keeps the slab-kernel parity
    # (TestSlabKernel) and the driver bench gates the mode-search
    # kernels against the XLA path on the real chip (rows mode4/8/16/32).
    @pytest.mark.parametrize("n,qp", [(8, 12), (8, 30), (16, 30), (32, 30)])
    def test_matches_xla_mode_search(self, n, qp):
        """Fused 35-mode SATD kernel == decide_modes('all', 'satd') path."""
        from nanohevc_tpu.kernels.mode_search_slab import mode_search_encode_plane
        from nanohevc_tpu.kernels.slab_pipeline import levels_plane_to_blocks
        from nanohevc_tpu.models.all_intra import encode_plane_full

        rng = np.random.default_rng(n + qp)
        plane = jnp.asarray(rng.integers(0, 256, (3 * n, 5 * n)).astype(np.int32))
        out = mode_search_encode_plane(plane, qp, n, interpret=True)
        ref = encode_plane_full(
            plane, jnp.int32(qp), n=n, mode_set="all", decision="satd"
        )
        got_modes = np.asarray(out["modes_slab"])[::n, ::n].reshape(-1)
        assert np.array_equal(got_modes, np.asarray(ref["modes"]))
        assert np.array_equal(
            np.asarray(out["recon"]), np.asarray(ref["recon"])
        )
        got_lv = np.asarray(levels_plane_to_blocks(out["levels_slab"], n))
        assert np.array_equal(got_lv, np.asarray(ops.scan_unpack(ref["levels"])))

    def test_gradient_content_picks_angular(self):
        """Directional content must select angular modes (sanity)."""
        from nanohevc_tpu.kernels.mode_search_slab import mode_search_encode_plane

        n = 8
        base = np.add.outer(np.zeros(24, int), np.arange(40) * 5) % 256
        plane = jnp.asarray(base.astype(np.int32))   # (24, 40): shares the
        out = mode_search_encode_plane(plane, 20, n, interpret=True)  # cached build
        modes = np.asarray(out["modes_slab"])[::n, ::n].reshape(-1)
        assert (modes >= 2).any()

    def test_partial_rows_and_bottom_clamp(self):
        from nanohevc_tpu.kernels.mode_search_slab import mode_search_encode_plane
        from nanohevc_tpu.models.all_intra import encode_plane_full

        n = 8
        rng = np.random.default_rng(77)
        plane = jnp.asarray(rng.integers(0, 256, (2 * n + 3, 3 * n)).astype(np.int32))
        out = mode_search_encode_plane(plane, 24, n, interpret=True)
        ref = encode_plane_full(
            plane, jnp.int32(24), n=n, mode_set="all", decision="satd"
        )
        assert np.array_equal(np.asarray(out["recon"]), np.asarray(ref["recon"]))

    def test_n4_matches_xla_mode_search(self):
        """N == 4 (two block-rows per slab) with the DST-VII transform."""
        from nanohevc_tpu.kernels.mode_search_slab import mode_search_encode_plane
        from nanohevc_tpu.kernels.slab_pipeline import levels_plane_to_blocks
        from nanohevc_tpu.models.all_intra import encode_plane_full

        n = 4
        rng = np.random.default_rng(4)
        plane = jnp.asarray(rng.integers(0, 256, (20, 24)).astype(np.int32))
        out = mode_search_encode_plane(plane, 26, n, interpret=True, use_dst=True)
        ref = encode_plane_full(
            plane, jnp.int32(26), n=n, mode_set="all", decision="satd",
            use_dst=True,
        )
        got_modes = np.asarray(out["modes_slab"])[::n, ::n].reshape(-1)
        assert np.array_equal(got_modes, np.asarray(ref["modes"]))
        assert np.array_equal(np.asarray(out["recon"]), np.asarray(ref["recon"]))
        got_lv = np.asarray(levels_plane_to_blocks(out["levels_slab"], n))
        assert np.array_equal(got_lv, np.asarray(ops.scan_unpack(ref["levels"])))

    def test_partial_height_reads_true_trailing_rows(self):
        """Left refs below the last block-row must read the REAL trailing
        source rows (extract_refs clamps to the plane's last row, not the
        last block row) — the replicated-pad slab makes this exact."""
        from nanohevc_tpu.kernels.mode_search_slab import mode_search_encode_plane
        from nanohevc_tpu.models.all_intra import encode_plane_full

        n = 8
        rng = np.random.default_rng(78)
        base = rng.integers(0, 256, (2 * n + 5, 3 * n)).astype(np.int32)
        # make the trailing rows extreme so a wrong clamp changes modes
        base[2 * n :, :] = 255
        base[: 2 * n :, : n] = 0
        plane = jnp.asarray(base)
        out = mode_search_encode_plane(plane, 24, n, interpret=True)
        ref = encode_plane_full(
            plane, jnp.int32(24), n=n, mode_set="all", decision="satd"
        )
        got_modes = np.asarray(out["modes_slab"])[::n, ::n].reshape(-1)
        assert np.array_equal(got_modes, np.asarray(ref["modes"]))
        assert np.array_equal(np.asarray(out["recon"]), np.asarray(ref["recon"]))

    def test_10bit_matches_xla_mode_search(self):
        from nanohevc_tpu.kernels.mode_search_slab import mode_search_encode_plane
        from nanohevc_tpu.models.all_intra import encode_plane_full

        n = 8
        rng = np.random.default_rng(10)
        plane = jnp.asarray(rng.integers(0, 1024, (2 * n, 3 * n)).astype(np.int32))
        out = mode_search_encode_plane(plane, 30, n, interpret=True, bit_depth=10)
        ref = encode_plane_full(
            plane, jnp.int32(30), n=n, mode_set="all", decision="satd",
            bit_depth=10,
        )
        got_modes = np.asarray(out["modes_slab"])[::n, ::n].reshape(-1)
        assert np.array_equal(got_modes, np.asarray(ref["modes"]))
        assert np.array_equal(np.asarray(out["recon"]), np.asarray(ref["recon"]))

    @pytest.mark.parametrize(
        "n,g,h,w,dst,qp,bd",
        [
            (4, 8, 64, 128, True, 22, 8),    # flagship 4x4 DST config
            (4, 2, 40, 64, False, 30, 8),    # minimal sublane tile
            (4, 8, 61, 128, True, 24, 8),    # non-aligned height
            (8, 2, 62, 128, False, 35, 10),  # n=8 pairing + 10-bit
        ],
    )
    def test_grouped_matches_slab_kernel(self, n, g, h, w, dst, qp, bd):
        """Grouped-interleaved kernel == the per-block-row slab kernel."""
        from nanohevc_tpu.kernels.mode_search_grouped import (
            mode_search_encode_plane_grouped,
        )
        from nanohevc_tpu.kernels.mode_search_slab import (
            mode_search_encode_plane,
        )

        rng = np.random.default_rng(n * g + h)
        plane = jnp.asarray(
            rng.integers(0, 1 << bd, (h, w)).astype(np.int32)
        )
        a = mode_search_encode_plane(
            plane, qp, n, interpret=True, use_dst=dst, bit_depth=bd
        )
        b = mode_search_encode_plane_grouped(
            plane, qp, n, g=g, interpret=True, use_dst=dst, bit_depth=bd
        )
        for k in ("recon", "levels_slab", "modes_slab"):
            assert np.array_equal(np.asarray(a[k]), np.asarray(b[k])), k

    @pytest.mark.parametrize("n", [4, 8])
    def test_lane_pad_matches_unpadded(self, n):
        """Forcing the 128-lane pad (the on-TPU Mosaic layout rule) must
        not change any output: pad columns replicate the last column,
        which is exactly extract_refs' right clamp, and open-loop refs
        are source-fed so pad blocks never feed real ones."""
        from nanohevc_tpu.kernels.mode_search_grouped import (
            mode_search_encode_plane_grouped,
        )
        from nanohevc_tpu.kernels.mode_search_slab import (
            mode_search_encode_plane,
        )

        rng = np.random.default_rng(128 + n)
        plane = jnp.asarray(rng.integers(0, 256, (2 * n, 40)).astype(np.int32))
        a = mode_search_encode_plane(plane, 28, n, interpret=True)
        b = mode_search_encode_plane(
            plane, 28, n, interpret=True, _pad_lanes=True
        )
        for k in ("recon", "levels_slab", "modes_slab"):
            assert np.array_equal(np.asarray(a[k]), np.asarray(b[k])), k
        if n == 4:
            c = mode_search_encode_plane_grouped(
                plane, 28, n, g=2, interpret=True, _pad_lanes=True
            )
            for k in ("recon", "levels_slab", "modes_slab"):
                assert np.array_equal(np.asarray(a[k]), np.asarray(c[k])), k

    @pytest.mark.parametrize("n", [4, 8])
    def test_auto_dispatch_matches_slab(self, n):
        """mode_search_encode_plane_auto output == the slab kernel for
        every N it routes (N=4 rides the grouped kernel)."""
        from nanohevc_tpu.kernels.mode_search_grouped import (
            mode_search_encode_plane_auto,
        )
        from nanohevc_tpu.kernels.mode_search_slab import (
            mode_search_encode_plane,
        )

        rng = np.random.default_rng(n)
        plane = jnp.asarray(rng.integers(0, 256, (4 * n, 6 * n)).astype(np.int32))
        a = mode_search_encode_plane_auto(plane, 26, n, interpret=True)
        b = mode_search_encode_plane(plane, 26, n, interpret=True)
        for k in ("recon", "levels_slab", "modes_slab"):
            assert np.array_equal(np.asarray(a[k]), np.asarray(b[k])), k

    def test_fast_modes_wrapper_matches_full(self):
        from nanohevc_tpu.models.all_intra import (
            encode_plane_fast_modes,
            encode_plane_full,
        )

        rng = np.random.default_rng(88)
        plane = jnp.asarray(rng.integers(0, 256, (32, 64)).astype(np.int32))
        fast = encode_plane_fast_modes(plane, 26, n=8)
        full = encode_plane_full(
            plane, jnp.int32(26), n=8, mode_set="all", decision="satd"
        )
        for k in ("recon", "levels", "modes", "nnz"):
            assert np.array_equal(np.asarray(fast[k]), np.asarray(full[k])), k

    def test_batch_encoder_routes_mode_search(self):
        from nanohevc_tpu.config import EncoderConfig
        from nanohevc_tpu.models.all_intra import encode_plane_full
        from nanohevc_tpu.parallel import make_batch_encoder

        rng = np.random.default_rng(89)
        frames = jnp.asarray(rng.integers(0, 256, (2, 32, 64)).astype(np.int32))
        cfg = EncoderConfig(block_size=8, qp=30, mode_set="all", decision="satd")
        out = make_batch_encoder(cfg)(frames, jnp.int32(30))
        for f in range(2):
            want = encode_plane_full(
                frames[f], jnp.int32(30), n=8, mode_set="all", decision="satd"
            )
            assert np.array_equal(np.asarray(out["recon"][f]), np.asarray(want["recon"]))
            assert np.array_equal(np.asarray(out["modes"][f]), np.asarray(want["modes"]))
