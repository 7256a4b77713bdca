"""Host data-model API tests: PackedFrame, BlockView semantics, utils."""

import numpy as np
import pytest

from nanohevc_tpu import (
    BlockView,
    Frame,
    FrameBufferPool,
    PackedFrame,
    Plane,
    iterate_blocks,
)


class TestPackedFrame:
    def test_views_share_one_buffer(self):
        pf = PackedFrame(16, 16)
        pf.y[0, 0] = 7
        pf.u[0, 0] = 8
        pf.v[0, 0] = 9
        assert pf._store[0] == 7
        assert pf._store[16 * 16] == 8
        assert pf._store[16 * 16 + 8 * 8] == 9

    def test_yuv_roundtrip_and_from_frame(self):
        rng = np.random.default_rng(0)
        buf = rng.integers(0, 256, 16 * 16 * 3 // 2, dtype=np.uint8).tobytes()
        pf = PackedFrame.from_yuv420p(buf, 16, 16)
        assert pf.to_yuv420p() == buf
        f = pf.to_frame()
        assert np.array_equal(f.y.data, pf.y)
        pf2 = PackedFrame.from_frame(f)
        assert np.array_equal(pf2.y, pf.y)

    def test_clear(self):
        pf = PackedFrame(8, 8)
        pf.y[:] = 3
        pf.clear()
        assert not pf._store.any()

    def test_pool_with_plain_frames(self):
        pool = FrameBufferPool(8, 8, pool_size=2, use_packed=False)
        i, f = pool.acquire()
        assert isinstance(f, Frame)
        f.y.data[:] = 5
        pool.release(i)
        j, f2 = pool.acquire(clear=True)
        assert not f2.y.data.any()          # cleared on reuse


class TestBlockView:
    def setup_method(self):
        self.plane = Plane(np.arange(256, dtype=np.int16).reshape(16, 16))

    def test_extended_neighbor_count(self):
        blk = BlockView(self.plane, x=4, y=4, size=4)
        top = blk.get_top_neighbors(count=8)
        assert np.array_equal(top, self.plane.data[3, 4:12])
        left = blk.get_left_neighbors(count=8)
        assert np.array_equal(left, self.plane.data[4:12, 3])

    def test_corner_and_edges(self):
        assert BlockView(self.plane, 0, 4, 4).get_top_left_neighbor() == 128
        assert BlockView(self.plane, 4, 0, 4).get_top_left_neighbor() == 128
        inner = BlockView(self.plane, 4, 4, 4)
        assert inner.get_top_left_neighbor() == int(self.plane.data[3, 3])

    def test_write_pixels(self):
        blk = BlockView(self.plane, 8, 8, 4)
        blk.write_pixels(np.full((4, 4), -1, np.int16))
        assert (self.plane.data[8:12, 8:12] == -1).all()

    def test_iterate_skips_partial(self):
        plane = Plane(np.zeros((18, 21), np.int16))
        blocks = list(iterate_blocks(plane, 8))
        assert len(blocks) == 2 * 2
        assert all(b.size == 8 for b in blocks)


class TestSanitizer:
    def test_clean_pipeline_passes(self):
        import jax.numpy as jnp

        from nanohevc_tpu.models.all_intra import encode_plane_full
        from nanohevc_tpu.ops import scan_unpack
        from nanohevc_tpu.utils.checks import sample_parity_check

        rng = np.random.default_rng(1)
        plane = rng.integers(0, 256, (32, 64)).astype(np.int32)
        out = encode_plane_full(jnp.asarray(plane), jnp.int32(22), n=8)
        levels_raster = np.asarray(scan_unpack(out["levels"]))
        bad = sample_parity_check(
            plane, levels_raster, np.asarray(out["recon"]), 8, 22
        )
        assert bad == 0

    def test_detects_corruption(self):
        import jax.numpy as jnp

        from nanohevc_tpu.models.all_intra import encode_plane_full
        from nanohevc_tpu.ops import scan_unpack
        from nanohevc_tpu.utils.checks import sample_parity_check

        rng = np.random.default_rng(2)
        plane = rng.integers(0, 256, (32, 64)).astype(np.int32)
        out = encode_plane_full(jnp.asarray(plane), jnp.int32(22), n=8)
        levels_raster = np.asarray(scan_unpack(out["levels"]))
        recon = np.asarray(out["recon"]).copy()
        recon[:8, :8] += 1   # inject a silent bit drift
        bad = sample_parity_check(plane, levels_raster, recon, 8, 22, samples=32)
        assert bad >= 1


class TestAngularSubsetAPI:
    def test_angular_predict_modes_subset(self):
        import jax.numpy as jnp

        from nanohevc_tpu import ops

        rng = np.random.default_rng(3)
        plane = jnp.asarray(rng.integers(0, 256, (16, 24)).astype(np.int32))
        refs = ops.extract_refs(plane, 8)
        all_preds = np.asarray(ops.angular_predict_all(refs, 8))
        subset = np.asarray(ops.angular_predict_modes(refs, 8, (10, 26)))
        assert np.array_equal(subset[:, 0], all_preds[:, 10 - 2])
        assert np.array_equal(subset[:, 1], all_preds[:, 26 - 2])
