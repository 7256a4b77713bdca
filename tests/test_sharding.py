"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from nanohevc_tpu.config import EncoderConfig
from nanohevc_tpu.models.all_intra import encode_plane_full
from nanohevc_tpu.parallel import encode_batch_sharded, make_batch_encoder, make_mesh


needs_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


class TestMesh:
    @needs_8
    def test_2d_mesh_shapes(self):
        mesh = make_mesh(space=2)
        assert mesh.devices.shape == (4, 2)
        assert mesh.axis_names == ("frame", "space")

    @needs_8
    def test_invalid_space_raises(self):
        with pytest.raises(ValueError):
            make_mesh(space=3)


class TestShardedEncode:
    @needs_8
    @pytest.mark.parametrize("space", [1, 2])
    def test_sharded_matches_single_device(self, space):
        """Sharded multi-frame encode is bit-identical to per-frame encode."""
        mesh = make_mesh(space=space)
        f_axis = 8 // space
        rng = np.random.default_rng(0)
        frames = rng.integers(0, 256, (f_axis, 32 * space, 64)).astype(np.int32)
        config = EncoderConfig(block_size=8, qp=22)

        out = encode_batch_sharded(frames, 22, config, mesh)
        recon = np.asarray(out["recon"])
        levels = np.asarray(out["levels"])

        for f in range(frames.shape[0]):
            single = encode_plane_full(
                jnp.asarray(frames[f]), jnp.int32(22), n=8
            )
            assert np.array_equal(recon[f], np.asarray(single["recon"])), f
            assert np.array_equal(levels[f], np.asarray(single["levels"])), f

    @needs_8
    def test_mean_psnr_reduction(self):
        mesh = make_mesh(space=1)
        rng = np.random.default_rng(1)
        frames = rng.integers(0, 256, (8, 32, 32)).astype(np.int32)
        out = encode_batch_sharded(frames, 30, EncoderConfig(block_size=4, qp=30), mesh)
        per_frame = np.asarray(out["psnr"])
        assert np.isfinite(per_frame).all()
        assert abs(float(out["mean_psnr"]) - per_frame.mean()) < 1e-3

    @needs_8
    def test_sharded_closed_loop_matches_single_device(self):
        """Frame-sharded wavefront encode == per-frame closed loop."""
        from nanohevc_tpu.models.wavefront import encode_plane_closed_loop
        from nanohevc_tpu.parallel import make_closed_loop_encoder

        mesh = make_mesh(space=1)
        rng = np.random.default_rng(3)
        frames = rng.integers(0, 256, (8, 32, 48)).astype(np.int32)
        config = EncoderConfig(block_size=8, qp=24)
        fn = make_closed_loop_encoder(config, mesh)
        sharding = NamedSharding(mesh, P("frame", None, None))
        planes = jax.device_put(jnp.asarray(frames), sharding)
        out = fn(planes, jnp.int32(24))
        for f in range(8):
            single = encode_plane_closed_loop(
                jnp.asarray(frames[f]), jnp.int32(24), n=8
            )
            for k in ("recon", "levels", "modes"):
                assert np.array_equal(
                    np.asarray(out[k][f]), np.asarray(single[k])
                ), (k, f)

    @needs_8
    def test_sharded_smoothing_matches_single_device(self):
        """Regression: the sharded XLA step once dropped the
        intra_smoothing flag."""
        mesh = make_mesh(space=1)
        rng = np.random.default_rng(7)
        frames = rng.integers(0, 256, (8, 32, 64)).astype(np.int32)
        config = EncoderConfig(
            block_size=8, qp=22, mode_set="all", decision="satd",
            intra_smoothing=True,
        )
        fn = make_batch_encoder(config, mesh)
        sharding = NamedSharding(mesh, P("frame", "space", None))
        planes = jax.device_put(jnp.asarray(frames), sharding)
        out = fn(planes, jnp.int32(22))
        single = encode_plane_full(
            jnp.asarray(frames[0]), jnp.int32(22), n=8, mode_set="all",
            decision="satd", intra_smoothing=True,
        )
        assert np.array_equal(
            np.asarray(out["recon"][0]), np.asarray(single["recon"])
        )
        assert np.array_equal(
            np.asarray(out["modes"][0]), np.asarray(single["modes"])
        )

    def test_unsharded_encoder_works(self):
        fn = make_batch_encoder(EncoderConfig(block_size=8, qp=22))
        rng = np.random.default_rng(2)
        frames = jnp.asarray(rng.integers(0, 256, (2, 32, 64)).astype(np.int32))
        out = fn(frames, jnp.int32(22))
        assert out["recon"].shape == (2, 32, 64)
        assert out["levels"].shape == (2, 32, 64)


@pytest.mark.slow
# slow: ~90 s each, the full sharded pipeline double-compile; the
# driver runs dryrun_multichip itself on every round (MULTICHIP_r*).
class TestGraftEntry:
    def test_dryrun_multichip(self):
        import sys

        sys.path.insert(0, "/root/repo")
        from __graft_entry__ import dryrun_multichip

        dryrun_multichip(len(jax.devices()))

    def test_dryrun_multichip_driver_pattern(self):
        """Simulate the driver: a process whose backend has ONE device
        (no conftest env forcing) calls dryrun_multichip(8).  The entry
        must bootstrap a virtual 8-device mesh itself (round-1 red:
        MULTICHIP_r01.json rc=1)."""
        import os
        import subprocess
        import sys

        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)  # no TPU relay from tests
        env["JAX_PLATFORMS"] = "cpu"
        # Strip the conftest's virtual-device forcing: the driver's
        # process sees exactly one device.
        env["XLA_FLAGS"] = " ".join(
            t
            for t in env.get("XLA_FLAGS", "").split()
            if "xla_force_host_platform_device_count" not in t
        )
        code = (
            "import sys; sys.path.insert(0, '/root/repo'); "
            "import jax; assert len(jax.devices()) == 1, jax.devices(); "
            "from __graft_entry__ import dryrun_multichip; "
            "dryrun_multichip(8); print('DRYRUN_OK')"
        )
        proc = subprocess.run(
            [sys.executable, "-c", code],
            env=env,
            capture_output=True,
            text=True,
            timeout=1200,
        )
        assert proc.returncode == 0, proc.stderr[-4000:]
        assert "DRYRUN_OK" in proc.stdout

    def test_entry_compiles(self):
        import sys

        sys.path.insert(0, "/root/repo")
        from __graft_entry__ import entry

        fn, (plane, qp) = entry()
        # compile-check on a small slice to keep CPU time down
        small = plane[:64, :128]
        out = jax.jit(fn)(small, qp)
        assert out["recon"].shape == (64, 128)


class TestBatchEncoderKernelRouting:
    @needs_8
    def test_mesh_batch_encoder_uses_slab_kernel(self):
        """make_batch_encoder under a mesh routes to the shard_map slab
        kernel (round-1 weak #3: the mesh forfeited the fast paths)."""
        from nanohevc_tpu.parallel.spatial import sharded_fast_supported

        mesh = make_mesh(space=2)
        cfg = EncoderConfig(block_size=8, qp=22)
        assert sharded_fast_supported(cfg, mesh, 32, 64) == "slab"
        cfg_ms = EncoderConfig(
            block_size=8, qp=22, mode_set="all", decision="satd"
        )
        assert sharded_fast_supported(cfg_ms, mesh, 32, 64) == "mode_search"
        # 5 block-rows over 2 shards: covered via bottom padding (the
        # round-2 gap: 1080p silently fell back at space=2)
        assert sharded_fast_supported(cfg, mesh, 40, 64) == "slab"
        # ragged height (not a block multiple) still falls back
        assert sharded_fast_supported(cfg, mesh, 44, 64) is None

    @needs_8
    @pytest.mark.slow   # ~30 s/param: shard_map 35-mode kernel compile;
    # the slab-variant routing tests keep this path's contract fast
    @pytest.mark.parametrize("space", [1, 2])
    def test_sharded_mode_search_matches_single_device(self, space):
        """Sharded fused 35-mode search == per-frame XLA mode search."""
        mesh = make_mesh(space=space)
        f_axis = 8 // space
        rng = np.random.default_rng(9)
        frames = rng.integers(0, 256, (f_axis, 16 * space, 64)).astype(np.int32)
        cfg = EncoderConfig(block_size=8, qp=25, mode_set="all", decision="satd")

        out = encode_batch_sharded(frames, 25, cfg, mesh)
        for f in range(frames.shape[0]):
            single = encode_plane_full(
                jnp.asarray(frames[f]), jnp.int32(25), n=8,
                mode_set="all", decision="satd",
            )
            for k in ("recon", "levels", "modes"):
                assert np.array_equal(
                    np.asarray(out[k][f]), np.asarray(single[k])
                ), (k, f)


class TestSpatialFastPath:
    @needs_8
    @pytest.mark.parametrize("space", [2, 4])
    def test_sharded_slab_matches_unsharded(self, space):
        """shard_map'd slab kernel with ppermute halo == single-device."""
        from nanohevc_tpu.models.all_intra import encode_plane_fast
        from nanohevc_tpu.parallel.spatial import make_sharded_fast_encoder

        mesh = make_mesh(space=space)
        f_axis = 8 // space
        rng = np.random.default_rng(5)
        h = 16 * space   # 2 block-rows of 8 per shard
        frames = rng.integers(0, 256, (f_axis, h, 64)).astype(np.int32)
        config = EncoderConfig(block_size=8, qp=25)

        fn = make_sharded_fast_encoder(config, mesh)
        planes = jax.device_put(
            jnp.asarray(frames), NamedSharding(mesh, P("frame", "space", None))
        )
        out = fn(planes)
        for f in range(f_axis):
            want = encode_plane_fast(jnp.asarray(frames[f]), 25, n=8)
            assert np.array_equal(
                np.asarray(out["recon"][f]), np.asarray(want["recon"])
            ), f
            # levels rows are space-sharded per-shard blocks; reassemble
            got_levels = np.asarray(out["levels"][f])
            assert np.array_equal(got_levels, np.asarray(want["levels"])), f
            assert np.array_equal(
                np.asarray(out["modes"][f]), np.asarray(want["modes"])
            ), f

    @needs_8
    @pytest.mark.parametrize("variant", [
        "slab",
        # slow: ~53 s (35-mode shard_map compile); slab keeps the
        # nondivisible-height halo contract in the fast profile
        pytest.param("mode_search", marks=pytest.mark.slow),
    ])
    def test_sharded_nondivisible_height_matches_unsharded(self, variant):
        """Block-row counts that don't divide the space axis (the 1080p
        case: 135 rows of 8 over 2 shards) pad at the frame bottom and
        stay bit-exact with the single-device kernels."""
        from nanohevc_tpu.models.all_intra import (
            encode_plane_fast,
            encode_plane_fast_modes,
        )
        from nanohevc_tpu.parallel.spatial import make_sharded_fast_encoder

        mesh = make_mesh(space=2)
        rng = np.random.default_rng(11)
        h = 40   # 5 block-rows: NOT divisible by space*n = 16
        frames = rng.integers(0, 256, (4, h, 64)).astype(np.int32)
        if variant == "slab":
            config = EncoderConfig(block_size=8, qp=25)
            single = lambda p: encode_plane_fast(p, 25, n=8)
        else:
            config = EncoderConfig(
                block_size=8, qp=25, mode_set="all", decision="satd"
            )
            single = lambda p: encode_plane_fast_modes(p, 25, n=8)
        fn = make_sharded_fast_encoder(config, mesh, variant)
        planes = jax.device_put(
            jnp.asarray(frames), NamedSharding(mesh, P("frame", "space", None))
        )
        out = fn(planes)
        assert out["recon"].shape == (4, h, 64)
        for f in range(4):
            want = single(jnp.asarray(frames[f]))
            for k in ("recon", "levels", "modes"):
                assert np.array_equal(
                    np.asarray(out[k][f]), np.asarray(want[k])
                ), (k, f)
