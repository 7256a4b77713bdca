"""Multi-chip scaling: device meshes and sharded encode pipelines."""

from nanohevc_tpu.parallel.mesh import make_mesh
from nanohevc_tpu.parallel.sharding import (
    encode_batch_sharded,
    make_batch_encoder,
    make_closed_loop_encoder,
)

__all__ = [
    "make_mesh",
    "encode_batch_sharded",
    "make_batch_encoder",
    "make_closed_loop_encoder",
]
