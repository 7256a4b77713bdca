"""Encoder pipelines: full-frame all-intra encode graphs over block tensors."""

from nanohevc_tpu.models.all_intra import (
    encode_plane_parity,
    encode_plane_full,
    encode_frame_intra,
    encode_frame_full,
    create_test_frame,
)

__all__ = [
    "encode_plane_parity",
    "encode_plane_full",
    "encode_frame_intra",
    "encode_frame_full",
    "create_test_frame",
]
