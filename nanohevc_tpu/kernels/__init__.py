"""Pallas TPU kernels: fused per-block pipeline for the hot path."""

from nanohevc_tpu.kernels.fused_pipeline import fused_encode_blocks, fused_encode_planes

__all__ = ["fused_encode_blocks", "fused_encode_planes"]
