"""Observability and verification utilities."""

from nanohevc_tpu.utils.tracing import Stopwatch, trace_region, throughput_stats
from nanohevc_tpu.utils.checks import sample_parity_check

__all__ = ["Stopwatch", "trace_region", "throughput_stats", "sample_parity_check"]
