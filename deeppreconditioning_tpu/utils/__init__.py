"""Logging, timing, profiling utilities."""

from deeppreconditioning_tpu.utils.logging import MetricsLogger

__all__ = ["MetricsLogger"]
