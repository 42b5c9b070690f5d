"""Benchmark harness."""

from deeppreconditioning_tpu.bench.suite import BenchmarkSuite

__all__ = ["BenchmarkSuite"]
