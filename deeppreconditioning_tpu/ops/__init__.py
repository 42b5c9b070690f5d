"""Compute kernels: SpMV, sparse convolution, triangular solve, IC(0)."""
