"""Static-shape sparse containers for XLA.

All containers are registered pytrees with *static* array shapes (nnz padded
to buckets) so that everything downstream jits once and stays compiled.
"""

from deeppreconditioning_tpu.sparse.coo import BatchedCOO
from deeppreconditioning_tpu.sparse.ell import ELLMatrix
from deeppreconditioning_tpu.sparse.csr import CSRMatrix

__all__ = ["BatchedCOO", "ELLMatrix", "CSRMatrix"]
