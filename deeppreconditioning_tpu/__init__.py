"""TPU-native learned-preconditioner framework.

A from-scratch JAX/XLA/Pallas re-architecture of the capabilities of
jsappl/DeepPreconditioning (reference: /root/reference): sparse SPD linear
systems -> sparse-conv CNN producing a lower-triangular factor L -> PCG with
M = L @ L.T as preconditioner, benchmarked against vanilla / Jacobi / IC(0).

Layer map (TPU-first, bottom-up):
    sparse/    static-shape sparse containers (batched COO, ELL, CSR) + ingest
    ops/       compute kernels: SpMV (XLA + Pallas), sparse conv, tri-solve, IC(0)
    solvers/   CG / PCG as lax.while_loop with on-device reductions
    models/    Flax CNNs over precomputed conv index plans
    data/      dataset generation (FVM pressure-Poisson, random SPD) + loaders
    train/     optax training loop, early stopping, checkpointing
    bench/     benchmark suite mirroring the reference's table schema
    parallel/  mesh / shard_map distributed SpMV + PCG (halo exchange, psum)
    native/    ctypes bindings to the C++ host-side runtime (index builders,
               factorizations), with pure-numpy fallbacks
"""

__version__ = "0.1.0"
