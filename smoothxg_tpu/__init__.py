"""smoothxg_tpu — a TPU-native pangenome graph smoothing framework.

A from-scratch reimplementation of the capabilities of pangenome/smoothxg
(reference: /root/reference, a single C++17 binary) redesigned for TPU:

  * host-side flat-array graph substrate (GFA -> mutable graph -> immutable
    flat index) replacing odgi/xg succinct structures
    (reference: src/xg.cpp, deps/odgi),
  * collinear block finding with the reference's sweep semantics
    (reference: src/blocks.cpp:7-327),
  * repeat-aware block cutting + identity splitting
    (reference: src/breaks.cpp:106-606),
  * partial order alignment as batched JAX/Pallas kernels over
    size-bucketed block batches (reference: deps/spoa, deps/abPOA),
  * lacing + byte-exact path validation (reference: src/main.cpp:614-800),
  * consensus path embedding, MAF output, and consensus graph derivation
    (reference: src/main.cpp:802-976, src/smooth.cpp:1582-1893,
    src/consensus_graph.cpp:95-1030),
  * data-parallel block sharding across a jax.sharding.Mesh in place of the
    reference's single-node OpenMP loop (reference: src/smooth.cpp:1904).
"""

__version__ = "0.1.0"
