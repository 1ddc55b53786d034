"""TPU-native short-LDPC decoding framework (NMS + DIA-OSD).

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
``lgw-frank/Short_LDPC_Decoding_OSD`` research codebase (TF2/Keras, CPU,
single-process).  Everything here is built TPU-first:

* batched normalized min-sum (NMS) belief propagation as a fused
  ``lax.scan`` kernel with learned normalization factors,
* batched, fixed-shape GF(2) Gaussian elimination for ordered-statistics
  decoding (OSD),
* test-error-pattern (TEP) re-encoding as MXU int matmuls,
* tiny neural models (DIA reliability refiners, sliding-window stopper)
  in flax/optax,
* a sharded Monte-Carlo FER harness scaling over a ``jax.sharding.Mesh``.

Layout:
  codes/     alist parsing, GF(2) host math, Code registry
  channel/   AWGN / Rayleigh samplers, BPSK, SNR-blend density
  ops/       batched decode kernels (NMS scan, GF(2) elim, TEP re-encode)
  models/    flax modules: DIA CNN/GRU/RNN, stopper FCN
  osd/       OSD engine: reorder, MRB identification, decoding paths, sliding OSD
  baselines/ conventional OSD, FS-OSD, PB-OSD, miracle view
  train/     optax training loops + orbax/pickle checkpointing
  mc/        Monte-Carlo FER harness with error budgets and resume
  parallel/  mesh building, sharded MC step, collective stat reduction
  pipeline/  the 7-stage recipe orchestration + artifact store
  cli/       one CLI with subcommands per stage
"""

__version__ = "0.1.0"
