"""param_tpu — a TPU-native micro-benchmark and replay harness.

A from-scratch rebuild of the capabilities of facebookresearch/param
(reference mounted at /root/reference) on JAX / XLA / Pallas:

- ``param_tpu.comms``   — collective sweep, pt2pt, overlap, comms+compute and
  DLRM communication-pattern benchmarks (reference: ``train/comms/pt``).
- ``param_tpu.backend`` — the distributed-communication backend abstraction:
  a dispatch table of jitted ``shard_map`` collectives over a
  ``jax.sharding.Mesh`` (reference: ``pytorch_backend_utils.py`` /
  ``pytorch_dist_backend.py``).
- ``param_tpu.ops``     — the compute tier: Pallas GEMM, EmbeddingBag and MLP
  kernels measured against per-chip rooflines (reference: ``train/compute/pt``).
- ``param_tpu.models``  — DLRM-style models used by the end-to-end comm
  pattern benchmark (reference: ``train/comms/pt/dlrm.py``).
- ``param_tpu.trace``   — execution-trace capture, parsing and replay
  (reference: ``et_replay``).
- ``param_tpu.microbench`` — config-driven operator micro-benchmark framework
  (reference: ``train/compute/python``).
"""

__version__ = "0.1.0"
