"""NaviLLM-TPU: a TPU-native (JAX/XLA/Pallas/pjit) generalist embodied-navigation framework.

Re-designed from scratch with the capabilities of NaviLLM (CVPR 2024,
reference: zd11024/NaviLLM): multi-task VLN (R2R, REVERIE, CVDN, SOON),
embodied QA (EQA), 3D QA (ScanQA), LLaVA instruction tuning — unified by a
schema-instructed LLM over panoramic viewpoint features.

Architecture (TPU-first, not a port):
  - compute path: JAX + Pallas kernels, fixed shapes, bf16 MXU matmuls
  - parallelism: jax.sharding.Mesh + shard_map (dp/tp axes), XLA collectives
  - host runtime: C++ batched nav-graph simulator (navsim) + async feature
    prefetch feeding the device pipeline
"""

__version__ = "0.1.0"
