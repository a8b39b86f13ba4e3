"""bsvd_tpu — a TPU-native streaming video-denoising framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of BSVD
("Real-time Streaming Video Denoising with Bidirectional Buffers",
ACM MM 2022, reference implementation: ChenyangQiQi/BSVD) designed
TPU-first:

- the WNet temporal-shift denoiser is a pure functional network over
  ``(N, T, H, W, C)`` arrays in NHWC layout (MXU-friendly),
- streaming inference carries the per-layer bidirectional buffers as an
  explicit state pytree through ``jax.lax.scan`` instead of the
  reference's None-propagating stateful module pipeline,
- training runs as a single jitted SPMD step over a ``jax.sharding.Mesh``
  (batch-sharded data parallelism; optional spatial sharding), replacing
  torch DataParallel/DDP+NCCL,
- the host data pipeline replaces NVIDIA DALI with threaded decode +
  on-device noise synthesis.
"""

__version__ = '0.1.0'

from bsvd_tpu.utils.registry import (ARCH_REGISTRY, DATASET_REGISTRY, LOSS_REGISTRY,
                                     METRIC_REGISTRY, MODEL_REGISTRY)
