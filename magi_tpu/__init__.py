"""MAGI-TPU: a TPU-native (JAX/XLA/Pallas) framework for chunk-wise
autoregressive video diffusion, with the capabilities of MAGI-1.

This is a ground-up TPU-first rebuild, not a port: the compute path is
JAX/Pallas over a `jax.sharding.Mesh`; the reference's CUDA/NCCL plumbing
(process groups, async comm overlap, CUDA graphs, meta-device loading) is
replaced by meshes, XLA's latency-hiding scheduler, `jit`, and sharded
deserialization.

Layout (mirrors reference capability inventory, see SURVEY.md):
  core/        config, logging, timing, seeding          (ref: inference/common)
  ops/         Pallas kernels: segmented flash attention, range-mod gating,
               rope, quantized matmul                    (ref: N1-N4 in SURVEY §2.9)
  parallel/    mesh builder + cp/tp/pp sharding helpers  (ref: inference/infra/{distributed,parallelism})
  models/      DiT / ViT-VAE / T5 encoder                (ref: inference/model)
  sampling/    ARDF scheduler: windows, t-schedules, kv ranges, Euler walk
               (ref: inference/pipeline/video_generate.py)
  pipeline/    user pipeline + CLI + media IO            (ref: inference/pipeline)
  checkpoint/  safetensors(+zstd) loading, torch->jax key mapping
  serve/       HTTP service + client                     (ref: magi_video_service.py)
"""

__version__ = "0.1.0"

from magi_tpu.core.config import EngineConfig, MagiConfig, ModelConfig, RuntimeConfig

__all__ = [
    "MagiConfig",
    "ModelConfig",
    "RuntimeConfig",
    "EngineConfig",
    "__version__",
]
