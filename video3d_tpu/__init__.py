"""video3d_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for 3D scene
understanding as video, with the capabilities of Video-3D-LLM.

Layers (see SURVEY.md for the reference layer map):
  ops/       pure-jnp geometry + position-encoding numerics
  kernels/   Pallas TPU kernels (flash attention, fused geometry chain)
  models/    SigLIP tower, projector, Qwen2 decoder (mRoPE), full assembly
  parallel/  device mesh + partition specs (FSDP/TP over ICI)
  data/      host pipeline: scene loading, frame sampling, tokenization
  train/     optax training loop, samplers, checkpointing
  eval/      benchmark drivers + pure-python metrics
  tools/     offline ETL (ScanNet .sens, pcd, max-coverage sampling)
"""

__version__ = "0.1.0"
