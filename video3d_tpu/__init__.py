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

_LAZY = {
    "load_pretrained_model": ("video3d_tpu.models.builder", "load_pretrained_model"),
    "InferenceEngine": ("video3d_tpu.eval.drivers", "InferenceEngine"),
    "EngineConfig": ("video3d_tpu.eval.drivers", "EngineConfig"),
    "VideoProcessor": ("video3d_tpu.data.video_processor", "VideoProcessor"),
    "SigLipImageProcessor": ("video3d_tpu.data.image_processor", "SigLipImageProcessor"),
    "ModelConfig": ("video3d_tpu.config", "ModelConfig"),
    "DataConfig": ("video3d_tpu.config", "DataConfig"),
    "Trainer": ("video3d_tpu.train.trainer", "Trainer"),
    "TrainingConfig": ("video3d_tpu.train.trainer", "TrainingConfig"),
}


def __getattr__(name):
    """Lazy top-level exports (keeps `import video3d_tpu` dependency-light)."""
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'video3d_tpu' has no attribute {name!r}")
