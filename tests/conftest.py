"""Test configuration: force an 8-device virtual CPU platform so sharding
tests (pjit / NamedSharding over a Mesh) run without TPU hardware — the
JAX-native fake backend for multi-chip behavior (SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep compile times reasonable on the single-core CI host.
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

# The container's sitecustomize registers a remote TPU PJRT plugin and forces
# jax_platforms='axon,cpu'; override it AFTER jax import, BEFORE backend init,
# so tests run on the local 8-device virtual CPU platform.
jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# ---------------------------------------------------------------------------
# Test tiers (markers registered in pyproject.toml):
#   smoke — `pytest -m smoke`, <3 min: one representative per subsystem.
#   slow  — the heaviest compile stacks; `-m 'not slow'` skips them.
# Centralized here so the lists stay in one place.
# ---------------------------------------------------------------------------

_SMOKE = (
    "test_geometry.py",                  # unproject/resize/pool/voxel goldens
    "test_pos_embed.py",                 # sin3d/MLP PE goldens
    "test_box.py",                       # IoU / box math
    "test_metrics.py",                   # CIDEr/BLEU/ROUGE goldens
    "test_meteor15.py",                  # METEOR 1.5 formula goldens
    "test_assembly.py::TestSplicePlan",  # static splice planning
    "test_qwen2.py::TestKVCacheDecode::test_incremental_matches_full",
    "test_quant.py::TestQuant",          # int8 weight-only + dispatch
    "test_data_pipeline.py::TestTokenization",
    "test_tokenization_real_bpe.py",     # real-BPE preprocess golden
    "test_drivers.py::TestGenerativeDriver::test_scanqa_roundtrip",
    "test_siglip.py",                    # tower forward parity
    "test_flash_attention.py::TestFlashKernel::test_matches_reference",
)

_SLOW = (
    "test_train.py::TestGroundingTrainStep",
    "test_sequence_parallel.py::TestSequenceParallel::test_train_step_under_sp_mesh",
    "test_train.py::TestTrainerLoop",
    "test_data_pipeline.py::TestDatasetAndCollator::test_collate_and_forward_and_train",
    "test_moe.py::TestMoESharding",
    "test_speculative.py::TestInt8CacheInterplay",
    "test_generate.py::TestGenerate::test_matches_naive_greedy",
    "test_image_training.py::TestImageCollator::test_train_step_runs",
    "test_lora_dpo_mc.py::TestDPO",
    "test_eval_e2e.py",                  # 5 subprocess CLI runs
)


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    for item in items:
        rel = item.nodeid.split("tests/")[-1]
        if any(rel.startswith(p) for p in _SMOKE):
            item.add_marker(_pytest.mark.smoke)
        if any(rel.startswith(p) for p in _SLOW):
            item.add_marker(_pytest.mark.slow)
