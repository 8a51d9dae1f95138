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
