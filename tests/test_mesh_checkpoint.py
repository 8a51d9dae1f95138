"""Checkpoint round-trip across mesh topologies.

Real multi-chip runs change shape between save and restore (preemption
moves a job from a v5e-8 to a different slice; eval restores a training
checkpoint onto a serving mesh). The reference leans on DeepSpeed's
ZeRO-partitioned checkpoints, which only restore onto the same world size
(zero_to_fp32.py exists precisely to escape that); here save_checkpoint
gathers to host and restore_checkpoint lays shards out per the *target's*
shardings — so a checkpoint written under one mesh restores bit-exact
under any other."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video3d_tpu.config import ModelConfig
from video3d_tpu.models import llava_video3d as lv3d
from video3d_tpu.parallel.mesh import create_mesh, shard_params
from video3d_tpu.train.checkpoint import (latest_checkpoint,
                                          restore_checkpoint,
                                          save_checkpoint)

CFG = ModelConfig.tiny()


class TestCrossMeshRestore:
    def test_save_under_tp_restore_under_fsdp(self, tmp_path):
        params = lv3d.init_model(jax.random.PRNGKey(0), CFG)
        host = jax.device_get(params)

        mesh_a = create_mesh(dp=2, tp=2, devices=jax.devices()[:4])
        sharded_a = shard_params(params, mesh_a)
        path = save_checkpoint(str(tmp_path), 7, {"params": sharded_a})

        mesh_b = create_mesh()                      # fsdp=8
        target = {"params": shard_params(params, mesh_b)}
        restored = restore_checkpoint(path, target)

        flat_h, _ = jax.tree.flatten(host)
        flat_r, _ = jax.tree.flatten(jax.device_get(restored["params"]))
        assert len(flat_h) == len(flat_r)
        for h, r in zip(flat_h, flat_r):
            np.testing.assert_array_equal(np.asarray(h), np.asarray(r))

        # restored leaves carry mesh_b's shardings, not mesh_a's
        some = jax.tree.leaves(restored["params"])[0]
        assert some.sharding.mesh.shape["fsdp"] == 8

    def test_latest_and_single_device_restore(self, tmp_path):
        params = {"w": jnp.arange(16.0).reshape(4, 4)}
        mesh = create_mesh(tp=2, devices=jax.devices()[:2])
        save_checkpoint(str(tmp_path), 3, shard_params(params, mesh))
        save_checkpoint(str(tmp_path), 11, shard_params(
            jax.tree.map(lambda x: x + 1, params), mesh))
        path = latest_checkpoint(str(tmp_path))
        assert path.endswith("checkpoint-11")
        restored = restore_checkpoint(path, params)   # unsharded target
        np.testing.assert_array_equal(
            np.asarray(restored["w"]), np.arange(16.0).reshape(4, 4) + 1)
