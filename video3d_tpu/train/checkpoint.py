"""Orbax checkpointing with HF-Trainer-style layout and auto-resume.

TPU-native replacement for the reference's DeepSpeed/HF checkpoint stack
(SURVEY.md §5.4): ``output_dir/checkpoint-{step}/`` directories, auto-resume
from the latest one (train_3d.py:1863-1864), sharded save/restore via orbax
(each host writes its shards; restore honors the current mesh sharding).
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def latest_checkpoint(output_dir: str) -> Optional[str]:
    """Newest ``checkpoint-*`` dir under output_dir (train_3d.py:1863)."""
    if not os.path.isdir(output_dir):
        return None
    best, best_step = None, -1
    for name in os.listdir(output_dir):
        m = re.fullmatch(r"checkpoint-(\d+)", name)
        if m and int(m.group(1)) > best_step:
            best, best_step = os.path.join(output_dir, name), int(m.group(1))
    return best


def save_checkpoint(output_dir: str, step: int, state: Any) -> str:
    path = os.path.join(os.path.abspath(output_dir), f"checkpoint-{step}")
    if jax.process_count() > 1:
        # multi-host: hand orbax the sharded jax.Arrays directly — each
        # host serializes its addressable shards (device_get of a
        # non-fully-addressable array would raise)
        _checkpointer().save(path, state, force=True)
    else:
        _checkpointer().save(path, jax.device_get(state), force=True)
    return path


def restore_checkpoint(path: str, target: Any) -> Any:
    """Restore into the structure (and shardings) of ``target``."""
    import orbax.checkpoint as ocp

    sharding_tree = jax.tree.map(
        lambda x: x.sharding if hasattr(x, "sharding") else None, target)
    restore_args = jax.tree.map(
        lambda x, s: ocp.ArrayRestoreArgs(sharding=s)
        if hasattr(x, "shape") and s is not None else ocp.RestoreArgs(),
        target, sharding_tree)
    return _checkpointer().restore(
        os.path.abspath(path), item=target,
        restore_args=restore_args)


def save_params_only(output_dir: str, params: Any, name: str = "model") -> str:
    """Final model export (train_3d.py:1871-1888 equivalent)."""
    path = os.path.join(os.path.abspath(output_dir), name)
    if jax.process_count() > 1:
        _checkpointer().save(path, params, force=True)
        return path
    _checkpointer().save(path, jax.device_get(params), force=True)
    return path
