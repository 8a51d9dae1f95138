"""Checkpoint weight-delta utilities.

Equivalents of the reference's legacy delta tools
(/root/reference/llava/model/apply_delta.py, make_delta.py, consolidate.py):
``make_delta`` subtracts a base model from a fine-tuned one (token-embedding
rows beyond the base vocab are kept verbatim), ``apply_delta`` adds it back,
``consolidate`` re-saves a checkpoint as a single orbax tree. All operate on
the functional param pytrees.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _combine(fn, target: Any, base: Any) -> Any:
    def leaf(t, b):
        t = jnp.asarray(t)
        b = jnp.asarray(b)
        if t.shape == b.shape:
            return fn(t, b)
        # vocab-extended embeddings: rows beyond the base stay verbatim
        # (apply_delta.py handles dim-0 mismatch this way)
        assert t.shape[1:] == b.shape[1:], (t.shape, b.shape)
        n = min(t.shape[0], b.shape[0])
        head = fn(t[:n], b[:n])
        return jnp.concatenate([head, t[n:]], axis=0)

    return jax.tree.map(leaf, target, base)


def make_delta(finetuned: Any, base: Any) -> Any:
    """delta = finetuned - base (per-leaf)."""
    return _combine(lambda t, b: t - b, finetuned, base)


def apply_delta(base: Any, delta: Any) -> Any:
    """finetuned = base + delta (per-leaf)."""
    return _combine(lambda d, b: d + b, delta, base)


def consolidate(checkpoint_path: str, output_path: str) -> str:
    """Re-save an orbax checkpoint as one consolidated tree on host."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    tree = ckptr.restore(checkpoint_path)
    host = jax.tree.map(lambda x: np.asarray(x), tree)
    ckptr.save(output_path, host, force=True)
    return output_path


def main(argv=None):
    import argparse

    import orbax.checkpoint as ocp

    parser = argparse.ArgumentParser()
    parser.add_argument("command", choices=("make-delta", "apply-delta",
                                            "consolidate"))
    parser.add_argument("--base", help="base checkpoint (orbax dir)")
    parser.add_argument("--target", help="finetuned ckpt / delta (orbax dir)")
    parser.add_argument("--output", required=True)
    args = parser.parse_args(argv)

    ckptr = ocp.PyTreeCheckpointer()
    if args.command == "consolidate":
        consolidate(args.target, args.output)
        return
    base = ckptr.restore(args.base)
    target = ckptr.restore(args.target)
    out = (make_delta(target, base) if args.command == "make-delta"
           else apply_delta(base, target))
    ckptr.save(args.output, jax.device_get(out), force=True)


if __name__ == "__main__":
    main()
