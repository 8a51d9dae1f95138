"""On-chip A/B: train-step cost of f32 master weights vs pure-bf16 storage.

The trainer now defaults to mixed precision (TrainingConfig.master_f32:
f32 master params cast to bf16 at use — train_step.cast_to_compute), the
DeepSpeed-bf16 equivalent of the reference recipe. This measures what that
costs per step on the real chip: the extra work is one f32->bf16 param
cast per step (6 B/param of HBM traffic, fused into the consuming matmuls)
plus f32 instead of bf16 optimizer math (AdamW reads/writes 4 f32 trees
instead of mixed f32/bf16) — both bandwidth, no extra FLOPs.

Scale: full-width (3584) Qwen2 blocks at reduced depth/vocab so the FOUR
f32 trees (master + mu + nu + grads) fit one 16 GB chip next to the bf16
cast copies. At this scale the optimizer traffic is a LARGER share of the
step than at 7B (depth amortizes the fixed lm_head/embed trees), so the
measured overhead is an upper bound on the production ratio.

Methodology: one jitted lax.fori_loop chains N full steps (state carried,
token ids perturbed by the loop index so nothing hoists), single scalar
fetch (see .claude/skills/verify/SKILL.md — block_until_ready is a no-op
through the remote tunnel).

Usage: timeout 560 python scripts/bench/master_dtype_step.py
"""

import dataclasses
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

LAYERS = 2
VOCAB = 16384
L = 2048
ITERS = 8


def main():
    from video3d_tpu.config import LLMConfig
    from video3d_tpu.models import qwen2
    from video3d_tpu.train.optim import OptimConfig, build_optimizer
    from video3d_tpu.train.train_step import cast_to_compute

    cfg = dataclasses.replace(LLMConfig(), num_hidden_layers=LAYERS,
                              vocab_size=VOCAB)
    ocfg = OptimConfig(total_steps=1000, warmup_ratio=0.0)

    ids0 = jnp.asarray(np.random.default_rng(0).integers(10, VOCAB, (1, L)))
    pos = jnp.broadcast_to(jnp.arange(L)[None, :, None], (1, L, 3))

    def loss(p, ids):
        h, _ = qwen2.qwen2_forward(p["llm"], cfg,
                                   qwen2.embed_tokens(p["llm"], ids), pos)
        logits = qwen2.lm_head(p["llm"], h).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits[:, :-1])
        return -jnp.take_along_axis(logp, ids[:, 1:, None], axis=-1).mean()

    def make_harness(master_dtype):
        p = {"llm": qwen2.init_qwen2(jax.random.PRNGKey(0), cfg)}
        p = jax.tree.map(lambda x: x.astype(master_dtype)
                         if x.dtype == jnp.float32 else x, p)
        cdt = jnp.bfloat16 if master_dtype == jnp.float32 else None
        tx = build_optimizer(p, ocfg)
        opt = tx.init(p)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def run(p, opt, ids):
            def body(i, carry):
                p, opt = carry
                ids_i = (ids + i) % VOCAB            # defeat hoisting

                def lf(q):
                    if cdt is not None:
                        q = cast_to_compute(q, cdt)
                    return loss(q, ids_i)

                g = jax.grad(lf)(p)
                up, opt = tx.update(g, opt, p)
                # optax.apply_updates semantics: add in the promoted dtype,
                # store back in the param dtype (keeps the carry type stable)
                return (jax.tree.map(lambda a, b: (a + b).astype(a.dtype),
                                     p, up), opt)

            p, opt = jax.lax.fori_loop(0, ITERS, body, (p, opt))
            return p, opt, loss(cast_to_compute(p) if cdt else p, ids)

        return p, opt, run

    out = {}
    for name, dt in (("bf16-master", jnp.bfloat16), ("f32-master", jnp.float32)):
        p, opt, run = make_harness(dt)
        p, opt, l0 = run(p, opt, ids0)              # compile + warm
        float(l0)
        t0 = time.time()
        p, opt, l1 = run(p, opt, ids0)
        lv = float(l1)                               # one scalar fetch
        dt_ms = (time.time() - t0) * 1e3 / ITERS
        out[name] = dt_ms
        print(f"{name}: {dt_ms:.1f} ms/step (loss {lv:.4f})", flush=True)
    print(f"f32-master overhead: "
          f"{(out['f32-master'] / out['bf16-master'] - 1) * 100:.1f}%")


if __name__ == "__main__":
    main()
