"""16-virtual-device dryrun worker (VERDICT r4 #8).

Spawned as a subprocess by ``__graft_entry__.dryrun_multichip`` (and by
tests/test_multiprocess.py) because the parent typically runs with 8
virtual devices and the device count is fixed at backend init. Two stages:

1. **pp x dp x fsdp x tp all > 1**: the GPipe pipeline over a
   (pp=2, dp=2, fsdp=2, tp=2) mesh via the partial-auto shard_map
   (parallel/pipeline.py auto_axes — manual over pp, GSPMD over
   dp/fsdp/tp) — fwd+bwd, loss must equal a flat fsdp=16 forward.
2. **Asymmetric multislice (2 slices x 8 devices)**: hybrid DCN-outermost
   mesh with INJECTED slice ids, dp_per_slice=2 (so dp=4 crosses the
   slice boundary), fsdp=2, tp=2 slice-local; one full train step, loss
   must equal the same step on a flat (dp=4, fsdp=2, tp=2) mesh.

Usage: python tests/dryrun16_worker.py OUT_JSON
Writes {"pp_loss": .., "flat_loss": .., "ms_loss": .., "flat_ms_loss": ..,
"pp_gnorm": ..} to OUT_JSON and exits 0 on success.
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "").replace(
    "--xla_force_host_platform_device_count=8", "").strip()
    + " --xla_force_host_platform_device_count=16").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import dataclasses  # noqa: E402

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main(out_path: str) -> None:
    from video3d_tpu.config import ModelConfig
    from video3d_tpu.models import llava_video3d as lv3d
    from video3d_tpu.models import qwen2 as q
    from video3d_tpu.parallel.mesh import (create_mesh,
                                           create_multislice_mesh,
                                           shard_batch, shard_params)
    from video3d_tpu.parallel.pipeline import (qwen2_forward_pp,
                                               shard_stacked_layers,
                                               stack_layer_params)
    from video3d_tpu.train.optim import OptimConfig, build_optimizer
    from video3d_tpu.train.train_step import create_train_state, train_step

    devices = jax.devices()
    assert len(devices) >= 16, devices
    devices = devices[:16]
    res = {}

    # ---- stage 1: pp2 x dp2 x fsdp2 x tp2 (all four axes > 1) ----
    cfg = ModelConfig.tiny()
    pp_cfg = dataclasses.replace(cfg.llm, num_hidden_layers=4)
    llm_p = q.init_qwen2(jax.random.PRNGKey(0), pp_cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(
        10, pp_cfg.vocab_size, (8, 32)))
    pos = jnp.broadcast_to(jnp.arange(32)[None, :, None], (8, 32, 3))
    emb = q.embed_tokens(llm_p, ids)

    mesh_flat = create_mesh(dp=1, fsdp=16, devices=devices)
    p_flat = shard_params({"llm": llm_p}, mesh_flat)

    def flat_loss(p, emb):
        h, _ = q.qwen2_forward(p["llm"], pp_cfg, emb, pos)
        logits = q.lm_head(p["llm"], h).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits[:, :-1])
        return -jnp.take_along_axis(logp, ids[:, 1:, None], axis=-1).mean()

    with mesh_flat:
        res["flat_loss"] = float(jax.jit(flat_loss)(p_flat,
                                                    jax.device_put(emb)))

    mesh_pp = create_mesh(pp=2, dp=2, fsdp=2, tp=2, devices=devices)
    stacked = shard_stacked_layers(stack_layer_params(llm_p["layers"]),
                                   mesh_pp, rules=True)

    def pp_loss(stacked, emb):
        h = qwen2_forward_pp({"layers": stacked, "norm": llm_p["norm"]},
                             pp_cfg, emb, pos, n_microbatches=2, remat=True)
        logits = q.lm_head(llm_p, h).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits[:, :-1])
        return -jnp.take_along_axis(logp, ids[:, 1:, None], axis=-1).mean()

    with mesh_pp:
        l_pp, grads = jax.jit(jax.value_and_grad(pp_loss))(stacked, emb)
        res["pp_gnorm"] = float(jax.jit(lambda g: sum(
            jnp.sum(x.astype(jnp.float32) ** 2)
            for x in jax.tree.leaves(g)) ** 0.5)(grads))
    res["pp_loss"] = float(l_pp)
    np.testing.assert_allclose(res["pp_loss"], res["flat_loss"], rtol=2e-3)
    assert np.isfinite(res["pp_gnorm"]) and res["pp_gnorm"] > 0

    # ---- stage 2: asymmetric multislice 2 x 8, dp across slices ----
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from __graft_entry__ import _make_batch

    params = lv3d.init_model(jax.random.PRNGKey(0), cfg)
    batch = _make_batch(cfg, B=8, V=2, L=256)

    def step_loss(mesh):
        p = shard_params(lv3d.init_model(jax.random.PRNGKey(0), cfg), mesh)
        tx = build_optimizer(p, OptimConfig(total_steps=10))
        state = create_train_state(p, tx)
        b = shard_batch(batch, mesh)
        with mesh:
            _, m = train_step(state, b, cfg, tx, remat=True,
                              force_chunked_ce=True,
                              compute_dtype=jnp.bfloat16)
            return float(m["lm_loss"])

    mesh_ms = create_multislice_mesh(dp_per_slice=2, fsdp=2, tp=2,
                                     devices=devices,
                                     slice_ids=[0] * 8 + [1] * 8)
    assert dict(mesh_ms.shape)["dp"] == 4
    res["ms_loss"] = step_loss(mesh_ms)
    res["flat_ms_loss"] = step_loss(
        create_mesh(dp=4, fsdp=2, tp=2, devices=devices))
    np.testing.assert_allclose(res["ms_loss"], res["flat_ms_loss"],
                               rtol=1e-4)
    assert np.isfinite(res["ms_loss"])

    with open(out_path, "w") as f:
        json.dump(res, f)
    print("dryrun16 OK:", json.dumps(res))


if __name__ == "__main__":
    main(sys.argv[1])
