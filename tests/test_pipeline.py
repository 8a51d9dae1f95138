"""Pipeline parallelism (pp axis): the GPipe-scheduled decoder matches the
sequential stack exactly, composes with data parallelism, and is
differentiable (training through ppermute)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video3d_tpu.config import ModelConfig, replace
from video3d_tpu.models import qwen2
from video3d_tpu.parallel.mesh import create_mesh, shard_batch
from video3d_tpu.parallel.pipeline import (pipeline_decoder, qwen2_forward_pp,
                                           shard_stacked_layers,
                                           stack_layer_params,
                                           unstack_layer_params)

CFG = replace(ModelConfig.tiny().llm, num_hidden_layers=4)


@pytest.fixture(scope="module")
def setup():
    params = qwen2.init_qwen2(jax.random.PRNGKey(0), CFG)
    ids = np.random.default_rng(0).integers(10, CFG.vocab_size, (4, 16))
    embeds = qwen2.embed_tokens(params, jnp.asarray(ids))
    pos = jnp.broadcast_to(jnp.arange(16)[None, :, None], (4, 16, 3))
    ref, _ = qwen2.qwen2_forward(params, CFG, embeds, pos)
    return params, embeds, pos, ref


class TestStacking:
    def test_stack_unstack_roundtrip(self, setup):
        params, *_ = setup
        stacked = stack_layer_params(params["layers"])
        assert jax.tree.leaves(stacked)[0].shape[0] == 4
        back = unstack_layer_params(stacked)
        for a, b in zip(jax.tree.leaves(params["layers"]),
                        jax.tree.leaves(back)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestPipelineForward:
    @pytest.mark.parametrize("pp,M", [(2, 2), (2, 4), (4, 2)])
    def test_matches_sequential(self, setup, pp, M):
        params, embeds, pos, ref = setup
        mesh = create_mesh(pp=pp, fsdp=1, devices=jax.devices()[:pp])
        stacked = shard_stacked_layers(stack_layer_params(params["layers"]),
                                       mesh)
        with mesh:
            got = jax.jit(lambda s, e: qwen2_forward_pp(
                {"layers": s, "norm": params["norm"]}, CFG, e, pos,
                n_microbatches=M))(stacked, embeds)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_composes_with_dp(self, setup):
        params, embeds, pos, ref = setup
        mesh = create_mesh(pp=2, dp=2, fsdp=1, devices=jax.devices()[:4])
        stacked = shard_stacked_layers(stack_layer_params(params["layers"]),
                                       mesh)
        with mesh:
            got = jax.jit(lambda s, e: qwen2_forward_pp(
                {"layers": s, "norm": params["norm"]}, CFG, e, pos,
                n_microbatches=2))(stacked, shard_batch(embeds, mesh))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_respects_kv_len(self, setup):
        """Right padding is masked identically in both paths."""
        params, embeds, pos, ref = setup
        kv_len = jnp.asarray([16, 12, 8, 16], jnp.int32)
        ref2, _ = qwen2.qwen2_forward(params, CFG, embeds, pos, kv_len=kv_len)
        mesh = create_mesh(pp=2, fsdp=1, devices=jax.devices()[:2])
        stacked = shard_stacked_layers(stack_layer_params(params["layers"]),
                                       mesh)
        with mesh:
            got = jax.jit(lambda s, e: qwen2_forward_pp(
                {"layers": s, "norm": params["norm"]}, CFG, e, pos,
                kv_len=kv_len, n_microbatches=2))(stacked, embeds)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref2),
                                   rtol=2e-5, atol=2e-5)


class TestPipelineBackward:
    @pytest.mark.parametrize("remat", [False, True])
    def test_grads_match_sequential(self, setup, remat):
        params, embeds, pos, _ = setup

        def seq_loss(layers, e):
            h, _ = qwen2.qwen2_forward(
                {"layers": layers, "norm": params["norm"]}, CFG, e, pos)
            return (h.astype(jnp.float32) ** 2).mean()

        ref_grads = jax.grad(seq_loss)(params["layers"], embeds)

        mesh = create_mesh(pp=2, fsdp=1, devices=jax.devices()[:2])
        stacked = shard_stacked_layers(stack_layer_params(params["layers"]),
                                       mesh)

        def pp_loss(s, e):
            h = qwen2_forward_pp({"layers": s, "norm": params["norm"]},
                                 CFG, e, pos, n_microbatches=2, remat=remat)
            return (h.astype(jnp.float32) ** 2).mean()

        with mesh:
            got = jax.jit(jax.grad(pp_loss))(stacked, embeds)
        got_list = unstack_layer_params(got)
        for i in range(4):
            for (pa, a), (pb, b) in zip(
                    sorted(jax.tree_util.tree_leaves_with_path(ref_grads[i]),
                           key=lambda kv: str(kv[0])),
                    sorted(jax.tree_util.tree_leaves_with_path(got_list[i]),
                           key=lambda kv: str(kv[0]))):
                np.testing.assert_allclose(
                    np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5,
                    err_msg=f"layer {i} {pa}")

    def test_bad_microbatch_count_raises(self, setup):
        params, embeds, pos, _ = setup
        mesh = create_mesh(pp=2, fsdp=1, devices=jax.devices()[:2])
        stacked = stack_layer_params(params["layers"])
        with mesh, pytest.raises(AssertionError):
            pipeline_decoder(stacked, CFG, embeds,
                             jnp.zeros((4, 16, CFG.head_dim)),
                             jnp.zeros((4, 16, CFG.head_dim)),
                             n_microbatches=3)  # 4 % 3 != 0
