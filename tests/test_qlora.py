"""QLoRA: LoRA over a frozen quantized base (reference train_3d.py
bits-4/8 + lora_enable composition, :1588-1657)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from video3d_tpu.config import ModelConfig
from video3d_tpu.models import qwen2
from video3d_tpu.models.quant import (LoraAdapted, matmul, quantize_tree,
                                      quantize_weight, quantize_weight_int4)
from video3d_tpu.train.lora import (LoraConfig, apply_lora, init_lora,
                                    lora_size, merge_lora_into_params)
from video3d_tpu.train.qlora import (QLoraState, check_qlora_base,
                                     create_qlora_state, qlora_loss_fn,
                                     qlora_train_step)

CFG = ModelConfig.tiny()
LCFG = LoraConfig(r=4, alpha=8)


def _llm_params():
    return qwen2.init_qwen2(jax.random.PRNGKey(0), CFG.llm)


def _nonzero_lora(params_for_shapes, key=7):
    lora = init_lora(jax.random.PRNGKey(key), params_for_shapes, LCFG)

    def bump(x):
        if isinstance(x, dict) and set(x) == {"A", "B"}:
            return {"A": x["A"],
                    "B": 0.02 * jnp.ones_like(x["B"])}
        return x

    return jax.tree.map(bump, lora,
                        is_leaf=lambda x: x is None or
                        (isinstance(x, dict) and set(x) == {"A", "B"}))


class TestLoraAdaptedMatmul:
    def test_matches_dequant_plus_delta(self):
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.normal(size=(16, 24)).astype(np.float32))
        A = jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32))
        B = jnp.asarray(rng.normal(size=(4, 24)).astype(np.float32))
        x = jnp.asarray(rng.normal(size=(3, 16)).astype(np.float32))
        qw = quantize_weight(w)
        out = matmul(x, LoraAdapted(qw, A, B, 2.0))
        ref = matmul(x, qw) + (x @ A) @ B * 2.0
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_int4_base(self):
        rng = np.random.default_rng(1)
        w = jnp.asarray(rng.normal(size=(512, 64)).astype(np.float32))
        A = jnp.asarray(rng.normal(size=(512, 4)).astype(np.float32))
        B = jnp.asarray(rng.normal(size=(4, 64)).astype(np.float32))
        x = jnp.asarray(rng.normal(size=(2, 512)).astype(np.float32))
        q4 = quantize_weight_int4(w)
        out = matmul(x, LoraAdapted(q4, A, B, 0.5))
        ref = matmul(x, q4) + (x @ A) @ B * 0.5
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_jit_and_grad_flow(self):
        """LoraAdapted is a pytree: jit traces it, grads reach A/B only."""
        rng = np.random.default_rng(2)
        w = quantize_weight(
            jnp.asarray(rng.normal(size=(8, 8)).astype(np.float32)))
        x = jnp.asarray(rng.normal(size=(2, 8)).astype(np.float32))
        ab = {"A": jnp.asarray(rng.normal(size=(8, 2)).astype(np.float32)),
              "B": jnp.zeros((2, 8), jnp.float32)}

        @jax.jit
        def loss(ab):
            return jnp.sum(matmul(x, LoraAdapted(w, ab["A"], ab["B"], 2.0)) ** 2)

        g = jax.grad(loss)(ab)
        assert float(jnp.abs(g["B"]).sum()) > 0     # dL/dB via x@A != 0
        # B starts 0 so dL/dA = f(B) = 0 on the first step — the standard
        # PEFT init; one step later A gets signal. Check 2nd-order path:
        ab2 = {"A": ab["A"], "B": jnp.ones((2, 8), jnp.float32)}
        g2 = jax.grad(loss)(ab2)
        assert float(jnp.abs(g2["A"]).sum()) > 0


class TestQLoraInitApply:
    def test_init_on_quantized_tree(self):
        params = {"llm": _llm_params()}
        qparams = quantize_tree(params)
        lora = init_lora(jax.random.PRNGKey(1), qparams, LCFG)
        ad = lora["llm"]["layers"][0]["attn"]["wq"]
        assert ad is not None
        qw = qparams["llm"]["layers"][0]["attn"]["wq"]
        assert ad["A"].shape == (qw["q"].shape[0], LCFG.r)
        assert ad["B"].shape == (LCFG.r, qw["q"].shape[1])
        assert lora["llm"]["embed_tokens"] is None
        assert lora_size(lora) > 0

    def test_apply_wraps_quantized(self):
        params = {"llm": _llm_params()}
        qparams = quantize_tree(params)
        lora = init_lora(jax.random.PRNGKey(1), qparams, LCFG)
        merged = apply_lora(qparams, lora, LCFG)
        leaf = merged["llm"]["layers"][0]["attn"]["wq"]
        assert isinstance(leaf, LoraAdapted)
        assert leaf.scale == LCFG.scale
        # non-adapted leaves pass through
        assert merged["llm"]["embed_tokens"] is qparams["llm"]["embed_tokens"]

    def test_forward_parity_zero_init(self):
        """Zero-init LoRA over the quantized base == plain quantized
        forward (the QLoRA identity-at-start invariant)."""
        params = {"llm": _llm_params()}
        qparams = quantize_tree(params)
        lora = init_lora(jax.random.PRNGKey(1), qparams, LCFG)
        merged = apply_lora(qparams, lora, LCFG)
        ids = jnp.asarray(np.random.default_rng(3)
                          .integers(0, CFG.llm.vocab_size, (1, 6)))
        pos = jnp.broadcast_to(jnp.arange(6)[None, :, None], (1, 6, 3))

        def fwd(p):
            h, _ = qwen2.qwen2_forward(p["llm"], CFG.llm,
                                       qwen2.embed_tokens(p["llm"], ids), pos)
            return qwen2.lm_head(p["llm"], h)

        np.testing.assert_allclose(np.asarray(fwd(merged)),
                                   np.asarray(fwd(qparams)),
                                   rtol=1e-5, atol=1e-6)

    def test_forward_delta_matches_explicit(self):
        """Nonzero LoRA over the quantized base == forward through
        explicitly dequantized+delta'd weights."""
        params = {"llm": _llm_params()}
        qparams = quantize_tree(params)
        lora = _nonzero_lora(qparams)
        merged = apply_lora(qparams, lora, LCFG)

        # explicit: dequantize every adapted base, add the delta densely
        def densify(w, ad):
            if ad is None:
                return w
            base = w["q"].astype(jnp.float32) * w["scale"].astype(jnp.float32)
            return base + (ad["A"] @ ad["B"]) * LCFG.scale

        from video3d_tpu.train.lora import _adapter_or_base_leaf
        dense = jax.tree.map(densify, qparams, lora,
                             is_leaf=_adapter_or_base_leaf)

        ids = jnp.asarray(np.random.default_rng(4)
                          .integers(0, CFG.llm.vocab_size, (1, 5)))
        pos = jnp.broadcast_to(jnp.arange(5)[None, :, None], (1, 5, 3))

        def fwd(p):
            h, _ = qwen2.qwen2_forward(p["llm"], CFG.llm,
                                       qwen2.embed_tokens(p["llm"], ids), pos)
            return qwen2.lm_head(p["llm"], h)

        np.testing.assert_allclose(np.asarray(fwd(merged)),
                                   np.asarray(fwd(dense)),
                                   rtol=2e-4, atol=2e-4)

    def test_permanent_merge_requantizes(self):
        params = {"llm": _llm_params()}
        qparams = quantize_tree(params)
        lora = _nonzero_lora(qparams)
        merged = merge_lora_into_params(qparams, lora, LCFG)
        leaf = merged["llm"]["layers"][0]["attn"]["wq"]
        assert isinstance(leaf, dict) and "q" in leaf    # still int8
        # reconstruction ~ dequant(base) + delta, to requantization error
        q0 = qparams["llm"]["layers"][0]["attn"]["wq"]
        ad = lora["llm"]["layers"][0]["attn"]["wq"]
        want = (q0["q"].astype(jnp.float32) * q0["scale"].astype(jnp.float32)
                + (ad["A"] @ ad["B"]) * LCFG.scale)
        got = leaf["q"].astype(jnp.float32) * leaf["scale"].astype(jnp.float32)
        step = float(jnp.max(leaf["scale"].astype(jnp.float32)))
        assert float(jnp.abs(got - want).max()) <= step  # <= 1 quant step + bf16

    def test_w8a8_guard(self):
        params = {"llm": _llm_params()}
        qparams = quantize_tree(params, act="int8")
        with pytest.raises(TypeError, match="w8a8"):
            check_qlora_base(qparams)
        check_qlora_base(quantize_tree(params))          # weight-only ok


class TestQLoraTraining:
    def test_loss_decreases_base_frozen(self, tmp_path_factory):
        """A few QLoRA steps on a real collated batch: loss drops, the
        int8 base bytes never change, and the adapters move."""
        import os

        from fixtures import (FakeTokenizer, make_fake_annotations,
                              make_fake_scene)
        from video3d_tpu.config import DataConfig
        from video3d_tpu.data.dataset import (Collator, CollatorConfig,
                                              SupervisedDataset)
        from video3d_tpu.data.image_processor import SigLipImageProcessor
        from video3d_tpu.models import llava_video3d as lv3d

        root = str(tmp_path_factory.mktemp("data_qlora"))
        info = make_fake_scene(root, n_frames=2)
        ann = make_fake_annotations(root, info["sample_idx"], n=1)
        dc = DataConfig(video_folder=root,
                        annotation_dir=os.path.join(root, "embodiedscan"),
                        metadata_dir=os.path.join(root, "metadata"),
                        frames_upbound=2)
        ds = SupervisedDataset(ann, FakeTokenizer(), dc,
                               image_processor=SigLipImageProcessor(
                                   size=(56, 56)))
        col = Collator(CFG, CollatorConfig(max_len=160, frames_upbound=2))
        arrays = col([ds[0]])
        batch = lv3d.Batch(**{k: (jnp.asarray(v) if v is not None else None)
                              for k, v in arrays.items()
                              if k in lv3d.Batch._fields})

        params = lv3d.init_model(jax.random.PRNGKey(0), CFG)
        qparams = quantize_tree(params)
        check_qlora_base(qparams)
        lora = init_lora(jax.random.PRNGKey(1), qparams, LCFG)

        tx = optax.adam(1e-2)
        state = create_qlora_state(lora, tx)
        base_before = np.asarray(
            qparams["llm"]["layers"][0]["attn"]["wq"]["q"]).copy()

        losses = []
        for _ in range(5):
            state, metrics = qlora_train_step(
                state, qparams, batch, CFG, tx, LCFG, remat=False,
                compute_dtype=None)
            losses.append(float(metrics["lm_loss"]))
        assert losses[-1] < losses[0] - 0.05, losses
        np.testing.assert_array_equal(
            np.asarray(qparams["llm"]["layers"][0]["attn"]["wq"]["q"]),
            base_before)
        # adapters actually moved
        ad = state.lora["llm"]["layers"][0]["attn"]["wq"]
        assert float(jnp.abs(ad["B"]).max()) > 0


class TestTrainerLoraMode:
    def test_prequantized_base_passes_through_unchanged(self):
        """A --load-format dummy base arrives ALREADY quantized
        (cli.cmd_train rehearsal path): the Trainer must not re-quantize
        or re-cast it — q stays int8, scales keep quantize_weight's bf16,
        and the values equal what the normal bf16->quantize_tree path
        produces."""
        from video3d_tpu.models import llava_video3d as lv3d
        from video3d_tpu.parallel.mesh import create_mesh
        from video3d_tpu.train.optim import OptimConfig
        from video3d_tpu.train.trainer import Trainer, TrainingConfig

        bf16_params = lv3d.init_model(jax.random.PRNGKey(0), CFG,
                                      dtype=jnp.bfloat16)
        pre_q = quantize_tree(bf16_params, bits=8)
        trainer = Trainer(
            CFG, pre_q, dataset=None, collator=None,
            optim_cfg=OptimConfig(total_steps=1),
            train_cfg=TrainingConfig(output_dir="/tmp/unused",
                                     bf16=True, master_f32=True,
                                     lora_r=4, lora_alpha=8, lora_bits=8),
            mesh=create_mesh(dp=1, fsdp=1, tp=1, devices=jax.devices()[:1]))
        wq = trainer.base_params["llm"]["layers"][0]["attn"]["wq"]
        ref = quantize_tree(bf16_params, bits=8)
        ref_wq = ref["llm"]["layers"][0]["attn"]["wq"]
        assert wq["q"].dtype == jnp.int8
        assert wq["scale"].dtype == ref_wq["scale"].dtype
        np.testing.assert_array_equal(np.asarray(wq["q"]),
                                      np.asarray(ref_wq["q"]))
        np.testing.assert_array_equal(
            np.asarray(wq["scale"], dtype=np.float32),
            np.asarray(ref_wq["scale"], dtype=np.float32))

    def test_qlora_trainer_end_to_end(self, tmp_path_factory):
        """Trainer with lora_r>0 + lora_bits=8 (the CLI --lora-enable
        --bits 8 path): steps run, loss finite, the trainable tree holds
        adapters + the reference's non-LoRA trainables (projector), the
        LLM base leaf stays int8, checkpoints save/restore."""
        import os

        from fixtures import (FakeTokenizer, make_fake_annotations,
                              make_fake_scene)
        from video3d_tpu.config import DataConfig
        from video3d_tpu.data.dataset import (Collator, CollatorConfig,
                                              SupervisedDataset)
        from video3d_tpu.data.image_processor import SigLipImageProcessor
        from video3d_tpu.models import llava_video3d as lv3d
        from video3d_tpu.parallel.mesh import create_mesh
        from video3d_tpu.train import checkpoint as ckpt
        from video3d_tpu.train.optim import OptimConfig
        from video3d_tpu.train.trainer import Trainer, TrainingConfig

        root = str(tmp_path_factory.mktemp("data_qlora_tr"))
        info = make_fake_scene(root, n_frames=2)
        ann = make_fake_annotations(root, info["sample_idx"], n=2)
        dc = DataConfig(video_folder=root,
                        annotation_dir=os.path.join(root, "embodiedscan"),
                        metadata_dir=os.path.join(root, "metadata"),
                        frames_upbound=2)
        ds = SupervisedDataset(ann, FakeTokenizer(), dc,
                               image_processor=SigLipImageProcessor(
                                   size=(56, 56)))
        col = Collator(CFG, CollatorConfig(max_len=160, frames_upbound=2))
        out = str(tmp_path_factory.mktemp("out_qlora_tr"))

        params = lv3d.init_model(jax.random.PRNGKey(0), CFG)
        mesh = create_mesh(dp=1, fsdp=1, tp=1, devices=jax.devices()[:1])
        trainer = Trainer(
            CFG, params, ds, col,
            OptimConfig(total_steps=2, learning_rate=1e-3),
            TrainingConfig(output_dir=out, num_epochs=1,
                           per_device_batch_size=1,
                           gradient_accumulation_steps=1, save_steps=1,
                           group_by="none", bf16=True, master_f32=True,
                           lora_r=4, lora_alpha=8, lora_bits=8),
            mesh=mesh)
        # trainable tree: adapters on LLM, full projector copy, None vision
        tr = trainer.state.params
        assert set(tr["llm"]["layers"][0]["attn"]["wq"]) == {"A", "B"}
        assert tr["projector"]["w1"] is not None
        assert jax.tree_util.tree_leaves(tr["vision"]) == []
        # base frozen + quantized
        assert "q" in trainer.base_params["llm"]["layers"][0]["attn"]["wq"]

        state = trainer.train(resume=False)
        assert int(state.step) >= 2
        assert ckpt.latest_checkpoint(out) is not None
        # loss computes through the merged tree
        ev = trainer.evaluate(max_batches=1)
        assert np.isfinite(ev["eval_loss"])

        # resume restores the trainable structure
        trainer2 = Trainer(
            CFG, params, ds, col,
            OptimConfig(total_steps=2, learning_rate=1e-3),
            TrainingConfig(output_dir=out, num_epochs=1,
                           per_device_batch_size=1,
                           gradient_accumulation_steps=1, save_steps=1,
                           group_by="none", bf16=True, master_f32=True,
                           lora_r=4, lora_alpha=8, lora_bits=8),
            mesh=mesh)
        state2 = trainer2.train(resume=True)
        assert int(state2.step) >= int(state.step)
