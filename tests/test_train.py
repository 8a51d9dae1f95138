"""Trainer loop tests: sampler semantics, checkpoint save/resume round-trip,
two real optimizer steps on the synthetic scene (tiny model, 8-dev CPU mesh),
and a grounding-loss step."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video3d_tpu.config import DataConfig, ModelConfig
from video3d_tpu.data.dataset import Collator, CollatorConfig, SupervisedDataset
from video3d_tpu.data.image_processor import SigLipImageProcessor
from video3d_tpu.models import llava_video3d as lv3d
from video3d_tpu.train import checkpoint as ckpt
from video3d_tpu.train.optim import OptimConfig, build_optimizer
from video3d_tpu.train.samplers import (batches_from_order,
                                        get_length_grouped_indices,
                                        get_task_length_grouped_indices,
                                        split_to_even_chunks)
from video3d_tpu.train.trainer import Trainer, TrainingConfig

from fixtures import FakeTokenizer, make_fake_annotations, make_fake_scene

CFG = ModelConfig.tiny()


class TestSamplers:
    def test_split_to_even_chunks_balances(self):
        lengths = [10, 9, 8, 1, 1, 1]
        chunks = split_to_even_chunks(list(range(6)), lengths, 2)
        assert sorted(len(c) for c in chunks) == [3, 3]
        sums = [sum(lengths[i] for i in c) for c in chunks]
        assert max(sums) - min(sums) <= 9

    def test_length_grouped_covers_all(self):
        lengths = list(np.random.default_rng(0).integers(1, 100, 37))
        order = get_length_grouped_indices(lengths, 2, 4,
                                           np.random.default_rng(1))
        assert sorted(order) == list(range(37))

    def test_task_grouped_batches_single_task(self):
        # 3 tasks interleaved; each megabatch must be task-pure
        lengths = [(i % 3, 10 + i) for i in range(48)]
        order = get_task_length_grouped_indices(lengths, 2, 2,
                                                np.random.default_rng(0))
        mb = 4
        for s in range(0, len(order) - mb + 1, mb):
            tasks = {lengths[i][0] for i in order[s:s + mb]}
            assert len(tasks) == 1

    def test_batches_drop_partial(self):
        assert batches_from_order(list(range(7)), 3) == [[0, 1, 2], [3, 4, 5]]


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        params = lv3d.init_model(jax.random.PRNGKey(0), CFG)
        tx = build_optimizer(params, OptimConfig(total_steps=4))
        from video3d_tpu.train.train_step import create_train_state

        state = create_train_state(params, tx)
        out = str(tmp_path / "run")
        path = ckpt.save_checkpoint(out, 5, state)
        assert ckpt.latest_checkpoint(out) == path

        # perturb then restore
        zeroed = state._replace(params=jax.tree.map(jnp.zeros_like, state.params))
        restored = ckpt.restore_checkpoint(path, zeroed)
        orig = jax.tree_util.tree_leaves(state.params)[0]
        back = jax.tree_util.tree_leaves(restored.params)[0]
        np.testing.assert_allclose(np.asarray(orig), np.asarray(back))

    def test_latest_picks_max_step(self, tmp_path):
        out = str(tmp_path / "run")
        os.makedirs(os.path.join(out, "checkpoint-2"))
        os.makedirs(os.path.join(out, "checkpoint-10"))
        assert ckpt.latest_checkpoint(out).endswith("checkpoint-10")


class TestTrainerLoop:
    @pytest.fixture(scope="class")
    def env(self, tmp_path_factory):
        root = str(tmp_path_factory.mktemp("data"))
        info = make_fake_scene(root, n_frames=2)
        ann = make_fake_annotations(root, info["sample_idx"], n=4)
        dc = DataConfig(video_folder=root,
                        annotation_dir=os.path.join(root, "embodiedscan"),
                        metadata_dir=os.path.join(root, "metadata"),
                        frames_upbound=2)
        tok = FakeTokenizer()
        ds = SupervisedDataset(ann, tok, dc,
                               image_processor=SigLipImageProcessor(size=(56, 56)))
        col = Collator(CFG, CollatorConfig(max_len=160, frames_upbound=2))
        return ds, col, str(tmp_path_factory.mktemp("out"))

    def test_two_steps_decrease_nothing_nan(self, env):
        ds, col, out = env
        params = lv3d.init_model(jax.random.PRNGKey(0), CFG)
        # 1-device mesh: 4 samples at batch 1 -> 4 steps
        from video3d_tpu.parallel.mesh import create_mesh

        mesh = create_mesh(dp=1, fsdp=1, tp=1, devices=jax.devices()[:1])
        trainer = Trainer(CFG, params, ds, col,
                          OptimConfig(total_steps=4, learning_rate=1e-3),
                          TrainingConfig(output_dir=out, num_epochs=1,
                                         per_device_batch_size=1,
                                         gradient_accumulation_steps=1,
                                         save_steps=2, group_by="none",
                                         bf16=False, dp=1, tp=1),
                          mesh=mesh)
        state = trainer.train(resume=False)
        assert int(state.step) >= 2
        # saved checkpoint exists and final params exported
        assert ckpt.latest_checkpoint(out) is not None
        assert os.path.isdir(os.path.join(out, "model"))


class TestMasterWeights:
    """f32 master weights + bf16 compute (TrainingConfig.master_f32,
    train_step.cast_to_compute) — the DeepSpeed-bf16 equivalent of the
    reference recipe (scripts/zero3.json: bf16 compute over fp32
    master/optimizer partitions)."""

    def test_bf16_storage_rounds_away_small_updates(self):
        """At the reference's lr=1e-5, AdamW updates (~lr) are below half
        a bf16 ulp of a ~1.0 weight (2^-8): applied to bf16 storage they
        round to nothing every step, while an f32 master accumulates."""
        import optax

        cfg = OptimConfig(learning_rate=1e-5, warmup_ratio=0.0,
                          total_steps=1000, weight_decay=0.0)

        def run(dtype):
            params = {"llm": {"w": jnp.full((8,), 1.0, dtype)}}
            tx = build_optimizer(params, cfg)
            opt = tx.init(params)
            p = params
            for _ in range(8):
                g = jax.tree.map(lambda x: jnp.full_like(x, 1e-2), p)
                up, opt = tx.update(g, opt, p)
                p = optax.apply_updates(p, up)
            return np.asarray(p["llm"]["w"], np.float32)

        assert np.all(run(jnp.bfloat16) == 1.0)          # all updates lost
        assert np.all(run(jnp.float32) < 1.0 - 2e-5)     # all accumulated

    def test_trainer_master_f32_computes_bf16(self, tmp_path_factory):
        """Same batch through both modes: identical step-0 loss (the f32
        master is cast to bf16 at use, so the forward sees the same
        values), f32 params after the update, and the update actually
        lands (master leaf changes)."""
        root = str(tmp_path_factory.mktemp("data_mw"))
        info = make_fake_scene(root, n_frames=2)
        ann = make_fake_annotations(root, info["sample_idx"], n=2)
        dc = DataConfig(video_folder=root,
                        annotation_dir=os.path.join(root, "embodiedscan"),
                        metadata_dir=os.path.join(root, "metadata"),
                        frames_upbound=2)
        ds = SupervisedDataset(ann, FakeTokenizer(), dc,
                               image_processor=SigLipImageProcessor(size=(56, 56)))
        col = Collator(CFG, CollatorConfig(max_len=160, frames_upbound=2))
        from video3d_tpu.parallel.mesh import create_mesh

        mesh = create_mesh(dp=1, fsdp=1, tp=1, devices=jax.devices()[:1])

        def make(master_f32):
            return Trainer(
                CFG, lv3d.init_model(jax.random.PRNGKey(0), CFG), ds, col,
                OptimConfig(total_steps=4, learning_rate=1e-3,
                            warmup_ratio=0.0),
                TrainingConfig(
                    output_dir=str(tmp_path_factory.mktemp("out_mw")),
                    num_epochs=1, per_device_batch_size=1,
                    gradient_accumulation_steps=1, save_steps=100,
                    group_by="none", bf16=True, master_f32=master_f32,
                    dp=1, tp=1),
                mesh=mesh)

        tr32, tr16 = make(True), make(False)

        def float_dtypes(params):
            return {x.dtype for x in jax.tree.leaves(params)
                    if hasattr(x, "dtype")
                    and jnp.issubdtype(x.dtype, jnp.floating)}

        assert float_dtypes(tr32.state.params) == {jnp.dtype(jnp.float32)}
        assert float_dtypes(tr16.state.params) == {jnp.dtype(jnp.bfloat16)}

        batch = tr32._to_batch(col([ds[0]]))
        before = np.asarray(tr32.state.params["llm"]["embed_tokens"],
                            np.float32).copy()
        s32, m32 = tr32._step_fn(tr32.state, batch)       # donates tr32.state
        s16, m16 = tr16._step_fn(tr16.state, batch)
        # the bf16-cast master forward sees the exact bf16-stored values
        assert float(m32["lm_loss"]) == pytest.approx(
            float(m16["lm_loss"]), rel=1e-6)
        assert float_dtypes(s32.params) == {jnp.dtype(jnp.float32)}
        # step 0 trains at warmup lr=0; the second step applies a real lr
        s32, _ = tr32._step_fn(s32, batch)
        after = np.asarray(s32.params["llm"]["embed_tokens"], np.float32)
        assert not np.array_equal(before, after)          # update landed

    def test_resume_upcasts_bf16_checkpoint_to_f32_master(
            self, tmp_path_factory):
        """Orbax restores SAVED dtypes: resuming a bf16-stored checkpoint
        (e.g. written by a pure-bf16 run) under master_f32=True must upcast
        params AND optimizer moments back to f32 — otherwise
        cast_to_compute no-ops and training silently reverts to the
        bf16-storage update-rounding failure."""
        root = str(tmp_path_factory.mktemp("data_ru"))
        info = make_fake_scene(root, n_frames=2)
        ann = make_fake_annotations(root, info["sample_idx"], n=2)
        dc = DataConfig(video_folder=root,
                        annotation_dir=os.path.join(root, "embodiedscan"),
                        metadata_dir=os.path.join(root, "metadata"),
                        frames_upbound=2)
        ds = SupervisedDataset(ann, FakeTokenizer(), dc,
                               image_processor=SigLipImageProcessor(size=(56, 56)))
        col = Collator(CFG, CollatorConfig(max_len=160, frames_upbound=2))
        from video3d_tpu.parallel.mesh import create_mesh
        from video3d_tpu.train.train_step import TrainState

        mesh = create_mesh(dp=1, fsdp=1, tp=1, devices=jax.devices()[:1])
        out = str(tmp_path_factory.mktemp("out_ru"))
        trainer = Trainer(
            CFG, lv3d.init_model(jax.random.PRNGKey(0), CFG), ds, col,
            OptimConfig(total_steps=4, learning_rate=1e-3, warmup_ratio=0.0),
            TrainingConfig(output_dir=out, num_epochs=1,
                           per_device_batch_size=1,
                           gradient_accumulation_steps=1, save_steps=100,
                           group_by="none", bf16=True, master_f32=True,
                           dp=1, tp=1),
            mesh=mesh)
        # simulate a pre-master_f32 checkpoint: bf16 params + bf16 moments,
        # step already past the tiny epoch so resume runs zero steps
        downcast = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            trainer.state)
        legacy = TrainState(downcast.params, downcast.opt_state,
                            jnp.asarray(2, jnp.int32))
        ckpt.save_checkpoint(out, 2, legacy)

        state = trainer.train(resume=True)
        float_dtypes = {x.dtype for x in jax.tree.leaves(
            (state.params, state.opt_state))
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)}
        assert float_dtypes == {jnp.dtype(jnp.float32)}
        assert int(state.step) == 2


class TestGroundingTrainStep:
    def test_ground_step_runs_and_updates(self, tmp_path):
        """ScanRefer-style record -> collator grounding extras ->
        Trainer._ground_step_fn (InfoNCE) updates the ground head."""
        import json

        from fixtures import FakeTokenizer, make_fake_scene
        from video3d_tpu.config import DataConfig
        from video3d_tpu.data.dataset import (Collator, CollatorConfig,
                                              SupervisedDataset)
        from video3d_tpu.data.image_processor import SigLipImageProcessor
        from video3d_tpu.parallel.mesh import create_mesh

        root = str(tmp_path / "data")
        info = make_fake_scene(root, n_frames=2)
        # two records: the warmup schedule makes step 0's lr exactly 0
        rec = [{
            "id": f"g{i}", "video": info["sample_idx"],
            "conversations": [
                {"from": "human", "value": "<image>\nIdentify the chair"},
                {"from": "gpt", "value": "<ground>"},
            ],
            "metadata": {"dataset": "scanrefer", "question_type": "unique",
                         "object_id": 1},
        } for i in range(2)]
        ann = os.path.join(root, "ground.json")
        with open(ann, "w") as f:
            json.dump(rec, f)
        dc = DataConfig(video_folder=root,
                        annotation_dir=os.path.join(root, "embodiedscan"),
                        metadata_dir=os.path.join(root, "metadata"),
                        frames_upbound=2)
        tok = FakeTokenizer()
        ds = SupervisedDataset(ann, tok, dc,
                               image_processor=SigLipImageProcessor(size=(56, 56)))
        col = Collator(CFG, CollatorConfig(
            max_len=160, frames_upbound=2, max_objects=6,
            ground_token_id=tok.vocab["<ground>"]))
        arrays = col([ds[0]])
        assert "ground_slot" in arrays
        assert arrays["box_label_hot"][0, 1] == 1.0   # object_id 1 positive

        params = lv3d.init_model(jax.random.PRNGKey(0), CFG)
        mesh = create_mesh(dp=1, fsdp=1, tp=1, devices=jax.devices()[:1])
        trainer = Trainer(CFG, params, ds, col,
                          OptimConfig(total_steps=2, learning_rate=1e-3),
                          TrainingConfig(output_dir=str(tmp_path / "out"),
                                         save_steps=100, group_by="none",
                                         gradient_accumulation_steps=1,
                                         bf16=False), mesh=mesh)
        before = np.asarray(jax.device_get(
            trainer.state.params["ground_head"]["query"]["w1"]))
        state = trainer.train(resume=False)
        after = np.asarray(jax.device_get(state.params["ground_head"]["query"]["w1"]))
        assert not np.allclose(before, after), "ground head must update"

    def test_scan2cap_coord_pe_path(self, tmp_path):
        """Scan2Cap record with box_input flows through <coord> PE."""
        import json

        from fixtures import FakeTokenizer, make_fake_scene
        from video3d_tpu.config import DataConfig
        from video3d_tpu.data.dataset import (Collator, CollatorConfig,
                                              SupervisedDataset)
        from video3d_tpu.data.image_processor import SigLipImageProcessor

        root = str(tmp_path / "data")
        info = make_fake_scene(root, n_frames=2)
        rec = [{
            "id": "c0", "video": info["sample_idx"],
            "box_input": [1.0, 2.0, 0.5, 0.8, 0.8, 0.8],
            "conversations": [
                {"from": "human",
                 "value": "<image> Given an object located at <coord> , describe the object in detail."},
                {"from": "gpt", "value": "a brown chair"},
            ],
            "metadata": {"dataset": "scan2cap", "question_type": "unique"},
        }]
        ann = os.path.join(root, "cap.json")
        with open(ann, "w") as f:
            json.dump(rec, f)
        dc = DataConfig(video_folder=root,
                        annotation_dir=os.path.join(root, "embodiedscan"),
                        metadata_dir=os.path.join(root, "metadata"),
                        frames_upbound=2)
        tok = FakeTokenizer()
        ds = SupervisedDataset(ann, tok, dc,
                               image_processor=SigLipImageProcessor(size=(56, 56)))
        col = Collator(CFG, CollatorConfig(max_len=192, frames_upbound=2,
                                           coord_token_id=tok.vocab["<coord>"]))
        arrays = col([ds[0]])
        assert arrays["coord_mask"].sum() == 1
        # box center discretized into voxel units
        np.testing.assert_allclose(arrays["box_input"][0],
                                   [(1 + 15) / 0.1, (2 + 15) / 0.1, (0.5 + 5) / 0.1])

        batch = lv3d.Batch(**{k: jnp.asarray(v) for k, v in arrays.items()
                              if k in lv3d.Batch._fields})
        params = lv3d.init_model(jax.random.PRNGKey(0), CFG)
        logits = lv3d.forward(params, CFG, batch)
        assert np.isfinite(np.asarray(logits[0, :8])).all()
        # PE actually changed the <coord> position embedding
        no_pe = batch._replace(coord_mask=jnp.zeros_like(batch.coord_mask))
        logits2 = lv3d.forward(params, CFG, no_pe)
        assert np.abs(np.asarray(logits) - np.asarray(logits2)).max() > 1e-4


class TestPosSkipping:
    def test_offsets_monotone_and_bounded(self):
        from video3d_tpu.train.trainer import apply_pos_skipping

        rng = np.random.default_rng(0)
        pos = np.broadcast_to(np.arange(32), (2, 32)).copy()
        for _ in range(20):
            out = apply_pos_skipping(pos, 100, rng)
            d = out - pos
            assert d.min() >= 0 and d.max() <= 100
            # offsets non-decreasing along the sequence (left <= right)
            assert (np.diff(d[0]) >= 0).all()


class TestChunkedLoss:
    def test_chunked_ce_matches_unchunked_value_and_grads(self):
        """chunked_language_model_loss == language_model_loss(lm_head(h)),
        including gradients wrt hidden AND the lm_head weight, with an odd
        length that forces chunk padding."""
        import jax
        import jax.numpy as jnp
        from video3d_tpu.constants import IGNORE_INDEX
        from video3d_tpu.models import llava_video3d as lv3d
        from video3d_tpu.models import qwen2

        B, L, D, V = 2, 23, 16, 37
        rng = np.random.default_rng(0)
        hidden = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
        head = jnp.asarray(rng.normal(size=(D, V)).astype(np.float32) * 0.1)
        labels = rng.integers(0, V, size=(B, L)).astype(np.int32)
        labels[0, :7] = IGNORE_INDEX
        labels[1, -5:] = IGNORE_INDEX
        labels = jnp.asarray(labels)

        def ref(h, w):
            logits = qwen2.lm_head({"lm_head": w}, h)
            return lv3d.language_model_loss(logits, labels)

        def chunked(h, w):
            return lv3d.chunked_language_model_loss(
                {"llm": {"lm_head": w}}, h, labels, chunk=8)

        v1, (gh1, gw1) = jax.value_and_grad(ref, argnums=(0, 1))(hidden, head)
        v2, (gh2, gw2) = jax.value_and_grad(chunked, argnums=(0, 1))(hidden,
                                                                     head)
        np.testing.assert_allclose(float(v2), float(v1), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(gh2), np.asarray(gh1),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gw2), np.asarray(gw1),
                                   rtol=1e-5, atol=1e-6)


class TestScanLayers:
    def test_scan_matches_unrolled_values_and_grads(self):
        """qwen2_forward(scan_layers=True) == the unrolled loop, value and
        grad, with remat on — the train-step default (loss_fn scan_layers)
        must be a pure scheduling change."""
        import jax
        import jax.numpy as jnp
        from video3d_tpu.config import LLMConfig
        from video3d_tpu.models import qwen2

        cfg = LLMConfig(hidden_size=32, intermediate_size=64,
                        num_hidden_layers=3, num_attention_heads=4,
                        num_key_value_heads=2, head_dim=8, vocab_size=53,
                        max_position_embeddings=128,
                        mrope_section=(2, 1, 1))
        params = qwen2.init_qwen2(jax.random.PRNGKey(0), cfg,
                                  dtype=jnp.float32)
        rng = np.random.default_rng(0)
        B, L = 2, 9
        x = jnp.asarray(rng.normal(size=(B, L, 32)).astype(np.float32))
        pos = jnp.broadcast_to(jnp.arange(L)[None, :, None], (B, L, 3))
        kv_len = jnp.asarray([L, L - 3], jnp.int32)

        def run(p, scan):
            h, _ = qwen2.qwen2_forward(p, cfg, x, pos, kv_len=kv_len,
                                       remat=True, scan_layers=scan)
            return jnp.sum(h * h)

        v0, g0 = jax.value_and_grad(run)(params, False)
        v1, g1 = jax.value_and_grad(run)(params, True)
        np.testing.assert_allclose(float(v1), float(v0), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-5)

    def test_heterogeneous_stack_falls_back(self):
        """A mixed stack (one layer missing qkv bias) must not be scanned —
        it silently falls back to the unrolled loop."""
        import jax
        import jax.numpy as jnp
        from video3d_tpu.config import LLMConfig
        from video3d_tpu.models import qwen2

        cfg = LLMConfig(hidden_size=32, intermediate_size=64,
                        num_hidden_layers=2, num_attention_heads=4,
                        num_key_value_heads=2, head_dim=8, vocab_size=53,
                        max_position_embeddings=128,
                        mrope_section=(2, 1, 1))
        params = qwen2.init_qwen2(jax.random.PRNGKey(0), cfg,
                                  dtype=jnp.float32)
        for k in ("bq", "bk", "bv"):
            params["layers"][1]["attn"].pop(k, None)
        assert not qwen2._homogeneous(params["layers"])
        x = jnp.zeros((1, 4, 32), jnp.float32)
        pos = jnp.zeros((1, 4, 3), jnp.int32)
        h, _ = qwen2.qwen2_forward(params, cfg, x, pos,
                                   kv_len=jnp.asarray([4], jnp.int32),
                                   scan_layers=True)
        assert h.shape == (1, 4, 32)


@pytest.mark.slow
class TestResumeFidelity:
    """Interrupt-and-resume reproduces the uninterrupted run EXACTLY
    (VERDICT r2 #5; the reference gets this from HF Trainer's
    skip_first_batches, train_3d.py:1863-1864): the resumed run consumes
    precisely the batches the uninterrupted run would have, in order, and
    the final params/opt-state match bit-for-bit."""

    def _mk(self, tmp_path_factory, root, ds, col, out):
        from video3d_tpu.parallel.mesh import create_mesh

        mesh = create_mesh(dp=1, fsdp=1, tp=1, devices=jax.devices()[:1])
        return Trainer(
            CFG, lv3d.init_model(jax.random.PRNGKey(0), CFG), ds, col,
            OptimConfig(total_steps=6, learning_rate=1e-3, warmup_ratio=0.0),
            TrainingConfig(output_dir=out, num_epochs=2,
                           per_device_batch_size=1,
                           gradient_accumulation_steps=1, save_steps=1000,
                           group_by="none", bf16=False, seed=7,
                           pos_skipping_range=4, dp=1, tp=1),
            mesh=mesh)

    @staticmethod
    def _record(trainer, log, interrupt_at=None):
        """Wrap the jitted step to log each consumed batch's token ids (and
        position ids — covers pos-skipping RNG fidelity); optionally fire
        SIGTERM as step `interrupt_at` runs, so the trainer checkpoints at
        that boundary and exits."""
        import signal

        orig = trainer._step_fn

        def stepper(state, batch):
            log.append((np.asarray(batch.text_ids).copy(),
                        np.asarray(batch.position_ids).copy()))
            if interrupt_at is not None and len(log) == interrupt_at:
                os.kill(os.getpid(), signal.SIGTERM)
            return orig(state, batch)

        trainer._step_fn = stepper

    def test_resumed_run_matches_uninterrupted_bitwise(self, tmp_path_factory):
        root = str(tmp_path_factory.mktemp("data_rf"))
        info = make_fake_scene(root, n_frames=2)
        ann = make_fake_annotations(root, info["sample_idx"], n=3)
        dc = DataConfig(video_folder=root,
                        annotation_dir=os.path.join(root, "embodiedscan"),
                        metadata_dir=os.path.join(root, "metadata"),
                        frames_upbound=2)
        ds = SupervisedDataset(ann, FakeTokenizer(), dc,
                               image_processor=SigLipImageProcessor(size=(56, 56)))
        col = Collator(CFG, CollatorConfig(max_len=160, frames_upbound=2))

        # ---- run A: 2 epochs x 3 batches = 6 steps, uninterrupted ----
        out_a = str(tmp_path_factory.mktemp("out_rf_a"))
        tr_a = self._mk(tmp_path_factory, root, ds, col, out_a)
        log_a = []
        self._record(tr_a, log_a)
        state_a = tr_a.train(resume=False)
        assert int(state_a.step) == 6 and len(log_a) == 6

        # ---- run B: interrupted at step 2 (mid-epoch-0), then resumed ----
        out_b = str(tmp_path_factory.mktemp("out_rf_b"))
        tr_b1 = self._mk(tmp_path_factory, root, ds, col, out_b)
        log_b = []
        self._record(tr_b1, log_b, interrupt_at=2)
        state_b1 = tr_b1.train(resume=False)
        assert int(state_b1.step) == 2 and len(log_b) == 2
        assert ckpt.latest_checkpoint(out_b).endswith("checkpoint-2")

        tr_b2 = self._mk(tmp_path_factory, root, ds, col, out_b)
        self._record(tr_b2, log_b)
        state_b = tr_b2.train(resume=True)
        assert int(state_b.step) == 6

        # (a) identical batch sequence, including pos-skipping offsets
        assert len(log_b) == 6
        for (ia, pa), (ib, pb) in zip(log_a, log_b):
            np.testing.assert_array_equal(ia, ib)
            np.testing.assert_array_equal(pa, pb)
        # (b) bit-identical final params AND optimizer state
        for a, b in zip(jax.tree.leaves((state_a.params, state_a.opt_state)),
                        jax.tree.leaves((state_b.params, state_b.opt_state))):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestPreemption:
    def test_sigterm_checkpoints_and_exits(self, tmp_path_factory):
        """SIGTERM mid-training: the trainer saves a checkpoint at the next
        step boundary and returns instead of dying uncheckpointed."""
        import signal
        import threading

        root = str(tmp_path_factory.mktemp("data"))
        info = make_fake_scene(root, n_frames=2)
        ann = make_fake_annotations(root, info["sample_idx"], n=6)
        dc = DataConfig(video_folder=root,
                        annotation_dir=os.path.join(root, "embodiedscan"),
                        metadata_dir=os.path.join(root, "metadata"),
                        frames_upbound=2)
        ds = SupervisedDataset(ann, FakeTokenizer(), dc,
                               image_processor=SigLipImageProcessor(size=(56, 56)))
        col = Collator(CFG, CollatorConfig(max_len=160, frames_upbound=2))
        out = str(tmp_path_factory.mktemp("out"))
        from video3d_tpu.parallel.mesh import create_mesh

        mesh = create_mesh(dp=1, fsdp=1, tp=1, devices=jax.devices()[:1])
        trainer = Trainer(CFG, lv3d.init_model(jax.random.PRNGKey(0), CFG),
                          ds, col,
                          OptimConfig(total_steps=60, learning_rate=1e-3),
                          TrainingConfig(output_dir=out, num_epochs=10,
                                         per_device_batch_size=1,
                                         gradient_accumulation_steps=1,
                                         save_steps=1000, group_by="none",
                                         bf16=False, dp=1, tp=1),
                          mesh=mesh)
        # fire SIGTERM shortly after the first steps start
        timer = threading.Timer(
            5.0, lambda: os.kill(os.getpid(), signal.SIGTERM))
        timer.start()
        try:
            state = trainer.train(resume=False)
        finally:
            timer.cancel()
        # returned (not killed), with a checkpoint on disk at its step
        assert ckpt.latest_checkpoint(out) is not None
        # params-only export does NOT exist (we exited early, not finished)
        steps_done = int(state.step)
        assert steps_done < 60
