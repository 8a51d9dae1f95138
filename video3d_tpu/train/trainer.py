"""Training loop: mesh setup, sharded state, task-aware batching, grad
accumulation, logging, checkpoint/resume.

Orchestration mirrors the reference recipe (train_3d.py::train +
LLaVATrainer): task-grouped length sampler, per-module LRs, cosine+warmup,
bf16, grad accumulation, auto-resume — re-expressed as a jitted train step
over a (dp, fsdp, tp) mesh. Grounding batches (ScanRefer/Multi3DRefer) train
the InfoNCE head exactly like the reference's ``predict_box`` path
(llava_qwen.py:302-331); generative batches train the LM cross-entropy.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import Any, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from video3d_tpu.config import ModelConfig
from video3d_tpu.models import llava_video3d as lv3d
from video3d_tpu.parallel.mesh import create_mesh, shard_batch, shard_params
from video3d_tpu.train import checkpoint as ckpt
from video3d_tpu.train.optim import OptimConfig, build_optimizer
from video3d_tpu.train.samplers import (batches_from_order,
                                        get_length_grouped_indices,
                                        get_modality_length_grouped_indices,
                                        get_task_length_grouped_indices)
from video3d_tpu.train.train_step import TrainState, create_train_state, loss_fn


@dataclasses.dataclass
class TrainingConfig:
    output_dir: str = "checkpoints/run"
    num_epochs: int = 1
    per_device_batch_size: int = 1
    gradient_accumulation_steps: int = 2
    save_steps: int = 1000
    logging_steps: int = 1
    metrics_file: Optional[str] = None     # jsonl metrics log (wandb-free)
    profile_steps: Optional[tuple] = None  # (start, stop) jax.profiler window
    profile_dir: str = "/tmp/video3d_tpu_profile"
    seed: int = 0
    group_by: str = "task_length"      # task_length | length | modality_length | none
    bf16: bool = True
    # f32 MASTER weights with bf16 compute (the reference's DeepSpeed-bf16
    # semantics, scripts/zero3.json: fp32 master/optimizer partitions).
    # False stores params in bf16 outright — at the recipe's lr=1e-5 that
    # silently rounds away most AdamW updates (|update| ~ lr is below half
    # a bf16 ulp of typical weight magnitudes) and freezes the second-
    # moment EMA; keep True unless HBM-bound (costs one extra f32-vs-bf16
    # param tree per fsdp shard). See train_step.cast_to_compute.
    master_f32: bool = True
    remat: bool = True
    dp: int = 1
    tp: int = 1
    sp: int = 1
    grounding_loss_weight: float = 1.0
    # use_pos_skipping (llava_arch.py:823-829): during training, add random
    # offsets to position ids before/after a random split point to expose the
    # model to larger absolute positions. 0 disables.
    pos_skipping_range: int = 0
    # LoRA fine-tuning (reference train_3d.py:1588-1657 lora_enable):
    # lora_r > 0 trains {"A","B"} adapters on the LLM projections plus the
    # reference's non-LoRA trainables (projector / world-PE / ground head),
    # with the base model FROZEN in bf16 storage. lora_bits 8 or 4
    # additionally quantizes the frozen base (QLoRA — the reference's
    # bitsandbytes bits-4/8 branch): a 7B base then fine-tunes on one
    # 16 GB chip (scripts/bench/qlora_step.py).
    lora_r: int = 0
    lora_alpha: int = 0        # 0 -> 2 * lora_r
    lora_bits: int = 16        # 16 = bf16 frozen base; 8 / 4 = quantized


def apply_pos_skipping(position_ids: np.ndarray, skip_range: int,
                       rng: np.random.Generator) -> np.ndarray:
    """use_pos_skipping (llava_arch.py:823-829): pick a random split point,
    add ``left_add`` to ids before it and ``right_add >= left_add`` after."""
    L = position_ids.shape[1]
    split = int(rng.integers(0, L + 1))
    left_add = int(rng.integers(0, skip_range + 1))
    right_add = int(rng.integers(left_add, skip_range + 1))
    out = position_ids.copy()
    out[:, :split] += left_add
    out[:, split:] += right_add
    return out


def grounding_loss_fn(params, cfg: ModelConfig, batch: lv3d.Batch,
                      world_coords, objects, objects_valid, ground_slot,
                      box_label_hot, remat: bool = True):
    """InfoNCE grounding loss for a B=1 batch (llava_qwen.py:294-331)."""
    scores = lv3d.grounding_forward(params, cfg, batch, world_coords[0],
                                    objects[0], objects_valid[0],
                                    ground_slot[0], remat=remat)
    loss = lv3d.infonce_loss(scores, box_label_hot[0], cfg.ground_head_temperature)
    return loss, {"ground_loss": loss}


class Trainer:
    def __init__(self, model_cfg: ModelConfig, params, dataset, collator,
                 optim_cfg: OptimConfig, train_cfg: TrainingConfig,
                 mesh=None):
        self.cfg = model_cfg
        self.tcfg = train_cfg
        self.dataset = dataset
        self.collator = collator
        self.mesh = mesh or create_mesh(dp=train_cfg.dp, tp=train_cfg.tp, sp=train_cfg.sp)
        # bf16 + master_f32 (default): params stay f32 (the optimizer's
        # master copy; checkpoint imports arrive bf16 -> upcast) and are
        # cast to bf16 at use inside the jitted step. bf16 alone: params
        # stored bf16 outright (legacy; loses sub-ulp updates — see
        # TrainingConfig.master_f32).
        self._compute_dtype = jnp.bfloat16 if train_cfg.bf16 else None
        self._lora_cfg = None
        self.base_params = None
        if train_cfg.lora_r:
            # LoRA / QLoRA: the trainable tree is the adapters + non-LoRA
            # trainables; the base is frozen (bf16 storage — no master
            # needed for weights that never update) and optionally
            # int8/int4-quantized.
            from video3d_tpu.models.quant import quantize_tree
            from video3d_tpu.train.lora import (LoraConfig,
                                                init_lora_trainable)
            from video3d_tpu.train.qlora import check_qlora_base

            self._lora_cfg = LoraConfig(
                r=train_cfg.lora_r,
                alpha=train_cfg.lora_alpha or 2 * train_cfg.lora_r)
            base = params
            if train_cfg.bf16:
                base = jax.tree.map(
                    lambda x: x.astype(jnp.bfloat16)
                    if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                    base)
            if train_cfg.lora_bits in (8, 4):
                base = quantize_tree(base, bits=train_cfg.lora_bits)
                check_qlora_base(base)
            master = (jnp.float32 if (train_cfg.master_f32
                                      or not train_cfg.bf16)
                      else jnp.bfloat16)
            params = init_lora_trainable(
                jax.random.PRNGKey(train_cfg.seed), base, self._lora_cfg,
                dtype=master)
            if master == jnp.bfloat16:
                self._compute_dtype = None     # trainables already bf16
            self.base_params = shard_params(base, self.mesh)
        elif train_cfg.bf16 and train_cfg.master_f32:
            params = jax.tree.map(
                lambda x: x.astype(jnp.float32)
                if hasattr(x, "dtype") and x.dtype == jnp.bfloat16 else x,
                params)
        elif train_cfg.bf16:
            params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)
            self._compute_dtype = None      # params already bf16
        self.params = shard_params(params, self.mesh)
        base_tx = build_optimizer(self.params, optim_cfg)
        if train_cfg.gradient_accumulation_steps > 1:
            self.tx = optax.MultiSteps(base_tx, train_cfg.gradient_accumulation_steps)
        else:
            self.tx = base_tx
        self.state = create_train_state(self.params, self.tx)
        self._step_fn = self._build_step()
        self._ground_step_fn = self._build_ground_step()

    # ------------- jitted steps -------------

    def _merged(self, trainable, base):
        """LoRA mode: trainable tree merged over the frozen base (inside
        jit; quantized leaves stay lazy LoraAdapted nodes)."""
        from video3d_tpu.train.lora import apply_lora
        from video3d_tpu.train.train_step import cast_to_compute

        if self._compute_dtype is not None:
            trainable = cast_to_compute(trainable, self._compute_dtype)
        return apply_lora(base, trainable, self._lora_cfg)

    def _build_step(self):
        cfg, tx, remat = self.cfg, self.tx, self.tcfg.remat
        cdt = self._compute_dtype

        if self._lora_cfg is not None:
            from video3d_tpu.train.qlora import qlora_loss_fn

            lcfg = self._lora_cfg

            # the frozen base rides as an ARGUMENT: a closed-over device
            # tree would be baked into the program as constants (8+ GB at
            # 7B scale — doubles HBM and stalls compilation)
            @functools.partial(jax.jit, donate_argnums=(0,))
            def lora_step(state: TrainState, base, batch: lv3d.Batch):
                def lf(tr):
                    # the ONE QLoRA loss implementation (train/qlora.py);
                    # scan_layers=True per the fsdp memory note in loss_fn
                    return qlora_loss_fn(tr, base, cfg, batch, lcfg,
                                         remat=remat, scan_layers=True,
                                         compute_dtype=cdt)

                (loss, metrics), grads = jax.value_and_grad(
                    lf, has_aux=True)(state.params)
                updates, opt_state = tx.update(grads, state.opt_state,
                                               state.params)
                params = optax.apply_updates(state.params, updates)
                metrics = dict(metrics)
                metrics["grad_norm"] = optax.global_norm(grads)
                return TrainState(params, opt_state, state.step + 1), metrics

            return lambda state, batch: lora_step(state, self.base_params,
                                                  batch)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state: TrainState, batch: lv3d.Batch):
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, cfg, batch, remat, False, True, cdt)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            metrics = dict(metrics)
            metrics["grad_norm"] = optax.global_norm(grads)
            return TrainState(params, opt_state, state.step + 1), metrics

        return step

    def _build_ground_step(self):
        cfg, tx, remat = self.cfg, self.tx, self.tcfg.remat
        w = self.tcfg.grounding_loss_weight
        cdt = self._compute_dtype
        merged_fn = self._merged if self._lora_cfg is not None else None

        @functools.partial(jax.jit, donate_argnums=(0,),
                           static_argnames=("with_base",))
        def step(state: TrainState, batch: lv3d.Batch, world_coords, objects,
                 objects_valid, ground_slot, box_label_hot, base=None,
                 with_base: bool = False):
            def lf(p):
                if with_base:
                    p = merged_fn(p, base)
                elif cdt is not None:
                    from video3d_tpu.train.train_step import cast_to_compute
                    p = cast_to_compute(p, cdt)
                loss, metrics = grounding_loss_fn(
                    p, cfg, batch, world_coords, objects, objects_valid,
                    ground_slot, box_label_hot, remat)
                return w * loss, metrics

            (loss, metrics), grads = jax.value_and_grad(lf, has_aux=True)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            metrics = dict(metrics)
            metrics["grad_norm"] = optax.global_norm(grads)
            return TrainState(params, opt_state, state.step + 1), metrics

        if merged_fn is not None:
            return lambda state, batch, *extras: step(
                state, batch, *extras, base=self.base_params, with_base=True)
        return step

    # ------------- data order -------------

    def _epoch_order(self, rng: np.random.Generator):
        bs = self.tcfg.per_device_batch_size * self.mesh.devices.size
        if self.tcfg.group_by == "task_length":
            order = get_task_length_grouped_indices(
                self.dataset.task_lengths, self.tcfg.per_device_batch_size,
                self.mesh.devices.size, rng)
        elif self.tcfg.group_by == "length":
            order = get_length_grouped_indices(
                self.dataset.lengths, self.tcfg.per_device_batch_size,
                self.mesh.devices.size, rng)
        elif self.tcfg.group_by == "modality_length":
            order = get_modality_length_grouped_indices(
                self.dataset.modality_lengths, self.tcfg.per_device_batch_size,
                self.mesh.devices.size, rng)
        else:
            order = list(rng.permutation(len(self.dataset)))
        return batches_from_order(order, bs)

    def _to_batch(self, arrays: Dict[str, np.ndarray]) -> lv3d.Batch:
        model_fields = {k: (jnp.asarray(v) if v is not None else None)
                        for k, v in arrays.items()
                        if k in lv3d.Batch._fields}
        batch = lv3d.Batch(**model_fields)
        # the trainer loads process-local stripes (process_batch_slice in
        # the train loop / evaluate), unlike the engine's host-global path
        return shard_batch(batch, self.mesh, process_local=True)

    # ------------- evaluation (llava_trainer_eval.py equivalent) -------------

    def evaluate(self, eval_dataset=None, max_batches: Optional[int] = None) -> Dict[str, float]:
        """Mean LM loss over an eval dataset (no updates)."""
        dataset = eval_dataset or self.dataset
        bs = self.tcfg.per_device_batch_size * self.mesh.devices.size

        if self._lora_cfg is not None:
            merged_fn = self._merged

            @jax.jit
            def eval_loss_lora(params, base, batch):
                return loss_fn(merged_fn(params, base), self.cfg, batch,
                               remat=False, compute_dtype=None)[0]

            eval_loss = lambda p, b: eval_loss_lora(p, self.base_params, b)
        else:
            @jax.jit
            def eval_loss(params, batch):
                return loss_fn(params, self.cfg, batch, remat=False,
                               compute_dtype=self._compute_dtype)[0]

        losses = []
        with self.mesh:
            for s in range(0, len(dataset) - bs + 1, bs):
                if max_batches is not None and len(losses) >= max_batches:
                    break
                idx = list(range(s, s + bs))
                if jax.process_count() > 1:
                    from video3d_tpu.parallel.mesh import process_batch_slice

                    idx = idx[process_batch_slice(len(idx))]
                samples = [dataset[i] for i in idx]
                batch = self._to_batch(self.collator(samples))
                losses.append(float(eval_loss(self.state.params, batch)))
        return {"eval_loss": float(np.mean(losses)) if losses else float("nan"),
                "eval_batches": len(losses)}

    # ------------- main loop -------------

    def train(self, resume: bool = True) -> TrainState:
        start_step = 0
        if resume:
            latest = ckpt.latest_checkpoint(self.tcfg.output_dir)
            if latest:
                print(f"[trainer] resuming from {latest}")
                self.state = ckpt.restore_checkpoint(latest, self.state)
                if self.tcfg.bf16 and self.tcfg.master_f32:
                    # Orbax restores SAVED dtypes: a checkpoint written by a
                    # pure-bf16 run would restore bf16 params/moments into the
                    # f32 master target, cast_to_compute would no-op, and
                    # training would silently revert to bf16 storage (the
                    # exact lr~1e-5 update-rounding failure master_f32
                    # exists to prevent). Upcast any bf16 leaves back to f32.
                    upcast = lambda x: (x.astype(jnp.float32)
                                        if hasattr(x, "dtype")
                                        and x.dtype == jnp.bfloat16 else x)
                    self.state = TrainState(
                        jax.tree.map(upcast, self.state.params),
                        jax.tree.map(upcast, self.state.opt_state),
                        self.state.step)
                start_step = int(self.state.step)

        rng = np.random.default_rng(self.tcfg.seed)
        global_step = start_step
        consumed = 0        # batches drawn from the data order since epoch 0
        # metrics jsonl from process 0 only (every process computes the same
        # replicated metrics; N writers would duplicate every line)
        metrics_f = None
        if self.tcfg.metrics_file and jax.process_index() == 0:
            parent = os.path.dirname(os.path.abspath(self.tcfg.metrics_file))
            os.makedirs(parent, exist_ok=True)   # commonly the output_dir,
            metrics_f = open(self.tcfg.metrics_file, "a")  # not yet created
        from video3d_tpu.train.prefetch import BatchPrefetcher

        # Preemption safety (beyond reference — the reference relies on a
        # 52-week NCCL timeout, llava_trainer.py:327-328; TPU pods instead
        # get SIGTERM'd): first SIGTERM/SIGINT requests a checkpoint at the
        # next step boundary, then exits cleanly so auto-resume continues.
        import signal

        preempted = {"flag": False}

        def _on_term(signum, frame):
            print(f"[trainer] signal {signum}: checkpoint at next step "
                  "boundary, then exit")
            preempted["flag"] = True

        prev_handlers = {}
        try:
            for sig in (signal.SIGTERM, signal.SIGINT):
                prev_handlers[sig] = signal.signal(sig, _on_term)
        except ValueError:           # not the main thread (tests)
            prev_handlers = {}

        with self.mesh:
            for epoch in range(self.tcfg.num_epochs):
                order = self._epoch_order(rng)
                if not order:
                    # grouped samplers drop the last megabatch per task
                    # (reference parity, llava_trainer.py:263-265) — with a
                    # dataset smaller than one megabatch that leaves nothing
                    print(f"[trainer] WARNING: epoch {epoch} has no batches "
                          f"(dataset of {len(self.dataset)} < one "
                          f"'{self.tcfg.group_by}' megabatch after drop-last)")
                # skip already-trained batches on resume (HF Trainer's
                # skip_first_batches semantics, train_3d.py:1863-1864):
                # `consumed` counts batches drawn from the (deterministic,
                # seed-replayed) epoch order across epochs, independent of
                # global_step — which starts AT start_step, so comparing it
                # against start_step would never skip anything and a resumed
                # run would re-train every batch (round-3 fix; regression
                # test: TestResumeFidelity).
                to_run = []
                for batch_idx in order:
                    if consumed < start_step:
                        consumed += 1
                        continue
                    consumed += 1
                    to_run.append(batch_idx)
                if jax.process_count() > 1:
                    # per-process data loading (the reference's per-rank
                    # DistributedSampler, llava_trainer.py:353-407): the
                    # epoch order is seed-identical on every process; each
                    # loads only its contiguous stripe of every global
                    # batch, and shard_batch assembles the global array
                    # from the process-local rows.
                    from video3d_tpu.parallel.mesh import process_batch_slice

                    to_run = [b[process_batch_slice(len(b))] for b in to_run]
                prefetcher = BatchPrefetcher(self.dataset, self.collator, to_run)
                for arrays in prefetcher:
                    if self.tcfg.pos_skipping_range:
                        arrays = dict(arrays)
                        # per-step derived rng (seed, step) rather than the
                        # shared stream: skipped-on-resume batches draw
                        # nothing, so a resumed run applies the SAME offsets
                        # an uninterrupted run would at each step
                        ps_rng = np.random.default_rng(
                            (self.tcfg.seed, global_step))
                        arrays["position_ids"] = apply_pos_skipping(
                            arrays["position_ids"],
                            self.tcfg.pos_skipping_range, ps_rng)
                    if self.tcfg.profile_steps and \
                            global_step == self.tcfg.profile_steps[0]:
                        jax.profiler.start_trace(self.tcfg.profile_dir)
                    batch = self._to_batch(arrays)
                    t0 = time.time()
                    if "ground_slot" in arrays:
                        keys = ("world_coords_full", "objects", "objects_valid",
                                "ground_slot", "box_label_hot")
                        extras_tree = shard_batch(
                            {k: arrays[k] for k in keys}, self.mesh,
                            process_local=True)
                        extras = [extras_tree[k] for k in keys]
                        self.state, metrics = self._ground_step_fn(
                            self.state, batch, *extras)
                    else:
                        self.state, metrics = self._step_fn(self.state, batch)
                    global_step += 1
                    if self.tcfg.profile_steps and \
                            global_step == self.tcfg.profile_steps[1]:
                        jax.block_until_ready(metrics)
                        jax.profiler.stop_trace()
                        print(f"[trainer] profile -> {self.tcfg.profile_dir}")
                    if global_step % self.tcfg.logging_steps == 0:
                        vals = {k: float(v) for k, v in metrics.items()}
                        step_time = time.time() - t0
                        print(f"[trainer] step {global_step} "
                              f"{vals} ({step_time:.2f}s)")
                        if metrics_f:
                            import json as _json

                            metrics_f.write(_json.dumps(
                                {"step": global_step, "epoch": epoch,
                                 "step_time_s": step_time, **vals}) + "\n")
                            metrics_f.flush()
                    if preempted["flag"] or \
                            global_step % self.tcfg.save_steps == 0:
                        path = ckpt.save_checkpoint(self.tcfg.output_dir,
                                                    global_step, self.state)
                        print(f"[trainer] saved {path}")
                    if preempted["flag"]:
                        prefetcher.close()
                        if metrics_f:
                            metrics_f.close()
                        for sig, h in prev_handlers.items():
                            signal.signal(sig, h)
                        print(f"[trainer] preempted at step {global_step}; "
                              "checkpoint saved, exiting for resume")
                        return self.state
        for sig, h in prev_handlers.items():
            signal.signal(sig, h)
        if metrics_f:
            metrics_f.close()
        # final export in bf16, the reference's
        # stage3_gather_16bit_weights_on_model_save (zero3.json:32): the f32
        # master copy is an optimizer detail, not the published model
        export = self.state.params
        if self.tcfg.bf16 and self.tcfg.master_f32:
            export = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                export)
        ckpt.save_params_only(self.tcfg.output_dir, export)
        if self._lora_cfg is not None and jax.process_index() == 0:
            # the exported "model" tree holds adapters + non-LoRA
            # trainables, not full weights (the reference's LoRA split
            # save, llava_trainer.py:560-578). Record the merge scale so
            # the load side (cli --lora-path) can reconstruct
            # LoraConfig(r, alpha) — alpha/r is not recoverable from the
            # adapter shapes alone.
            import json as _json
            import os as _os

            with open(_os.path.join(self.tcfg.output_dir,
                                    "lora.json"), "w") as f:
                _json.dump({"r": self._lora_cfg.r,
                            "alpha": self._lora_cfg.alpha,
                            "bits": self.tcfg.lora_bits}, f)
        return self.state
