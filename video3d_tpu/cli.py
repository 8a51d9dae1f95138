"""Command-line entry points.

``python -m video3d_tpu.cli train ...`` replaces the reference's
``torchrun llava/train/train_3d.py`` (train_multi.sh), and
``python -m video3d_tpu.cli eval-{scanqa,sqa3d,scan2cap,scanrefer,
multi3drefer} ...`` replaces the Ray drivers + scripts/3d/eval/*.sh.
No process launcher is needed: one process per host drives all local TPU
chips through the (dp, fsdp, tp) mesh; multi-host runs call
``jax.distributed.initialize`` first.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _load_tokenizer(path: str):
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(path)


def _overrides(args):
    """CLI flags the user explicitly set -> HF config.json key overrides.

    Flag defaults are ``None`` sentinels so a checkpoint's persisted 3D knobs
    (train_3d.py:1425-1475 writes them into config.json) win unless the user
    overrides them — mirroring the reference eval drivers' ``overwrite_config``
    (model_scanqa.py:94-101).
    """
    keys = {"world_position_embedding_type": args.world_position_embedding_type,
            "voxel_size": args.voxel_size,
            "min_xyz_range": args.min_xyz_range,
            "max_xyz_range": args.max_xyz_range,
            "ground_head_type": args.ground_head_type}
    return {k: v for k, v in keys.items() if v is not None}


def _model_cfg(args):
    """ModelConfig from flags alone (orbax checkpoints carry no config.json)."""
    from video3d_tpu.config import (GroundHeadType, ModelConfig, VoxelConfig,
                                    World3DConfig)

    w3d = World3DConfig.from_reference_string(
        args.world_position_embedding_type or "avg-discrete-sin3d",
        VoxelConfig(voxel_size=args.voxel_size or 0.1,
                    min_xyz_range=tuple(args.min_xyz_range or (-15, -15, -5)),
                    max_xyz_range=tuple(args.max_xyz_range or (15, 15, 5))))
    return ModelConfig(world_3d=w3d,
                       ground_head=GroundHeadType(args.ground_head_type
                                                  or "infonce"))


def _add_model_args(p):
    p.add_argument("--world-position-embedding-type", default=None,
                   dest="world_position_embedding_type")
    p.add_argument("--voxel-size", type=float, default=None)
    p.add_argument("--min-xyz-range", type=float, nargs=3, default=None)
    p.add_argument("--max-xyz-range", type=float, nargs=3, default=None)
    p.add_argument("--ground-head-type", default=None)
    p.add_argument("--model-path", required=True,
                   help="HF-format checkpoint dir (safetensors) or orbax dir")
    p.add_argument("--tokenizer-path", default=None)


def _add_data_args(p):
    p.add_argument("--video-folder", default="data")
    p.add_argument("--embodiedscan-folder", default="data/embodiedscan")
    p.add_argument("--metadata-folder", default="data/metadata")
    p.add_argument("--frame-sampling-strategy", default="uniform")
    p.add_argument("--max-frame-num", type=int, default=32)


def _data_cfg(args):
    from video3d_tpu.config import DataConfig, FrameSampling

    return DataConfig(video_folder=args.video_folder,
                      annotation_dir=args.embodiedscan_folder,
                      metadata_dir=args.metadata_folder,
                      frames_upbound=args.max_frame_num,
                      frame_sampling=FrameSampling(args.frame_sampling_strategy),
                      add_spatial_instruction=getattr(
                          args, "add_spatial_instruction", True))


def _load_model(args):
    """Checkpoint dir -> (params, ModelConfig), bf16.

    HF-format dirs (config.json + safetensors) go through the builder so the
    checkpoint's own architecture and persisted 3D knobs are used, with CLI
    flags as explicit overrides; orbax dirs carry no config and take the
    architecture entirely from flags.
    """
    import jax.numpy as jnp

    pe = args.world_position_embedding_type
    if pe is not None and not any(
            t in pe for t in ("sin3d", "mlp", "mrope", "llava3d", "none")):
        raise SystemExit(
            f"--world-position-embedding-type {pe!r}: expected a reference-"
            "style string containing one of sin3d/mlp/mrope/llava3d/none "
            "(e.g. 'avg-discrete-sin3d')")

    path = args.model_path
    if os.path.isfile(os.path.join(path, "config.json")):
        from video3d_tpu.models.builder import load_pretrained_model

        _, params, cfg, _ = load_pretrained_model(
            path, overwrite_config=_overrides(args), dtype=jnp.bfloat16,
            load_tokenizer=False)
        return params, cfg
    import orbax.checkpoint as ocp

    params = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
    return params, _model_cfg(args)


def _maybe_merge_lora(params, args):
    """--lora-path: merge a Trainer LoRA/QLoRA export (the orbax
    adapters + non-LoRA-trainables tree under ``<run>/model``, with
    ``<run>/lora.json`` carrying r/alpha/bits) into the loaded base
    weights — the native counterpart of the builder's HF lora-merge
    branch (model/builder.py:54-117).

    bits 8/4 in lora.json means the adapters were trained against the
    QUANTIZED frozen base (they compensate its rounding), so serving
    reproduces that forward exactly: quantize the base to the recorded
    bits first, then keep the adapters LAZY (LoraAdapted nodes the quant
    matmul evaluates) instead of a bf16 merge. bits 16 merges densely.
    Runs BEFORE any --load-in-8bit/4bit flag, which then has nothing
    left to do on already-quantized leaves."""
    lp = getattr(args, "lora_path", None)
    if not lp:
        return params
    from video3d_tpu.train.lora import (apply_lora, load_lora_export,
                                        merge_lora_into_params)

    # peek at lora.json first: bits 8/4 adapters need the base quantized
    # BEFORE the restore target is built from it
    run_dir = os.path.dirname(os.path.abspath(lp))
    with open(os.path.join(run_dir, "lora.json")) as f:
        bits = int(json.load(f).get("bits", 16))
    if bits in (8, 4):
        from video3d_tpu.models.quant import quantize_tree

        params = quantize_tree(params, bits=bits)
    lora, lcfg, _ = load_lora_export(lp, params)
    if bits in (8, 4):
        return apply_lora(params, lora, lcfg)
    return merge_lora_into_params(params, lora, lcfg)


def cmd_train(args):
    from video3d_tpu.data.dataset import Collator, CollatorConfig, SupervisedDataset
    from video3d_tpu.data.image_processor import SigLipImageProcessor
    from video3d_tpu.train.optim import OptimConfig
    from video3d_tpu.train.trainer import Trainer, TrainingConfig

    if args.bits != 16 and not args.lora_enable:
        raise SystemExit("--bits 8/4 quantizes the FROZEN base and only "
                         "makes sense with --lora-enable (QLoRA); int8 "
                         "weights cannot take optimizer updates")

    if getattr(args, "load_format", "auto") == "dummy":
        # vLLM --load-format dummy for TRAINING rehearsal: the checkpoint
        # dir supplies only config.json (+ tokenizer files); the base is
        # initialized layer-by-layer ON DEVICE, pre-quantized to --bits when
        # QLoRA is on (quantize_tree passes already-quantized leaves
        # through, so the Trainer runs the identical program a real
        # checkpoint would). Adapters trained this way compensate a RANDOM
        # base — perf/bring-up rehearsal only, never a usable model.
        from video3d_tpu.models.builder import load_dummy_model

        _, params, model_cfg = load_dummy_model(
            args.model_path, bits=(args.bits if args.lora_enable else 16),
            overwrite_config=_overrides(args), load_tokenizer=False)
    else:
        params, model_cfg = _load_model(args)
    data_cfg = _data_cfg(args)
    tokenizer = _load_tokenizer(args.tokenizer_path or args.model_path)
    tokenizer.add_tokens(["<ground>", "<coord>"], special_tokens=True)

    dataset = SupervisedDataset(
        args.data_path, tokenizer, data_cfg,
        image_processor=SigLipImageProcessor(
            size=(model_cfg.vision.image_size,) * 2))
    collator = Collator(model_cfg, CollatorConfig(
        max_len=args.max_len, frames_upbound=args.max_frame_num,
        coord_token_id=tokenizer.convert_tokens_to_ids("<coord>"),
        ground_token_id=tokenizer.convert_tokens_to_ids("<ground>")))
    steps = len(dataset) * args.num_epochs // max(1, args.global_batch_size)

    # mm_tunable_parts -> pytree prefixes (train_3d.py:1758-1829; world-PE
    # params and the ground head always train, :1818-1829)
    part_map = {"mm_language_model": ("llm",),
                "mm_vision_tower": ("vision",),
                "mm_mlp_adapter": ("projector", "image_newline")}
    tunable = ("ground_head", "world_pe_mlp")
    for part in args.mm_tunable_parts.split(","):
        tunable += part_map.get(part.strip(), ())

    trainer = Trainer(
        model_cfg, params, dataset, collator,
        OptimConfig(learning_rate=args.learning_rate,
                    mm_vision_tower_lr=args.mm_vision_tower_lr,
                    mm_projector_lr=args.mm_projector_lr,
                    warmup_ratio=args.warmup_ratio, total_steps=max(1, steps),
                    tunable_prefixes=tunable),
        TrainingConfig(output_dir=args.output_dir, num_epochs=args.num_epochs,
                       per_device_batch_size=args.per_device_batch_size,
                       gradient_accumulation_steps=args.gradient_accumulation_steps,
                       save_steps=args.save_steps, group_by=args.group_by,
                       metrics_file=args.metrics_file,
                       master_f32=(args.master_dtype == "float32"),
                       lora_r=(args.lora_r if args.lora_enable else 0),
                       lora_alpha=args.lora_alpha,
                       lora_bits=args.bits,
                       dp=args.dp, tp=args.tp, sp=args.sp))
    trainer.train(resume=not args.no_resume)


def cmd_eval(args, task: str):
    import jax

    from video3d_tpu.data.video_processor import VideoProcessor
    from video3d_tpu.eval import drivers

    w8a8 = getattr(args, "w8a8", False)
    quant_bits = (4 if getattr(args, "load_in_4bit", False)
                  else 8 if getattr(args, "load_in_8bit", False) or w8a8
                  else 16)
    quant_act = "int8" if w8a8 and quant_bits != 4 else "none"
    if getattr(args, "load_format", "auto") == "dummy":
        # vLLM --load-format dummy equivalent: the checkpoint dir supplies
        # config.json (architecture + persisted 3D knobs) and the tokenizer;
        # weights are random, initialized layer-by-layer ON DEVICE with the
        # quantization folded into the init (a full bf16 7B tree never
        # exists, so dummy-int8 runs on one 16 GB chip). Perf rehearsal /
        # bring-up of real-checkpoint configs without shipping weights.
        if getattr(args, "lora_path", None):
            raise SystemExit("--load-format dummy has no real base weights "
                             "to merge --lora-path into")
        from video3d_tpu.models.builder import load_dummy_model

        _, params, model_cfg = load_dummy_model(
            args.model_path, bits=quant_bits, act=quant_act,
            overwrite_config=_overrides(args), load_tokenizer=False)
    else:
        params, model_cfg = _load_model(args)
        params = _maybe_merge_lora(params, args)
        if quant_bits != 16:
            # reference bitsandbytes branches (model/builder.py quantization
            # kwargs, train_3d.py load_in_{8,4}bit): weight-only quantization
            # of the LLM projections + lm_head (models/quant.py; int4 streams
            # through the pallas matvec kernel). --w8a8 additionally marks
            # the int8 weights for dynamic-activation int8 matmuls.
            from video3d_tpu.models.quant import quantize_tree

            params = quantize_tree(params, bits=quant_bits, act=quant_act)
    data_cfg = _data_cfg(args)
    tokenizer = _load_tokenizer(args.tokenizer_path or args.model_path)
    tokenizer.add_tokens(["<ground>", "<coord>"], special_tokens=True)

    with open(args.question_file) as f:
        questions = json.load(f) if args.question_file.endswith(".json") else \
            [json.loads(l) for l in f]
    questions = questions[args.rank::args.world]

    mesh = None
    if getattr(args, "tp", 1) > 1 or getattr(args, "dp", 1) > 1:
        from video3d_tpu.parallel.mesh import create_mesh

        mesh = create_mesh(dp=args.dp, fsdp=1, tp=args.tp,
                           devices=jax.devices()[: args.dp * args.tp])
    engine = drivers.InferenceEngine(
        params, model_cfg, tokenizer, VideoProcessor(data_cfg),
        mesh=mesh,
        engine_cfg=drivers.EngineConfig(
            max_new_tokens=args.max_new_tokens,
            eos_token_id=tokenizer.eos_token_id,
            max_frames=args.max_frame_num,
            ground_token_id=tokenizer.convert_tokens_to_ids("<ground>"),
            kv_cache_dtype=args.kv_cache_dtype,
            temperature=args.temperature, top_p=args.top_p,
            top_k=args.top_k, num_beams=args.num_beams,
            length_penalty=args.length_penalty,
            speculative_draft_layers=args.spec_draft_layers,
            speculative_k=args.spec_k,
            speculative_draft_vocab=args.spec_draft_vocab,
            scene_cache_scenes=args.scene_cache,
            prefix_cache_scenes=args.prefix_cache))
    if task == "scan2cap":
        times = drivers.run_generative(
            engine, questions, args.answer_file, gt_from_annotations=True,
            coord_token_id=tokenizer.convert_tokens_to_ids("<coord>"),
            batch_size=args.batch_size)
    elif task in ("scanqa", "sqa3d"):
        times = drivers.run_generative(engine, questions, args.answer_file,
                                       batch_size=args.batch_size)
    elif task == "scanrefer":
        times = drivers.run_scanrefer(engine, questions, args.answer_file,
                                      batch_size=args.batch_size)
    else:
        times = drivers.run_multi3drefer(engine, questions, args.answer_file,
                                         batch_size=args.batch_size)
    print(f"mean inference time: {np.mean(times):.3f}s over {len(times)} samples")


def main(argv=None):
    parser = argparse.ArgumentParser("video3d_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    pt = sub.add_parser("train")
    _add_model_args(pt)
    _add_data_args(pt)
    # the reference's data_args.add_spatial_instruction (train_3d.py:1262):
    # training prepends the 3D-spatial instruction to turn 0. NOTE the
    # reference's EVAL scripts only prepend their --extra-prompt to the
    # LOGGED prompt (model_scanqa.py:140 cur_prompt), never to the model
    # input, so eval prompts deliberately lack the instruction.
    pt.add_argument("--add-spatial-instruction", dest="add_spatial_instruction",
                    action="store_true", default=True)
    pt.add_argument("--no-spatial-instruction", dest="add_spatial_instruction",
                    action="store_false")
    pt.add_argument("--data-path", required=True)
    pt.add_argument("--output-dir", required=True)
    pt.add_argument("--num-epochs", type=int, default=1)
    pt.add_argument("--per-device-batch-size", type=int, default=1)
    pt.add_argument("--gradient-accumulation-steps", type=int, default=2)
    pt.add_argument("--global-batch-size", type=int, default=16)
    pt.add_argument("--learning-rate", type=float, default=1e-5)
    pt.add_argument("--mm-vision-tower-lr", type=float, default=2e-6)
    pt.add_argument("--mm-projector-lr", type=float, default=None)
    pt.add_argument("--mm-tunable-parts",
                    default="mm_language_model,mm_vision_tower,mm_mlp_adapter")
    pt.add_argument("--metrics-file", default=None)
    pt.add_argument("--warmup-ratio", type=float, default=0.03)
    pt.add_argument("--save-steps", type=int, default=1000)
    pt.add_argument("--group-by", default="task_length")
    pt.add_argument("--max-len", type=int, default=8192)
    pt.add_argument("--master-dtype", default="float32",
                    choices=("float32", "bfloat16"),
                    help="optimizer master-weight dtype; float32 (default) "
                         "matches the reference's DeepSpeed-bf16 fp32 "
                         "master partitions — bfloat16 saves one f32-vs-"
                         "bf16 param tree per shard but rounds away "
                         "lr~1e-5 updates")
    pt.add_argument("--dp", type=int, default=1)
    pt.add_argument("--tp", type=int, default=1)
    pt.add_argument("--sp", type=int, default=1)
    pt.add_argument("--no-resume", action="store_true")
    # LoRA / QLoRA (reference train_3d.py lora_enable + bits branches)
    pt.add_argument("--lora-enable", action="store_true",
                    help="train LoRA adapters on the LLM (base frozen) "
                         "plus the non-LoRA trainables (projector, "
                         "world-PE, ground head)")
    pt.add_argument("--lora-r", type=int, default=128)
    pt.add_argument("--lora-alpha", type=int, default=256)
    pt.add_argument("--load-format", choices=("auto", "dummy"),
                    default="auto",
                    help="'dummy' initializes a random base on device from "
                    "config.json alone (vLLM load_format=dummy): training-"
                    "path rehearsal at architectures whose weights are "
                    "unavailable or too large to ship over a slow link")
    pt.add_argument("--bits", type=int, default=16, choices=(16, 8, 4),
                    help="freeze the base in bf16 (16) or quantize it to "
                         "int8/int4 (QLoRA; requires --lora-enable)")

    for task in ("scanqa", "sqa3d", "scan2cap", "scanrefer", "multi3drefer"):
        pe = sub.add_parser(f"eval-{task}")
        _add_model_args(pe)
        _add_data_args(pe)
        pe.add_argument("--question-file", required=True)
        pe.add_argument("--answer-file", required=True)
        pe.add_argument("--rank", type=int, default=0)
        pe.add_argument("--world", type=int, default=1)
        pe.add_argument("--batch-size", type=int, default=1)
        pe.add_argument("--max-new-tokens", type=int, default=512)
        pe.add_argument("--kv-cache-dtype",
                        choices=("bfloat16", "int8", "int4"),
                        default="bfloat16")
        # weight-only quantization (reference load_in_{8,4}bit flags)
        pe.add_argument("--load-in-8bit", action="store_true")
        pe.add_argument("--load-in-4bit", action="store_true")
        pe.add_argument("--load-format", choices=("auto", "dummy"),
                        default="auto",
                        help="'dummy' initializes random weights on device "
                        "from config.json alone (vLLM load_format=dummy): "
                        "perf rehearsal of a checkpoint architecture "
                        "without shipping its weights")
        pe.add_argument("--lora-path", default=None,
                        help="Trainer LoRA/QLoRA export (the <run>/model "
                             "orbax dir; <run>/lora.json must exist) to "
                             "merge into the base weights before serving")
        # dynamic-activation int8 matmuls on top of int8 weights (an HBM
        # lever: measured 1.54x on the 7B prefill chain, BENCH_NOTES);
        # implies --load-in-8bit
        pe.add_argument("--w8a8", action="store_true")
        # multi-chip inference: shard over a tp x dp serving mesh
        # (tp*dp chips; required when the model exceeds one chip's HBM)
        pe.add_argument("--tp", type=int, default=1)
        pe.add_argument("--dp", type=int, default=1)
        # reference generate kwargs (model_scanqa.py:176-180, :228-230)
        pe.add_argument("--temperature", type=float, default=0.0)
        pe.add_argument("--top-p", type=float, default=1.0)
        pe.add_argument("--top-k", type=int, default=0)
        pe.add_argument("--num-beams", type=int, default=1)
        pe.add_argument("--length-penalty", type=float, default=1.0)
        # speculative decoding (beyond-reference): early-exit self-draft of
        # N target layers verifying --spec-k tokens per target forward
        pe.add_argument("--spec-draft-layers", type=int, default=0)
        pe.add_argument("--spec-k", type=int, default=4)
        pe.add_argument("--spec-draft-vocab", type=int, default=0)
        # scene-level vision-feature LRU (answers identical; the tower runs
        # once per scene instead of once per question). 0 disables.
        pe.add_argument("--scene-cache", type=int, default=8)
        # scene-PREFIX KV LRU (answers identical at bf16 KV): later
        # questions on a scene prefill only their suffix against the cached
        # prefix KV — skips video IO, geometry, the tower and ~95% of
        # prefill FLOPs (models/generate.py start_decode_prefix). 0 disables.
        pe.add_argument("--prefix-cache", type=int, default=4)

    args = parser.parse_args(argv)
    if args.cmd == "train":
        cmd_train(args)
    else:
        cmd_eval(args, args.cmd.removeprefix("eval-"))


if __name__ == "__main__":
    main()
