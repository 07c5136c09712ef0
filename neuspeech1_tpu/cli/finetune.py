"""Fine-tune CLI — TPU-native counterpart of reference `finetune.py`.

Flag surface mirrors `finetune.py:25-64`; the HF Trainer + PEFT stack is
replaced by the jitted train step, optax AdamW, Orbax gated checkpoints and
the ('data','fsdp','tensor') mesh. Cross-dataset transfer (load a previous
run's adapters, merge them, re-init the stem on channel mismatch —
`finetune.py:150-163`) is supported via --lora_model/--lora_eeg_ch.

Example (synthetic smoke run):
  python -m neuspeech1_tpu.cli.finetune --train_data=/tmp/c/train.jsonl \
      --val_data=/tmp/c/val.jsonl --base_model=random --tokenizer=byte \
      --eeg_ch=8 --d_model=64 --encoder_layers=2 --decoder_layers=2 \
      --encoder_heads=2 --decoder_heads=2 --encoder_ffn=128 --decoder_ffn=128 \
      --max_source_positions=64 --max_target_positions=48 --bf16=False \
      --max_steps=20 --per_device_train_batch_size=4 --output_dir=/tmp/out
"""

from __future__ import annotations

import argparse
import functools
import json
import os


def build_parser() -> argparse.ArgumentParser:
    from neuspeech1_tpu.utils.args import add_arguments

    parser = argparse.ArgumentParser(description=__doc__)
    add_arg = functools.partial(add_arguments, argparser=parser)
    # data (reference finetune.py:25-42)
    add_arg("train_data", str, None, "train jsonl manifest")
    add_arg("val_data", str, None, "validation jsonl manifest")
    add_arg("test_data", str, None, "optional test jsonl manifest")
    add_arg("language", str, "English", "dataset language (None = per-row)")
    add_arg("task", str, "transcribe",
            "label-prefix task token: transcribe|translate "
            "(reference finetune.py:51)")
    add_arg("timestamps", bool, False, "train with timestamp labels")
    add_arg("combine_sentences", bool, False, "random sentence combining aug")
    add_arg("split_sentences", bool, False, "random sentence splitting aug")
    add_arg("filter_dataset", bool, False, "keep only ZINNEN <30s rows")
    add_arg("subj", int, None, "restrict to one subject id")
    add_arg("data_ratio", float, 1.0, "use the first fraction of the data")
    add_arg("augment_config_path", str, None, "augmentation JSON path")
    add_arg("eeg_ch", int, 208, "signal channels (208 gwilliams/273 schoffelen)")
    add_arg("channel_slice", str, None, "named channel preset or None")
    add_arg("min_audio_len", float, 0.5, "min clip seconds")
    add_arg("max_audio_len", float, 30.0, "max clip seconds")
    # model
    add_arg("base_model", str, "random", "npz / HF dir / 'random'")
    add_arg("tokenizer", str, "byte", "'byte' or HF tokenizer dir")
    add_arg("model_size", str, None, "whisper preset: tiny|base|small|medium|large")
    add_arg("stem_kind", str, "base", "projection stem: base|replace|speech")
    add_arg("modal", str, "eeg", "eeg or speech")
    add_arg("d_model", int, None, "override d_model")
    add_arg("encoder_layers", int, None, "override encoder layers")
    add_arg("decoder_layers", int, None, "override decoder layers")
    add_arg("encoder_heads", int, None, "override encoder heads")
    add_arg("decoder_heads", int, None, "override decoder heads")
    add_arg("encoder_ffn", int, None, "override encoder ffn")
    add_arg("decoder_ffn", int, None, "override decoder ffn")
    add_arg("max_source_positions", int, None, "override source positions")
    add_arg("max_target_positions", int, None, "override target positions")
    add_arg("bf16", bool, True, "bf16 compute (fp32 otherwise)")
    add_arg("remat", str, "auto",
            "rematerialize transformer layers: auto|true|false (auto = "
            "remat only when the faster no-remat step won't fit HBM; "
            "train/memory.py, shared with bench.py)")
    # adapters (reference finetune.py:189-212)
    add_arg("use_adalora", bool, True, "AdaLoRA (True) or plain LoRA (False)")
    add_arg("lora_rank", int, None, "LoRA rank (default 32; AdaLoRA init_r 12)")
    add_arg("lora_alpha", float, None, "LoRA alpha (default 64; AdaLoRA 32)")
    add_arg("adalora_target_r", int, 4, "AdaLoRA target rank")
    add_arg("adalora_tinit", int, 200, "AdaLoRA warmup steps")
    add_arg("adalora_tfinal", int, 1000, "AdaLoRA final steps")
    add_arg("adalora_deltaT", int, 10, "AdaLoRA reallocation interval")
    add_arg("orth_reg_weight", float, 0.5, "AdaLoRA orthogonal reg weight")
    add_arg("ft_full", bool, False, "full fine-tune (no adapters)")
    add_arg("fine_tune_layers", int, None,
            "adapt only the FIRST n encoder layers (reference "
            "finetune.py:190 range(n) semantics)")
    add_arg("lora_model", str, None, "pretrained adapter npz to merge first")
    add_arg("lora_eeg_ch", int, None, "channel count of --lora_model's stem")
    # training (reference finetune.py:231-253)
    add_arg("output_dir", str, "output/", "checkpoints + logs dir")
    add_arg("learning_rate", float, 1e-3, "peak lr")
    add_arg("warmup_steps", int, 500, "lr warmup steps")
    add_arg("num_train_epochs", int, 500, "epochs (ignored if max_steps)")
    add_arg("max_steps", int, None, "hard step limit")
    add_arg("per_device_train_batch_size", int, 64, "train batch per device")
    add_arg("per_device_eval_batch_size", int, 64, "eval batch per device")
    add_arg("gradient_accumulation_steps", int, 1, "optax MultiSteps accum")
    add_arg("eval_steps", int, 1000, "eval interval")
    add_arg("save_steps", int, 1000, "save interval")
    add_arg("logging_steps", int, 100, "log interval")
    add_arg("save_total_limit", int, 5, "max checkpoints kept")
    add_arg("resume_from_checkpoint", str, None,
            "resume: True/latest = newest saved step, an integer = that "
            "step (reference takes a checkpoint path, finetune.py:53)")
    add_arg("eval_wer", bool, False,
            "greedy-decode the val set at each eval and log WER/BLEU-1")
    add_arg("export_full_model", bool, False,
            "also write output_dir/full_model with adapters merged "
            "(reference SaveFullModelCallback, utils/callback.py:55-72)")
    add_arg("fold_lora_in_step", bool, True,
            "materialize adapter deltas into weights once per step "
            "(measured 14% faster than per-token low-rank matmuls)")
    add_arg("int8_matmul", str, "off",
            "AQT-style int8 training matmuls on the int8 MXU: off|fwd|full "
            "(fwd = forward dots only, full = forward + dx/dW dots; "
            "dynamic per-vector symmetric scales, straight-through "
            "gradients — TPU analog of the reference's load_in_8bit)")
    add_arg("num_workers", int, 4, "loader threads")
    add_arg("device_cache", str, "auto",
            "stage the whole train set in HBM and sample on-device: "
            "auto|on|off (auto = when it fits the budget and no per-item "
            "signal transforms are active; noise/mask/taylor still run "
            "on-device inside the train step)")
    add_arg("device_cache_budget_mb", int, 4096,
            "HBM budget for --device_cache=auto")
    add_arg("device_cache_shard_repeats", int, 4,
            "bigger-than-budget corpora rotate through HBM-resident shards; "
            "passes per resident shard while the next stages (raise on "
            "transfer-starved hosts)")
    add_arg("native_loader", str, "auto",
            "C++ batch signal loader: auto|on|off (auto = use when no "
            "per-item augmentation and the toolchain builds)")
    add_arg("weight_decay", float, 0.0, "AdamW weight decay")
    add_arg("max_grad_norm", float, 1.0, "gradient clipping")
    add_arg("label_max_length", int, 128, "static label pad length")
    # mesh
    add_arg("coordinator", str, None,
            "multi-host coordinator address host:port (jax.distributed)")
    add_arg("mesh_data", int, -1, "data-parallel mesh axis (-1 = all)")
    add_arg("mesh_fsdp", int, 1, "fsdp mesh axis")
    add_arg("mesh_tensor", int, 1, "tensor-parallel mesh axis")
    add_arg("seed", int, 0, "global seed")
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    from neuspeech1_tpu.utils.args import print_arguments

    print_arguments(args)
    # Multi-host bring-up must precede EVERY other jax touchpoint (including
    # the compilation cache, which initializes the backend).
    from neuspeech1_tpu.parallel.mesh import initialize_distributed

    initialize_distributed(args.coordinator)

    from neuspeech1_tpu import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from neuspeech1_tpu.cli import common
    from neuspeech1_tpu.config import StemConfig
    from neuspeech1_tpu.data.collate import Collator
    from neuspeech1_tpu.data.dataset import EEGDataset
    from neuspeech1_tpu.data.loader import DataLoader
    from neuspeech1_tpu.models.lora import init_lora, merge_lora
    from neuspeech1_tpu.models.init import init_stem
    from neuspeech1_tpu.parallel.mesh import batch_sharding, make_mesh
    from neuspeech1_tpu.parallel.sharding import shard_params
    from neuspeech1_tpu.train import optimizer as opt
    from neuspeech1_tpu.train import trainstep as ts
    from neuspeech1_tpu.train.trainer import Trainer

    config = common.parse_config_overrides(args)
    if args.modal == "speech":
        stem = StemConfig("speech")
    else:
        stem = StemConfig(args.stem_kind, in_channels=args.eeg_ch)
    tokenizer = common.resolve_tokenizer(args.tokenizer, config)
    config = tokenizer.config

    augment_config = None
    if args.augment_config_path:
        with open(args.augment_config_path) as f:
            augment_config = json.load(f)
    # split augmentation: shift needs per-item CPU (transcript realignment);
    # noise/mask/taylor run on-device inside the jitted train step
    cpu_augment = None
    device_augment = None
    if augment_config:
        cpu_augment = {k: v for k, v in augment_config.items() if k == "shift"}
        device_augment = {k: v for k, v in augment_config.items()
                          if k in ("noise", "mask", "taylor")} or None

    # ---- datasets / loaders -----------------------------------------
    def make_ds(path, mode):
        if args.modal == "speech":
            from neuspeech1_tpu.data.dataset import SpeechDataset

            return SpeechDataset(path, tokenizer, language=args.language,
                                 task=args.task,
                                 n_mels=config.num_mel_bins, mode=mode)
        return EEGDataset(
            path, tokenizer, mode=mode, modal_ch=args.eeg_ch,
            channel_slice=args.channel_slice, language=args.language,
            task=args.task,
            filter_dataset=args.filter_dataset, timestamps=args.timestamps,
            min_duration=args.min_audio_len, max_duration=args.max_audio_len,
            combine_sentences=args.combine_sentences,
            split_sentences=args.split_sentences, subj=args.subj,
            augment_config=cpu_augment if mode == "train" else None,
            seed=args.seed,
        )

    train_ds = make_ds(args.train_data, "train")
    if args.data_ratio < 1.0:
        train_ds.rows = train_ds.rows[: int(len(train_ds.rows) * args.data_ratio)]
    val_ds = make_ds(args.val_data, "eval") if args.val_data else None

    collator = Collator(
        pad_id=tokenizer.pad_id, decoder_start_id=config.sot_id,
        max_label_len=args.label_max_length,
        feature_dtype="bfloat16" if args.bf16 else "float32",
        eot_id=config.eot_id,
    )
    mesh = make_mesh(args.mesh_data, args.mesh_fsdp, args.mesh_tensor)

    def use_native(ds) -> bool:
        if args.native_loader == "off" or args.modal == "speech":
            return False
        if not ds.supports_native_signals():
            if args.native_loader == "on":
                raise ValueError("--native_loader=on but augmentation is active")
            return False
        from neuspeech1_tpu.data.native_loader import native_available

        ok = native_available()
        if args.native_loader == "on" and not ok:
            raise RuntimeError("--native_loader=on but the C++ loader "
                               "failed to build")
        return ok

    def corpus_bytes(ds) -> int:
        # bf16 features dominate
        return len(ds) * args.eeg_ch * int(args.max_audio_len * 200) * 2

    # ---- remat resolution (one decision function, shared with bench.py:
    # 'auto' = the fast no-remat step iff params + optimizer + cached
    # corpus + saved activations fit the HBM budget) ------------------
    cache_eligible = (
        args.modal == "eeg" and args.device_cache != "off"
        and not (cpu_augment and cpu_augment.get("shift", {}).get("prob", 0))
        and not args.combine_sentences and not args.split_sentences
        and jax.process_count() == 1
    )
    would_cache = cache_eligible and (
        corpus_bytes(train_ds) <= args.device_cache_budget_mb * 2**20
    )
    from neuspeech1_tpu.train import memory as trainmem

    remat = trainmem.resolve_remat(
        args.remat, config, stem, args.per_device_train_batch_size,
        trainable_count=trainmem.trainable_count_estimate(
            config, stem, ft_full=args.ft_full, lora_rank=args.lora_rank,
            adalora=args.use_adalora),
        corpus_bytes=corpus_bytes(train_ds) if would_cache else 0,
        label_len=args.label_max_length,
    )
    if str(args.remat).lower() == "auto":
        print(f"[finetune] --remat=auto -> remat={remat}", flush=True)
    if remat != config.remat:
        import dataclasses

        config = dataclasses.replace(config, remat=remat)

    use_cache = False
    use_rotating = False
    if args.modal == "eeg" and args.device_cache != "off":
        eligible = (
            not (cpu_augment and cpu_augment.get("shift", {}).get("prob", 0))
            and not args.combine_sentences and not args.split_sentences
            and jax.process_count() == 1
        )
        budget_mb = args.device_cache_budget_mb
        if not remat and budget_mb > 1536:
            # without remat the saved activations claim most of HBM
            # (whisper-base bs64 ~10 GB of 16); shrink the AUTO cache budget
            # so staging the corpus cannot push training out of memory
            budget_mb = 1536
            if args.device_cache == "auto":
                print("[finetune] --remat=False: device_cache auto budget "
                      f"capped at {budget_mb} MB (activations need the HBM; "
                      "pass --device_cache_budget_mb to override with "
                      "--device_cache=on)", flush=True)
        fits = corpus_bytes(train_ds) <= budget_mb * 2**20
        if args.device_cache == "on":
            if not eligible:
                raise ValueError("--device_cache=on needs per-item signal "
                                 "transforms off (shift/combine/split)")
            use_cache = True
        else:
            use_cache = eligible and fits
        # bigger-than-budget corpus: rotate HBM-resident shards instead of
        # falling all the way back to per-batch streaming
        use_rotating = (not use_cache) and eligible and not fits

    if use_cache:
        from neuspeech1_tpu.data.device_cache import DeviceCache

        print(f"[finetune] staging {len(train_ds)} clips "
              f"(~{corpus_bytes(train_ds)/2**20:.0f} MB) into HBM", flush=True)
        cache = DeviceCache.build(train_ds, collator)
        train_loader = cache.loader(args.per_device_train_batch_size,
                                    seed=args.seed)
    elif use_rotating:
        from neuspeech1_tpu.data.rotating_cache import RotatingDeviceCache

        per_clip = corpus_bytes(train_ds) // max(len(train_ds), 1)
        shard_clips = RotatingDeviceCache.shards_for_budget(
            budget_mb * 2**20, per_clip)
        shard_clips = max(shard_clips, args.per_device_train_batch_size)
        print(f"[finetune] corpus (~{corpus_bytes(train_ds)/2**20:.0f} MB) "
              f"exceeds the {budget_mb} MB cache budget: rotating "
              f"{shard_clips}-clip HBM shards x"
              f"{args.device_cache_shard_repeats} repeats", flush=True)
        train_loader = RotatingDeviceCache(
            train_ds, collator, shard_clips=shard_clips,
            batch_size=args.per_device_train_batch_size, seed=args.seed,
            shard_repeats=args.device_cache_shard_repeats,
        )
    else:
        train_loader = DataLoader(
            train_ds, collator, args.per_device_train_batch_size, shuffle=True,
            seed=args.seed, num_threads=args.num_workers, prefetch=2,
            device_put=True, sharding=batch_sharding(mesh),
            process_index=jax.process_index(), process_count=jax.process_count(),
            native_signals=use_native(train_ds),
        )
    val_loader = (
        DataLoader(val_ds, collator, args.per_device_eval_batch_size,
                   shuffle=False, drop_last=False,
                   num_threads=args.num_workers, prefetch=2,
                   device_put=True, sharding=batch_sharding(mesh),
                   process_index=jax.process_index(),
                   process_count=jax.process_count(),
                   native_signals=use_native(val_ds))
        if val_ds else None
    )

    # ---- model + adapters -------------------------------------------
    params = common.load_base_params(args.base_model, config, stem, args.seed)

    if args.lora_model:  # cross-dataset transfer (finetune.py:150-163)
        adapter = common.load_adapter(args.lora_model)
        params, prev_lora = common.apply_adapter(params, adapter)
        if prev_lora:
            params = merge_lora(params, prev_lora)
        if args.lora_eeg_ch is not None and args.lora_eeg_ch != args.eeg_ch:
            # re-initialize the stem for the new channel count
            params["encoder"]["stem"] = init_stem(
                jax.random.key(args.seed + 1), config, stem
            )
            print(f"[finetune] stem re-initialized: {args.lora_eeg_ch} -> "
                  f"{args.eeg_ch} channels")

    lora = None
    adalora_cfg = None
    if not args.ft_full:
        layer_range = None
        if args.fine_tune_layers is not None:
            # the reference adapts the FIRST n encoder layers:
            # `range(args.fine_tune_layers)` at finetune.py:190
            layer_range = (0, min(args.fine_tune_layers,
                                  config.encoder_layers))
        if args.use_adalora:
            rank = args.lora_rank or 12
            alpha = args.lora_alpha or 32.0
            lora = init_lora(jax.random.key(args.seed + 2), config, rank=rank,
                             alpha=alpha, adalora=True,
                             layer_range=layer_range)
            adalora_cfg = {
                "init_r": rank, "target_r": args.adalora_target_r,
                "tinit": args.adalora_tinit, "tfinal": args.adalora_tfinal,
                "deltaT": args.adalora_deltaT,
                "total_steps": args.max_steps or 10_000,
            }
        else:
            lora = init_lora(jax.random.key(args.seed + 2), config,
                             rank=args.lora_rank or 32,
                             alpha=args.lora_alpha or 64.0,
                             layer_range=layer_range)

    params = shard_params(mesh, params)
    if lora is not None:
        lora = shard_params(mesh, lora)

    total_steps = args.max_steps or (
        args.num_train_epochs * max(len(train_loader), 1)
    )
    tx = opt.make_optimizer(
        peak_lr=args.learning_rate, warmup_steps=args.warmup_steps,
        total_steps=total_steps, weight_decay=args.weight_decay,
        grad_clip=args.max_grad_norm,
        accum_steps=args.gradient_accumulation_steps,
    )
    pred = opt.default_trainable_pred(ft_full=args.ft_full)
    state, frozen = ts.init_train_state(
        jax.random.key(args.seed + 3), params, lora, tx, pred
    )

    if args.fold_lora_in_step:
        # rebuild the step with folding on (Trainer builds its own step)
        pass
    trainer = Trainer(
        config, stem, tx, state, frozen,
        train_loader=train_loader, eval_loader=val_loader,
        output_dir=args.output_dir, max_steps=args.max_steps,
        num_epochs=None if args.max_steps else args.num_train_epochs,
        eval_steps=args.eval_steps, save_steps=args.save_steps,
        logging_steps=args.logging_steps, max_to_keep=args.save_total_limit,
        best_only_save=True,
        orth_reg_weight=args.orth_reg_weight if (lora is not None and args.use_adalora) else 0.0,
        adalora=adalora_cfg, tensorboard=True,
        fold_lora=args.fold_lora_in_step,
        int8_matmul=args.int8_matmul,
        augment_config=device_augment,
        generate_eval_tokenizer=tokenizer if args.eval_wer else None,
        generate_eval_language=args.language,
        generate_eval_task=args.task,
    )
    resume = args.resume_from_checkpoint
    if isinstance(resume, str):
        if resume.lower() in ("false", "none", ""):
            resume = False
        elif resume.lower() in ("true", "latest"):
            resume = True
        else:
            resume = int(resume)  # a specific saved step (0 is valid)
    state = trainer.train(resume_from_checkpoint=resume)

    # save final adapter (PEFT-checkpoint equivalent)
    from neuspeech1_tpu.cli.common import save_adapter

    final = os.path.join(args.output_dir, "adapter_final.npz")
    save_adapter(final, jax.device_get(state.trainable))
    print(f"[finetune] final adapter saved to {final}")
    if args.export_full_model:
        model_params, lora_tree = ts.model_params_of(state, frozen)
        if lora_tree:
            model_params = merge_lora(model_params, lora_tree)
        out = common.save_full_model(
            os.path.join(args.output_dir, "full_model"),
            jax.device_get(model_params), config, stem,
        )
        print(f"[finetune] merged full model saved to {out}")
    trainer.ckpt.close()
    return state


if __name__ == "__main__":
    main()
