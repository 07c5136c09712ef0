#!/usr/bin/env bash
# Gwilliams2023 (English MEG, 208 ch) — full recipe mirroring the reference
# README "gwilliams" block: whisper-base, AdaLoRA init_r=12->4 on encoder
# q/k/v/out/fc1/fc2 + trainable conv stem, bs 64, lr 1e-3, warmup 500,
# 500 epochs; eval: beam 5, repetition_penalty 5.0, no_repeat_ngram 2.
#
# Prereqs (real-data run):
#   DATA_ROOT   raw gwilliams2023/download BIDS tree (needs MNE to read .con)
#   HF_WHISPER  local openai/whisper-base checkout (tokenizer + weights)
set -euo pipefail

DATA_ROOT=${DATA_ROOT:-/data/gwilliams2023/download}
PREP_ROOT=${PREP_ROOT:-/data/gwilliams2023/preprocess}
HF_WHISPER=${HF_WHISPER:-/models/whisper-base}
OUT=${OUT:-runs/gwilliams_base}

# 1. raw BIDS -> sentence clips + split1 manifests
python -m neuspeech1_tpu.cli.prepare_data gwilliams \
    --data_root "$DATA_ROOT" --out_root "$PREP_ROOT" --num_workers 8

# 2. fine-tune (reference finetune.py defaults)
python -m neuspeech1_tpu.cli.finetune \
    --train_data "$PREP_ROOT/split1/train.jsonl" \
    --val_data "$PREP_ROOT/split1/val.jsonl" \
    --base_model "$HF_WHISPER" --tokenizer "$HF_WHISPER" \
    --eeg_ch 208 --channel_slice gwilliams --language English \
    --use_adalora True --per_device_train_batch_size 64 \
    --learning_rate 1e-3 --warmup_steps 500 --num_train_epochs 500 \
    --eval_steps 1000 --save_steps 1000 --output_dir "$OUT"

# 3. fold adapters into a standalone full model
python -m neuspeech1_tpu.cli.merge_lora \
    --lora_model "$OUT/adapter_final.npz" \
    --base_model "$HF_WHISPER" --tokenizer "$HF_WHISPER" --eeg_ch 208

# 4. evaluate with the reference decode config + controls
python -m neuspeech1_tpu.cli.evaluation \
    --test_data "$PREP_ROOT/split1/test.jsonl" \
    --model_path "$OUT/full_model" --tokenizer "$HF_WHISPER" \
    --eeg_ch 208 --channel_slice gwilliams \
    --num_beams 5 --repetition_penalty 5.0 --no_repeat_ngram_size 2 \
    --output_dir "$OUT/eval"
python -m neuspeech1_tpu.cli.evaluation \
    --test_data "$PREP_ROOT/split1/test.jsonl" \
    --model_path "$OUT/full_model" --tokenizer "$HF_WHISPER" \
    --eeg_ch 208 --channel_slice gwilliams --noise True \
    --output_dir "$OUT/eval"   # noise-input ablation
python -m neuspeech1_tpu.cli.evaluation \
    --test_data "$PREP_ROOT/split1/test.jsonl" \
    --model_path "$OUT/full_model" --tokenizer "$HF_WHISPER" \
    --eeg_ch 208 --channel_slice gwilliams --teacher_forcing True \
    --output_dir "$OUT/eval"   # teacher-forcing upper bound
