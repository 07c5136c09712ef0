#!/usr/bin/env bash
# Schoffelen2019 (Dutch MEG, 273 ch) + cross-dataset transfer — mirrors the
# reference README "schoffelen"/"pretrain" blocks: ZINNEN filter, Dutch
# prompts (labels[:, :4] prefix at eval), and the transfer recipe of loading
# a previous run's adapters, merging, and re-initializing the stem for the
# new channel count (reference finetune.py:150-163).
set -euo pipefail

DATA_ROOT=${DATA_ROOT:-/data/schoffelen2019n/DSC_3011020.09_236_v1}
PREP_ROOT=${PREP_ROOT:-/data/schoffelen2019n/preprocess}
HF_WHISPER=${HF_WHISPER:-/models/whisper-base}
OUT=${OUT:-runs/schoffelen_base}
GW_ADAPTER=${GW_ADAPTER:-}   # optional: gwilliams adapter for transfer

python -m neuspeech1_tpu.cli.prepare_data schoffelen \
    --data_root "$DATA_ROOT" --out_root "$PREP_ROOT" --num_workers 8

TRANSFER_FLAGS=()
if [[ -n "$GW_ADAPTER" ]]; then
    # cross-dataset pretraining transfer: 208-ch stem -> 273-ch stem
    TRANSFER_FLAGS=(--lora_model "$GW_ADAPTER" --lora_eeg_ch 208)
fi

python -m neuspeech1_tpu.cli.finetune \
    --train_data "$PREP_ROOT/split1/train.jsonl" \
    --val_data "$PREP_ROOT/split1/val.jsonl" \
    --base_model "$HF_WHISPER" --tokenizer "$HF_WHISPER" \
    --eeg_ch 273 --channel_slice schoffelen --language Dutch \
    --filter_dataset True \
    --use_adalora True --per_device_train_batch_size 64 \
    --learning_rate 1e-3 --warmup_steps 500 --num_train_epochs 500 \
    --eval_steps 1000 --save_steps 1000 --output_dir "$OUT" \
    "${TRANSFER_FLAGS[@]}"

python -m neuspeech1_tpu.cli.merge_lora \
    --lora_model "$OUT/adapter_final.npz" \
    --base_model "$HF_WHISPER" --tokenizer "$HF_WHISPER" --eeg_ch 273

python -m neuspeech1_tpu.cli.evaluation \
    --test_data "$PREP_ROOT/split1/test.jsonl" \
    --model_path "$OUT/full_model" --tokenizer "$HF_WHISPER" \
    --eeg_ch 273 --channel_slice schoffelen --language Dutch \
    --filter_dataset True \
    --num_beams 5 --repetition_penalty 5.0 --no_repeat_ngram_size 2 \
    --output_dir "$OUT/eval"
