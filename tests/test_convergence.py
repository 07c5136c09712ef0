"""Convergence regression (VERDICT r1 item 8): train on a synthetic corpus
with a GENERALIZABLE signal→text mapping (word = sinusoid frequency over
its span) and gate on HELD-OUT greedy-decode WER — the accuracy stand-in
until reference data/GPU runs exist (BASELINE.md procedure item 1).

Calibration (this machine, CPU): WER 1.30 @100 steps → 0.67 @200 → 0.30
@300 → 0.00 @400. The gate is WER <= 0.15 at 400 steps — loose enough for
seed jitter, tight enough that broken learning dynamics (optimizer, LoRA
folding, label contract, decode) trip it.
"""

import json

import pytest


@pytest.mark.slow
def test_heldout_wer_regression(tmp_path):
    from neuspeech1_tpu.cli.finetune import main as finetune
    from neuspeech1_tpu.data.synthetic import make_separable_corpus

    corpus = str(tmp_path / "sep")
    make_separable_corpus(corpus, n_clips=300, n_channels=8, seed=3)
    out = str(tmp_path / "run")
    finetune([
        f"--train_data={corpus}/train.jsonl",
        f"--val_data={corpus}/test.jsonl",   # gate on the held-out split
        "--base_model=random", "--tokenizer=byte", "--eeg_ch=8",
        "--max_audio_len=1.6", "--min_audio_len=0.5",
        "--max_steps=400", "--per_device_train_batch_size=16",
        "--per_device_eval_batch_size=16",
        "--ft_full=True", "--learning_rate=0.002", "--warmup_steps=20",
        "--eval_steps=400", "--save_steps=400", "--logging_steps=100",
        "--label_max_length=32", "--eval_wer=True",
        f"--output_dir={out}",
        "--d_model=48", "--encoder_layers=2", "--decoder_layers=2",
        "--encoder_heads=2", "--decoder_heads=2", "--encoder_ffn=96",
        "--decoder_ffn=96", "--max_source_positions=80",
        "--max_target_positions=48", "--bf16=False", "--remat=False",
        "--mesh_data=1", "--num_workers=2",
    ])
    records = [json.loads(l) for l in open(f"{out}/metrics.jsonl")]
    wers = [r["eval_wer"] for r in records if "eval_wer" in r]
    assert wers, "no eval_wer logged"
    assert wers[-1] <= 0.15, (
        f"held-out WER regression: {wers[-1]:.3f} at step 400 "
        f"(calibrated 0.00; trajectory {wers})"
    )
