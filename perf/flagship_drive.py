"""On-chip flagship convergence drives (the BASELINE.md artifacts).

Phase A — the round-3 artifact, reproducible: whisper-base ft_full from
random init on a 240-clip 208-channel separable synthetic corpus
(word = sinusoid frequency; held-out split disjoint), bs32, device cache,
remat=False, lr 5e-4, 600 steps + evals + gated checkpoints, through the
real finetune CLI.

Phase B — VERDICT r3 item 4: the reference's PUBLISHED adapter config
(AdaLoRA init_r=12 -> target_r=4, tinit=200, tfinal=1000, deltaT=10,
alpha=32, orth_reg 0.5 — `/root/reference/finetune.py:205-208`) driven
end-to-end on-chip, including the host-side deltaT=10 global allocation.
The base is phase A's merged full model; the corpus is the SAME
vocabulary/frequency set under a PERMUTED word→frequency assignment
(`make_separable_corpus(freq_order=...)`): a signal-space domain shift
with the text distribution unchanged — the reference's cross-dataset
transfer scenario, learnable by encoder adapters + stem with the decoder
frozen (exactly what AdaLoRA trains: encoder q/k/v/out/fc1/fc2 + conv
stem, `finetune.py:193-203`). max_steps=1600 puts the budget ramp at
steps 200..600 (PEFT semantics: tinit .. total - tfinal) and leaves 1000
final-phase steps at target_r=4.

Usage: python perf/flagship_drive.py [A|B|AB]  (default AB; B reuses A's
output when present). Summarizes metrics.jsonl at the end of each phase.
"""
import json
import os
import sys

ROOT = os.environ.get("NEUSPEECH_DRIVE_ROOT", "/tmp/flagship_r4")


def _summarize(tag, out_dir):
    recs = [json.loads(l) for l in open(os.path.join(out_dir, "metrics.jsonl"))]
    wers = [(r["step"], round(r["eval_wer"], 3)) for r in recs
            if "eval_wer" in r]
    bleu = [(r["step"], round(r.get("eval_bleu1", 0.0), 3)) for r in recs
            if "eval_bleu1" in r]
    sps = [r["samples_per_sec"] for r in recs if "samples_per_sec" in r]
    evl = [(r["step"], round(r["eval_loss"], 4)) for r in recs
           if "eval_loss" in r]
    best = [r.get("best_eval") for r in recs if r.get("best_eval") is not None]
    print(json.dumps({
        "phase": tag,
        "sustained_samples_per_sec": round(
            sorted(sps)[len(sps) // 2], 1) if sps else None,
        "heldout_wer_trajectory": wers,
        "bleu1_trajectory": bleu,
        "eval_loss_trajectory": evl,
        "best_eval_kept": best[-1] if best else None,
    }), flush=True)


def phase_a():
    from neuspeech1_tpu.cli.finetune import main as finetune
    from neuspeech1_tpu.data.synthetic import make_separable_corpus

    corpus = os.path.join(ROOT, "corpusA")
    out = os.path.join(ROOT, "runA")
    if not os.path.exists(os.path.join(corpus, "train.jsonl")):
        make_separable_corpus(corpus, n_clips=240, n_channels=208, seed=3)
    finetune([
        f"--train_data={corpus}/train.jsonl",
        f"--val_data={corpus}/test.jsonl",
        "--base_model=random", "--tokenizer=byte", "--eeg_ch=208",
        "--max_steps=600", "--per_device_train_batch_size=32",
        "--per_device_eval_batch_size=32",
        "--ft_full=True", "--learning_rate=0.0005", "--warmup_steps=50",
        "--eval_steps=300", "--save_steps=300", "--logging_steps=50",
        "--label_max_length=32", "--eval_wer=True", "--remat=False",
        "--export_full_model=True",
        f"--output_dir={out}",
    ])
    _summarize("A_ft_full", out)


def phase_b():
    from neuspeech1_tpu.cli.finetune import main as finetune
    from neuspeech1_tpu.data.synthetic import make_separable_corpus

    corpus = os.path.join(ROOT, "corpusB")
    out = os.path.join(ROOT, "runB")
    base = os.path.join(ROOT, "runA", "full_model", "params.npz")
    assert os.path.exists(base), f"run phase A first ({base} missing)"
    if not os.path.exists(os.path.join(corpus, "train.jsonl")):
        # same vocab + frequency ladder, permuted assignment (domain shift)
        make_separable_corpus(corpus, n_clips=240, n_channels=208, seed=11,
                              freq_order=[3, 0, 4, 1, 5, 2])
    finetune([
        f"--train_data={corpus}/train.jsonl",
        f"--val_data={corpus}/test.jsonl",
        f"--base_model={base}", "--tokenizer=byte", "--eeg_ch=208",
        "--max_steps=1600", "--per_device_train_batch_size=32",
        "--per_device_eval_batch_size=32",
        # the PUBLISHED AdaLoRA config (reference finetune.py:205-208)
        "--use_adalora=True", "--lora_rank=12", "--lora_alpha=32",
        "--adalora_target_r=4", "--adalora_tinit=200",
        "--adalora_tfinal=1000", "--adalora_deltaT=10",
        "--orth_reg_weight=0.5",
        "--learning_rate=0.001", "--warmup_steps=100",
        "--eval_steps=400", "--save_steps=400", "--logging_steps=50",
        "--label_max_length=32", "--eval_wer=True", "--remat=False",
        f"--output_dir={out}",
    ])
    _summarize("B_adalora_published", out)


def phase_c():
    """The reference's OTHER adapter config: plain LoRA r=32 alpha=64
    (`use_adalora=False`, `/root/reference/finetune.py:210-211`) on the
    same domain-shift corpus as phase B — completes the adapter matrix
    (ft_full / AdaLoRA-published / LoRA-published) on-chip."""
    from neuspeech1_tpu.cli.finetune import main as finetune
    from neuspeech1_tpu.data.synthetic import make_separable_corpus

    corpus = os.path.join(ROOT, "corpusB")
    out = os.path.join(ROOT, "runC")
    base = os.path.join(ROOT, "runA", "full_model", "params.npz")
    assert os.path.exists(base), f"run phase A first ({base} missing)"
    if not os.path.exists(os.path.join(corpus, "train.jsonl")):
        make_separable_corpus(corpus, n_clips=240, n_channels=208, seed=11,
                              freq_order=[3, 0, 4, 1, 5, 2])
    finetune([
        f"--train_data={corpus}/train.jsonl",
        f"--val_data={corpus}/test.jsonl",
        f"--base_model={base}", "--tokenizer=byte", "--eeg_ch=208",
        "--max_steps=600", "--per_device_train_batch_size=32",
        "--per_device_eval_batch_size=32",
        # the published plain-LoRA config (reference finetune.py:210-211)
        "--use_adalora=False", "--lora_rank=32", "--lora_alpha=64",
        "--learning_rate=0.001", "--warmup_steps=100",
        "--eval_steps=300", "--save_steps=300", "--logging_steps=50",
        "--label_max_length=32", "--eval_wer=True", "--remat=False",
        f"--output_dir={out}",
    ])
    _summarize("C_lora_published", out)


if __name__ == "__main__":
    which = (sys.argv[1] if len(sys.argv) > 1 else "AB").upper()
    os.makedirs(ROOT, exist_ok=True)
    if "A" in which:
        phase_a()
    if "B" in which:
        phase_b()
    if "C" in which:
        phase_c()
