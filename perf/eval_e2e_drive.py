"""Full eval-CLI drive at realistic scale, on-chip (round-4 VERDICT item 6).

The round-4 meta-lesson was "benchmark the user's entry point": serve_bench
measures bare decode calls, but the reference's published workflow is
`cli.evaluation` end to end (`/root/reference/evaluation.py:346-458`) —
loader + collate + beam-5/rp5.0/ngram-2 decode + detokenize + full metric
battery + result files. This drives exactly that on a few-hundred-clip
separable corpus with a TRAINED checkpoint (phase A's merged full model),
post the round-4 landmine fixes (commit_params, dense logit bans), and
reports end-to-end utterances/s for comparison with serve_bench's bare
beam rows — the gap IS the remaining serving-path tax.

Usage: python perf/eval_e2e_drive.py [model_dir] [n_clips] [batch_size]
Defaults: /tmp/flagship_r4/runA/full_model, 400 clips, bs64.
"""
import json
import os
import sys
import time

ROOT = os.environ.get("NEUSPEECH_DRIVE_ROOT", "/tmp/flagship_r4")
MODEL = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    ROOT, "runA", "full_model")
N_CLIPS = int(sys.argv[2]) if len(sys.argv) > 2 else 400
BS = int(sys.argv[3]) if len(sys.argv) > 3 else 64


def main():
    from neuspeech1_tpu.cli.evaluation import main as evaluate
    from neuspeech1_tpu.data.synthetic import make_separable_corpus

    corpus = os.path.join(ROOT, f"corpus_eval{N_CLIPS}")
    # same word->frequency mapping as phase A's training corpus (default
    # freq_order), fresh clips: the trained checkpoint decodes it like
    # held-out data
    if not os.path.exists(os.path.join(corpus, "all.jsonl")):
        make_separable_corpus(corpus, n_clips=N_CLIPS, n_channels=208,
                              seed=77)
    out = os.path.join(ROOT, f"eval_e2e_{N_CLIPS}_bs{BS}")
    t0 = time.perf_counter()
    metrics = evaluate([
        f"--test_data={corpus}/all.jsonl", f"--model_path={MODEL}",
        "--tokenizer=byte", "--eeg_ch=208", f"--batch_size={BS}",
        # the reference's published eval mode: defaults already give
        # beam-5 / repetition_penalty 5.0 / no_repeat_ngram 2
        "--max_new_tokens=32", "--per_sentence=True", "--timing=True",
        f"--output_dir={out}",
    ])
    wall = time.perf_counter() - t0
    print(json.dumps({
        "config": "eval_cli_e2e_beam5_rp5_ngram2", "clips": N_CLIPS,
        "batch": BS, "wall_s": round(wall, 1),
        "utterances_per_sec": round(N_CLIPS / wall, 1),
        "wer": round(metrics.get("wer", -1.0), 4),
        "bleu1": round(metrics.get("bleu1", metrics.get("bleu_1", -1.0)), 4),
        "result_files": sorted(os.listdir(out)),
    }), flush=True)


if __name__ == "__main__":
    main()
