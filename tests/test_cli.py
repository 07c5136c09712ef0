"""CLI end-to-end: finetune -> merge -> evaluation on a synthetic corpus."""

import json
import os

import numpy as np
import pytest

GEO_CORE = [
    "--d_model=32", "--encoder_layers=1", "--decoder_layers=1",
    "--encoder_heads=2", "--decoder_heads=2", "--encoder_ffn=64",
    "--decoder_ffn=64", "--max_source_positions=32",
    "--max_target_positions=40",
]
GEO = GEO_CORE + ["--bf16=False", "--remat=False", "--mesh_data=1"]


@pytest.fixture(scope="module")
def cli_run(tmp_path_factory):
    from neuspeech1_tpu.cli.finetune import main as finetune
    from neuspeech1_tpu.data.synthetic import make_synthetic_corpus

    root = tmp_path_factory.mktemp("cli")
    corpus = str(root / "corpus")
    make_synthetic_corpus(corpus, n_clips=10, n_channels=4, seed=5,
                          max_dur=0.6, min_dur=0.5)
    out = str(root / "run")
    finetune([
        f"--train_data={corpus}/train.jsonl",
        f"--val_data={corpus}/val.jsonl",
        "--base_model=random", "--tokenizer=byte", "--eeg_ch=4",
        "--max_audio_len=0.64", "--min_audio_len=0.5",
        "--max_steps=6", "--per_device_train_batch_size=4", "--ft_full=True",
        "--learning_rate=0.001", "--warmup_steps=2", "--eval_steps=3",
        "--save_steps=3", "--logging_steps=3", "--label_max_length=40",
        f"--output_dir={out}", *GEO,
    ])
    return corpus, out


def test_finetune_outputs(cli_run):
    corpus, out = cli_run
    assert os.path.exists(f"{out}/adapter_final.npz")
    log = [json.loads(l) for l in open(f"{out}/metrics.jsonl")]
    assert any("eval_loss" in r for r in log)
    assert any("loss" in r for r in log)


def test_merge_and_evaluate(cli_run):
    from neuspeech1_tpu.cli.evaluation import main as evaluate
    from neuspeech1_tpu.cli.merge_lora import main as merge

    corpus, out = cli_run
    full = merge([
        f"--lora_model={out}/adapter_final.npz",
        "--base_model=random", "--tokenizer=byte", "--eeg_ch=4", *GEO_CORE,
    ])
    assert os.path.exists(os.path.join(full, "params.npz"))
    metrics = evaluate([
        f"--test_data={corpus}/test.jsonl", f"--model_path={full}",
        "--tokenizer=byte", "--eeg_ch=4", "--batch_size=2", "--num_beams=1",
        "--max_new_tokens=8", "--per_sentence=True",
        f"--output_dir={out}/eval",
    ])
    assert 0 <= metrics["wer"]
    files = os.listdir(f"{out}/eval")
    assert any(f.endswith("_per_sentence.jsonl") for f in files)
    assert any(f.endswith(".json") for f in files)


def test_resume_from_checkpoint(cli_run):
    from neuspeech1_tpu.cli.finetune import main as finetune

    corpus, out = cli_run
    state = finetune([
        f"--train_data={corpus}/train.jsonl",
        f"--val_data={corpus}/val.jsonl",
        "--base_model=random", "--tokenizer=byte", "--eeg_ch=4",
        "--max_audio_len=0.64", "--min_audio_len=0.5",
        "--max_steps=8", "--per_device_train_batch_size=4", "--ft_full=True",
        "--eval_steps=3", "--save_steps=3", "--logging_steps=4",
        "--label_max_length=40", "--resume_from_checkpoint=True",
        f"--output_dir={out}", *GEO,
    ])
    import jax

    assert int(jax.device_get(state.step)) == 8

    # step-targeted resume (the reference's explicit-checkpoint path,
    # finetune.py:53): rewind to the step-3 checkpoint (the first eval's
    # save is unconditionally "best so far"), train to 10
    state = finetune([
        f"--train_data={corpus}/train.jsonl",
        f"--val_data={corpus}/val.jsonl",
        "--base_model=random", "--tokenizer=byte", "--eeg_ch=4",
        "--max_audio_len=0.64", "--min_audio_len=0.5",
        "--max_steps=10", "--per_device_train_batch_size=4",
        "--ft_full=True", "--eval_steps=5", "--save_steps=5",
        "--logging_steps=5", "--label_max_length=40",
        "--resume_from_checkpoint=3", f"--output_dir={out}", *GEO,
    ])
    assert int(jax.device_get(state.step)) == 10


def test_fine_tune_layers_adapts_first_n(tmp_path, cli_run):
    """--fine_tune_layers=n adapts the FIRST n encoder layers (the
    reference builds prefixes with `range(n)`, finetune.py:190) — the
    saved adapter must carry nonzero LoRA alpha only there."""
    import numpy as np

    from neuspeech1_tpu.cli import common
    from neuspeech1_tpu.cli.finetune import main as finetune

    corpus, _ = cli_run
    out = str(tmp_path / "ftl")
    geo2 = [g if not g.startswith("--encoder_layers")
            else "--encoder_layers=2" for g in GEO]
    finetune([
        f"--train_data={corpus}/train.jsonl",
        f"--val_data={corpus}/val.jsonl",
        "--base_model=random", "--tokenizer=byte", "--eeg_ch=4",
        "--max_audio_len=0.64", "--min_audio_len=0.5",
        "--max_steps=2", "--per_device_train_batch_size=4",
        "--use_adalora=False", "--fine_tune_layers=1", "--lora_rank=2",
        "--eval_steps=2", "--save_steps=2", "--logging_steps=2",
        "--label_max_length=40", f"--output_dir={out}", *geo2,
    ])
    adapter = common.load_adapter(f"{out}/adapter_final.npz")
    alpha = np.asarray(
        adapter["lora"]["encoder"]["layers"]["self_attn"]["q"]["alpha"]
    ).ravel()
    assert alpha[0] != 0.0 and np.all(alpha[1:] == 0.0), alpha


def test_manifest_tools_cli(tmp_path, tiny_corpus):
    from neuspeech1_tpu.cli.manifest_tools import main as mtool

    root, _ = tiny_corpus
    out = str(tmp_path / "combined.jsonl")
    mtool(["combine", f"{root}/train.jsonl", f"{root}/val.jsonl",
           "-o", out, "--seed", "1"])
    assert os.path.exists(out)
    out2 = str(tmp_path / "lang.jsonl")
    mtool(["add-language", out, "--language", "Dutch", "-o", out2])
    from neuspeech1_tpu.data.manifest import read_jsonlines

    assert all(r["language"] == "Dutch" for r in read_jsonlines(out2))
    mtool(["split", out2, "-o", str(tmp_path / "sp"), "--seed", "2"])
    assert os.path.exists(str(tmp_path / "sp" / "train.jsonl"))


def test_transcriber_api(cli_run):
    """Library inference entry point over a merged full model."""
    import numpy as np

    from neuspeech1_tpu.serve import Transcriber

    corpus, out = cli_run
    if not os.path.exists(f"{out}/full_model"):
        from neuspeech1_tpu.cli.merge_lora import main as merge

        merge([f"--lora_model={out}/adapter_final.npz", "--base_model=random",
               "--tokenizer=byte", "--eeg_ch=4", *GEO_CORE])
    t = Transcriber(f"{out}/full_model", tokenizer="byte", batch_size=2,
                    max_new_tokens=8)
    rng = np.random.default_rng(0)
    # 3 clips -> exercises batch padding; short + narrow input -> padding
    sigs = rng.standard_normal((3, 3, 50)).astype(np.float32)
    texts = t.transcribe(sigs)
    assert len(texts) == 3
    assert all(isinstance(x, str) for x in texts)
    rows = t.transcribe_with_timestamps(sigs[:1])
    assert len(rows) == 1
    for r in rows[0]:
        assert 0.0 <= r["start"] <= r["end"]


def test_load_stock_hf_checkpoint_with_stem_swap(tmp_path):
    """Loading a stock (speech) HF whisper dir for EEG training ports the
    body and freshly initializes the EEG stem (reference stem-swap,
    finetune.py:143-148)."""
    import torch

    from neuspeech1_tpu.cli import common
    from neuspeech1_tpu.config import StemConfig

    from tests.test_model_parity import hf_model, small_cfg

    cfg = small_cfg()
    m = hf_model(cfg)
    mdir = str(tmp_path / "hf")
    os.makedirs(mdir)
    torch.save(m.state_dict(), os.path.join(mdir, "pytorch_model.bin"))

    stem = StemConfig("base", in_channels=12)
    params = common.load_base_params(mdir, cfg, stem)
    # body ported exactly
    np.testing.assert_allclose(
        np.asarray(params["decoder"]["token_embed"]),
        m.model.decoder.embed_tokens.weight.detach().numpy(), rtol=1e-6)
    # stem freshly initialized with the EEG geometry
    assert params["encoder"]["stem"]["conv_a"]["w"].shape == (cfg.d_model, 12, 3)
    # speech stem still loads directly
    sp = common.load_base_params(mdir, cfg, StemConfig("speech"))
    np.testing.assert_allclose(
        np.asarray(sp["encoder"]["stem"]["conv1"]["w"]),
        m.model.encoder.conv1.weight.detach().numpy(), rtol=1e-6)


def test_evaluation_speech_cli(cli_run):
    """Speech-modality eval pipeline end-to-end (mel frontend + decode)."""
    from neuspeech1_tpu.cli.evaluation_speech import main as eval_speech

    corpus, out = cli_run
    m = eval_speech([
        f"--test_data={corpus}/test.jsonl",
        "--base_model=random", "--tokenizer=byte", "--bf16=False",
        "--d_model=32", "--encoder_layers=1", "--decoder_layers=1",
        "--encoder_heads=2", "--decoder_heads=2", "--encoder_ffn=64",
        "--decoder_ffn=64", "--max_target_positions=40",
        "--batch_size=2", "--num_beams=1", "--max_new_tokens=4",
        f"--output_dir={out}/speech_eval",
    ])
    assert "wer" in m
    assert any(f.endswith("_speech.json")
               for f in os.listdir(f"{out}/speech_eval"))


def test_transcriber_int8(cli_run):
    """Quantized-weights serving path produces strings like the dense one."""
    import numpy as np

    from neuspeech1_tpu.serve import Transcriber

    corpus, out = cli_run
    if not os.path.exists(f"{out}/full_model"):
        from neuspeech1_tpu.cli.merge_lora import main as merge

        merge([f"--lora_model={out}/adapter_final.npz", "--base_model=random",
               "--tokenizer=byte", "--eeg_ch=4", *GEO_CORE])
    rng = np.random.default_rng(1)
    sigs = rng.standard_normal((2, 4, 128)).astype(np.float32)
    dense = Transcriber(f"{out}/full_model", tokenizer="byte", batch_size=2,
                        max_new_tokens=6)
    q8 = Transcriber(f"{out}/full_model", tokenizer="byte", batch_size=2,
                     max_new_tokens=6, int8_weights=True)
    td = dense.transcribe(sigs)
    tq = q8.transcribe(sigs)
    assert len(td) == len(tq) == 2
    assert all(isinstance(x, str) for x in tq)
    # int8 decode KV cache serving flag (cross K/V stored int8): runs end
    # to end and yields strings on the same inputs
    kv8 = Transcriber(f"{out}/full_model", tokenizer="byte", batch_size=2,
                      max_new_tokens=6, int8_kv_cache=True)
    tk = kv8.transcribe(sigs)
    assert len(tk) == 2 and all(isinstance(x, str) for x in tk)


def test_evaluate_with_prompt_and_yake_bias(cli_run):
    """Round-2 eval surface: <|startofprev|> text prompt + native-YAKE
    sequence bias, end to end through the CLI."""
    from neuspeech1_tpu.cli.evaluation import main as evaluate
    from neuspeech1_tpu.cli.merge_lora import main as merge

    corpus, out = cli_run
    full = merge([
        f"--lora_model={out}/adapter_final.npz",
        "--base_model=random", "--tokenizer=byte", "--eeg_ch=4", *GEO_CORE,
    ])
    metrics = evaluate([
        f"--test_data={corpus}/test.jsonl", f"--model_path={full}",
        "--tokenizer=byte", "--eeg_ch=4", "--batch_size=2", "--num_beams=1",
        "--max_new_tokens=6", "--prompt_text=hi there",
        "--sequence_bias=True", f"--train_data={corpus}/train.jsonl",
        "--bias_weight=-0.5", "--bias_extract_type=phrase_word",
        f"--output_dir={out}/eval_prompt",
    ])
    assert 0 <= metrics["wer"]
    # prompt text must not leak into predictions
    import json as _json

    rows = [
        _json.loads(l)
        for l in open(f"{out}/eval_prompt/test_beam1.jsonl")
    ]
    assert rows and all("hi there" not in r["pred"] for r in rows)


def test_cross_dataset_pretrain_transfer(cli_run, tmp_path_factory):
    """Reference `finetune.py:150-163`: load a pretrained adapter, merge it
    into the base, and re-initialize the stem when the new dataset's
    channel count differs (--lora_model/--lora_eeg_ch)."""
    from neuspeech1_tpu.cli.finetune import main as finetune
    from neuspeech1_tpu.data.synthetic import make_synthetic_corpus

    corpus4, out = cli_run  # adapter trained on 4 channels
    root = tmp_path_factory.mktemp("transfer")
    corpus6 = str(root / "c6")
    make_synthetic_corpus(corpus6, n_clips=8, n_channels=6, seed=9,
                          max_dur=0.6, min_dur=0.5)
    out2 = str(root / "run6")
    finetune([
        f"--train_data={corpus6}/train.jsonl",
        f"--val_data={corpus6}/val.jsonl",
        "--base_model=random", "--tokenizer=byte", "--eeg_ch=6",
        f"--lora_model={out}/adapter_final.npz", "--lora_eeg_ch=4",
        "--max_audio_len=0.64", "--min_audio_len=0.5",
        "--max_steps=4", "--per_device_train_batch_size=4", "--ft_full=True",
        "--learning_rate=0.001", "--warmup_steps=1", "--eval_steps=4",
        "--save_steps=4", "--logging_steps=2", "--label_max_length=40",
        f"--output_dir={out2}", *GEO,
    ])
    assert os.path.exists(f"{out2}/adapter_final.npz")
    log = [json.loads(l) for l in open(f"{out2}/metrics.jsonl")]
    assert any("loss" in r for r in log)


def test_finetune_speech_modality(cli_run, tmp_path_factory):
    """--modal=speech trains on the paired audio through the native log-mel
    frontend (reference trains EEG only, but its SpeechDataset/eval pipeline
    implies the capability; here it is a first-class training path)."""
    from neuspeech1_tpu.cli.finetune import main as finetune

    corpus, _ = cli_run
    out = str(tmp_path_factory.mktemp("speechft"))
    finetune([
        f"--train_data={corpus}/train.jsonl",
        "--modal=speech", "--base_model=random", "--tokenizer=byte",
        "--max_steps=2", "--per_device_train_batch_size=2", "--ft_full=True",
        "--learning_rate=0.001", "--warmup_steps=1", "--eval_steps=2",
        "--save_steps=2", "--logging_steps=1", "--label_max_length=40",
        f"--output_dir={out}",
        "--d_model=32", "--encoder_layers=1", "--decoder_layers=1",
        "--encoder_heads=2", "--decoder_heads=2", "--encoder_ffn=64",
        "--decoder_ffn=64", "--max_target_positions=40",
        "--bf16=False", "--remat=False", "--mesh_data=1",
        "--num_workers=1", "--device_cache=off",
    ])
    log = [json.loads(l) for l in open(f"{out}/metrics.jsonl")]
    losses = [r["loss"] for r in log if "loss" in r]
    assert losses and all(np.isfinite(l) for l in losses)


def test_evaluate_sampling_strategies(cli_run, tmp_path_factory):
    """--do_sample with top-k/top-p (reference process_str.py strategies):
    runs end to end, deterministic under a fixed --sample_seed."""
    from neuspeech1_tpu.cli.evaluation import main as evaluate

    corpus, out = cli_run
    d1 = str(tmp_path_factory.mktemp("samp1"))
    common = [
        f"--test_data={corpus}/test.jsonl", "--base_model=random",
        "--tokenizer=byte", "--eeg_ch=4", *GEO_CORE, "--batch_size=2",
        "--max_new_tokens=6", "--do_sample=True", "--top_k=5",
        "--temperature=1.3", "--top_p=0.9", "--sample_seed=3",
    ]
    m1 = evaluate(common + [f"--output_dir={d1}"])
    d2 = str(tmp_path_factory.mktemp("samp2"))
    m2 = evaluate(common + [f"--output_dir={d2}"])
    assert m1["wer"] == m2["wer"]  # same seed -> same draws


def test_evaluate_contrastive_cli(cli_run, tmp_path_factory):
    """--penalty_alpha (reference contrastiveSearch strategy,
    process_str.py:64-65): runs end to end, deterministic, and tags the
    result files 'contrastive<k>'."""
    from neuspeech1_tpu.cli.evaluation import main as evaluate

    corpus, out = cli_run
    d = str(tmp_path_factory.mktemp("contrastive"))
    m = evaluate([
        f"--test_data={corpus}/test.jsonl", "--base_model=random",
        "--tokenizer=byte", "--eeg_ch=4", *GEO_CORE, "--batch_size=2",
        "--max_new_tokens=6", "--penalty_alpha=1.0", "--top_k=5",
        "--repetition_penalty=1.0", "--no_repeat_ngram_size=0",
        f"--output_dir={d}",
    ])
    assert "wer" in m
    assert os.path.exists(f"{d}/test_contrastive5.jsonl")


def test_evaluate_spec_gamma_cli(cli_run, tmp_path_factory):
    """--spec_gamma (+ --spec_draft_from corpus tables): runs end to end
    and produces the SAME metrics as plain greedy (token-exact
    draft-verify)."""
    from neuspeech1_tpu.cli.evaluation import main as evaluate

    corpus, out = cli_run
    common = [
        f"--test_data={corpus}/test.jsonl", "--base_model=random",
        "--tokenizer=byte", "--eeg_ch=4", *GEO_CORE, "--batch_size=2",
        "--max_new_tokens=6", "--num_beams=1",
        "--repetition_penalty=1.0", "--no_repeat_ngram_size=0",
    ]
    d0 = str(tmp_path_factory.mktemp("spec0"))
    m0 = evaluate(common + [f"--output_dir={d0}"])
    d1 = str(tmp_path_factory.mktemp("spec1"))
    m1 = evaluate(common + [
        "--spec_gamma=3", f"--spec_draft_from={corpus}/train.jsonl",
        f"--output_dir={d1}"])
    assert m0["wer"] == m1["wer"] and m0["cer"] == m1["cer"]


def test_evaluate_upload_dtype_parity(cli_run, tmp_path_factory):
    """bf16 feature upload is numerically identical to float32 upload:
    encoder_apply's FIRST op is astype(config.dtype), so pre-casting on
    host commutes (both are one round-to-nearest-even f32->bf16). The
    round-5 e2e eval drive measured the float32 feature upload at ~95%
    of the decode phase on the tunneled runtime — --upload_dtype=auto
    halves those bytes for free. Exercises the partial-final-batch pad
    path too (6 clips, bs 4)."""
    from neuspeech1_tpu.cli.evaluation import main as evaluate

    corpus, out = cli_run
    preds = {}
    for up in ("float32", "bfloat16"):
        d = str(tmp_path_factory.mktemp(f"upload_{up}"))
        evaluate([
            f"--test_data={corpus}/test.jsonl", "--base_model=random",
            "--tokenizer=byte", "--eeg_ch=4", *GEO_CORE, "--batch_size=4",
            "--num_beams=2", "--max_new_tokens=6", "--timing=True",
            f"--upload_dtype={up}", f"--output_dir={d}",
        ])
        rows = [json.loads(l) for l in open(f"{d}/test_beam2.jsonl")]
        assert rows
        preds[up] = [r["pred"] for r in rows]
    assert preds["float32"] == preds["bfloat16"]


def test_evaluate_compact_upload_parity(tmp_path_factory):
    """--compact_upload (default) crops each batch's trailing zero-padding
    before the host->device upload and zero-pads back on device — exact
    because clips are zero-padded to max duration (data/dataset.py
    _pad_time) and the device-side pad restores identical zeros. The
    round-5 tunnel probe measured uploads at ~45 MB/s regardless of dtype,
    so bytes are everything: 6 s clips cut 160 MB/batch to 32 MB. Pins
    token-identical predictions vs the full-pad upload on a corpus whose
    clips (0.5-0.52 s vs the 0.64 s pad) GUARANTEE the crop+device-pad
    path fires, through the partial-final-batch path and beam decode."""
    from neuspeech1_tpu.cli.evaluation import main as evaluate
    from neuspeech1_tpu.data.synthetic import make_synthetic_corpus

    corpus = str(tmp_path_factory.mktemp("compact_corpus"))
    # clips 100-104 samples, padded to T=128 -> trailing >=24 zero samples;
    # crop block = T/8 = 16 -> _true_len <= 112 < 128 on every batch
    make_synthetic_corpus(corpus, n_clips=6, n_channels=4, seed=7,
                          max_dur=0.52, min_dur=0.5)
    preds = {}
    for compact in ("True", "False"):
        d = str(tmp_path_factory.mktemp(f"compact_{compact}"))
        evaluate([
            f"--test_data={corpus}/all.jsonl", "--base_model=random",
            "--tokenizer=byte", "--eeg_ch=4", *GEO_CORE, "--batch_size=4",
            "--max_audio_len=0.64", "--min_audio_len=0.5",
            "--num_beams=2", "--max_new_tokens=6",
            f"--compact_upload={compact}", f"--output_dir={d}",
        ])
        rows = [json.loads(l) for l in open(f"{d}/all_beam2.jsonl")]
        assert rows
        preds[compact] = [r["pred"] for r in rows]
    assert preds["True"] == preds["False"]


def test_evaluate_int8_kv_cli(cli_run, tmp_path_factory):
    """--int8_kv_cache (the serve_bench recommended serving config) runs the
    eval CLI end to end through the pipelined loop and produces the full
    metric battery (quantized cross cache is opt-in, not bit-exact, so only
    liveness + format are pinned; numeric parity vs fp is covered at the
    Transcriber level in test_transcriber_int8)."""
    from neuspeech1_tpu.cli.evaluation import main as evaluate

    corpus, out = cli_run
    d = str(tmp_path_factory.mktemp("int8kv"))
    m = evaluate([
        f"--test_data={corpus}/test.jsonl", "--base_model=random",
        "--tokenizer=byte", "--eeg_ch=4", *GEO_CORE, "--batch_size=4",
        "--num_beams=2", "--max_new_tokens=6", "--int8_kv_cache=True",
        f"--output_dir={d}",
    ])
    assert "wer" in m and os.path.exists(f"{d}/test_beam2.jsonl")


def test_evaluate_controls_cli(cli_run, tmp_path_factory):
    """The reference's scientific controls through the CLI decode loop:
    --teacher_forcing (argmax under the gold prefix, evaluation.py:387-404),
    --noise (evaluation.py:354-355), --random_choice (derangement baseline,
    evaluation.py:461-476) run end to end through the prefetched loop and
    tag their result files."""
    from neuspeech1_tpu.cli.evaluation import main as evaluate

    corpus, out = cli_run
    common = [
        f"--test_data={corpus}/test.jsonl", "--base_model=random",
        "--tokenizer=byte", "--eeg_ch=4", *GEO_CORE, "--batch_size=4",
        "--num_beams=2", "--max_new_tokens=6",
    ]
    d = str(tmp_path_factory.mktemp("ctl_tf"))
    m = evaluate(common + ["--teacher_forcing=True", f"--output_dir={d}"])
    assert "wer" in m and os.path.exists(f"{d}/test_tf.jsonl")
    d = str(tmp_path_factory.mktemp("ctl_noise"))
    evaluate(common + ["--noise=True", f"--output_dir={d}"])
    assert os.path.exists(f"{d}/test_beam2_noise.jsonl")
    d = str(tmp_path_factory.mktemp("ctl_rand"))
    evaluate(common + ["--random_choice=True", f"--output_dir={d}"])
    assert os.path.exists(f"{d}/test_beam2_random.jsonl")
