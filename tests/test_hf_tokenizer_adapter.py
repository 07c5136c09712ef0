"""HFTokenizerAdapter against a locally-BUILT tiny WhisperTokenizer.

The adapter (`utils/tokenizer.py`) is the seam every real-data run goes
through (the reference loads `WhisperProcessor.from_pretrained`,
`evaluation.py:59-69` / `finetune.py:70-74`). Real whisper assets cannot be
downloaded in CI (zero egress), so this test WRITES a miniature but
structurally faithful WhisperTokenizer directory — byte-level BPE vocab +
merges + the canonical special-token block (<|endoftext|>,
<|startoftranscript|>, languages, tasks, <|startofprev|>, <|nospeech|>,
<|notimestamps|>, 1501 timestamp tokens) — loads it with the REAL
`transformers.WhisperTokenizer`, and pins the adapter's behavior against
the HF tokenizer's own methods. Swapping the fixture dir for a downloaded
one is the only change needed with real assets (PARITY.md checklist).
"""

import json

import numpy as np
import pytest

from neuspeech1_tpu.config import WhisperConfig
from neuspeech1_tpu.utils.tokenizer import (
    ByteTokenizer,
    HFTokenizerAdapter,
    make_tokenizer,
)

# text vocab: 256 byte-level tokens + four merged tokens ("th", "Ġ-",
# "Ġ'", and "Ġ"+0xe2 — the first byte of the ♪ family, which real whisper
# vocabs merge with the leading space) so BPE merging and the suppress-id
# seeds behave like a real (merging) whisper vocab
N_TEXT = 260
N_LANGS = 2  # <|en|>, <|zh|> — the first two codes of the canonical block
N_TIMESTAMPS = 1501


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    from transformers.models.gpt2.tokenization_gpt2 import bytes_to_unicode

    d = tmp_path_factory.mktemp("hf_tok")
    b2u = bytes_to_unicode()
    chars = list(b2u.values())  # 256 byte-level chars
    vocab = {c: i for i, c in enumerate(chars)}
    sp = b2u[32]  # the byte-level form of ' ' ("Ġ")
    vocab["th"] = 256
    vocab[sp + "-"] = 257
    vocab[sp + "'"] = 258
    note0 = b2u[0xE2]  # first UTF-8 byte of ♪/♫/...
    vocab[sp + note0] = 259
    assert len(vocab) == N_TEXT
    (d / "vocab.json").write_text(json.dumps(vocab, ensure_ascii=False))
    (d / "merges.txt").write_text(
        "#version: 0.2\n"
        + "\n".join(["t h", f"{sp} -", f"{sp} '", f"{sp} {note0}"]) + "\n")

    specials = ["<|endoftext|>", "<|startoftranscript|>", "<|en|>",
                "<|zh|>", "<|translate|>", "<|transcribe|>",
                "<|startoflm|>", "<|startofprev|>", "<|nospeech|>",
                "<|notimestamps|>"]
    specials += [f"<|{i * 0.02:.2f}|>" for i in range(N_TIMESTAMPS)]
    added = {
        str(N_TEXT + i): {
            "content": tok, "special": True, "lstrip": False,
            "rstrip": False, "normalized": False, "single_word": False,
        }
        for i, tok in enumerate(specials)
    }
    (d / "tokenizer_config.json").write_text(json.dumps({
        "tokenizer_class": "WhisperTokenizer",
        "model_max_length": 448,
        "unk_token": "<|endoftext|>",
        "bos_token": "<|endoftext|>",
        "eos_token": "<|endoftext|>",
        "pad_token": "<|endoftext|>",
        # real whisper tokenizer files list the named specials here (this
        # is what populates all_special_ids for skip_special_tokens);
        # timestamp tokens are added tokens only, like upstream
        "additional_special_tokens": specials[:10],
        "added_tokens_decoder": added,
    }))
    return str(d)


@pytest.fixture(scope="module")
def adapter(fixture_dir):
    return HFTokenizerAdapter(fixture_dir)


def test_layout_derived_from_vocab(adapter):
    """The adapter must recover the canonical layout from the tokenizer's
    own special-token ids (no config given)."""
    expect = WhisperConfig.layout_for_vocab(N_TEXT, num_languages=N_LANGS)
    c = adapter.config
    for k, v in expect.items():
        assert getattr(c, k) == v, k
    assert c.vocab_size == N_TEXT + 10 + N_TIMESTAMPS
    assert c.timestamp_begin == c.notimestamps_id + 1


def test_layout_overlays_given_config(fixture_dir):
    """A caller config keeps its geometry but gets the derived layout —
    the large-v3-assets-with-base-config hazard."""
    base = WhisperConfig(d_model=32, encoder_layers=1, decoder_layers=1,
                         encoder_heads=2, decoder_heads=2, encoder_ffn=64,
                         decoder_ffn=64)
    tok = HFTokenizerAdapter(fixture_dir, base)
    assert tok.config.d_model == 32 and tok.config.encoder_layers == 1
    assert tok.config.eot_id == N_TEXT
    assert tok.config.vocab_size == N_TEXT + 10 + N_TIMESTAMPS


def test_make_tokenizer_dispatches_to_adapter(fixture_dir):
    tok = make_tokenizer(fixture_dir)
    assert isinstance(tok, HFTokenizerAdapter)
    assert tok.config.sot_id == N_TEXT + 1


def test_prefix_tokens_match_hf(adapter):
    """sot/lang/task/notimestamps prefix == the HF tokenizer's own
    prefix_tokens property for every (language, task, timestamps) cell."""
    hf = adapter.hf
    for lang_name, hf_lang in (("english", "english"), ("zh", "chinese")):
        for task in ("transcribe", "translate"):
            for ts in (False, True):
                hf.set_prefix_tokens(language=hf_lang, task=task,
                                     predict_timestamps=ts)
                assert adapter.prefix_tokens(lang_name, task, ts) == \
                    hf.prefix_tokens, (lang_name, task, ts)


def test_build_labels_match_hf_template(adapter):
    """build_labels == the HF tokenizer's full template (prefix + text +
    eot), i.e. hf(text).input_ids — the exact training-label contract
    (reference utils/reader.py:356-401 feeds this into the collator)."""
    hf = adapter.hf
    hf.set_prefix_tokens(language="english", task="transcribe",
                         predict_timestamps=False)
    for text in ("the cat sat", "it's a mid-run test", "don't"):
        assert adapter.build_labels(text, "english", "transcribe") == \
            hf(text, add_special_tokens=True).input_ids, text


def test_get_prompt_ids_match_hf(adapter):
    """<|startofprev|>-prefixed prompt ids == HF get_prompt_ids."""
    got = adapter.get_prompt_ids("warm up context")
    want = adapter.hf.get_prompt_ids("warm up context", return_tensors="np")
    np.testing.assert_array_equal(np.asarray(got), want)


def test_timestamp_ids_match_hf_vocab(adapter):
    """config-arithmetic timestamp ids == the ids of the <|x.xx|> added
    tokens in the HF vocab."""
    hf = adapter.hf
    for sec in (0.0, 0.02, 1.0, 29.98, 30.0):
        tok = f"<|{sec:.2f}|>"
        assert adapter.timestamp_id(sec) == hf.convert_tokens_to_ids(tok), tok


def test_timestamp_labels_roundtrip(adapter):
    """build_timestamp_labels produces prefix(no <|notimestamps|>) +
    <|t0|> text <|t1|> ... <|eot|>; HF decode(skip_special_tokens=True)
    recovers the plain text."""
    sentences = [
        {"text": "the cat", "start": 0.0, "end": 1.24},
        {"text": " sat", "start": 1.3, "end": 2.0},
    ]
    labels = adapter.build_timestamp_labels(sentences, "english",
                                            "transcribe")
    c = adapter.config
    assert labels[:3] == [c.sot_id, c.first_language_id, c.transcribe_id]
    assert c.notimestamps_id not in labels
    assert labels[3] == adapter.timestamp_id(0.0)
    assert labels[-1] == c.eot_id
    assert labels[-2] == adapter.timestamp_id(2.0)
    text = adapter.decode(labels, skip_special_tokens=True)
    assert text.strip() == "the cat sat"


def test_timestamp_odd_centisecond_nudge(adapter):
    """Odd centiseconds nudge inward (reference utils/reader.py:363-365)."""
    labels = adapter.build_timestamp_labels(
        [{"text": "x", "start": 0.01, "end": 0.03}], "english", "transcribe")
    assert labels[3] == adapter.timestamp_id(0.02)
    assert labels[-2] == adapter.timestamp_id(0.02)


def test_default_suppress_ids_over_fixture_vocab(adapter):
    """The generation_config-equivalent suppress list derived from THIS
    vocab: single-token annotation symbols, the merged word-initial
    hyphen/apostrophe tokens, and the always-banned specials."""
    ids = adapter.default_suppress_ids()
    c = adapter.config
    # specials OpenAI always bans
    for i in (c.translate_id, c.transcribe_id, c.sot_id, c.startofprev_id,
              c.startoflm_id, c.nocaptions_id):
        assert i in ids, i
    # single-byte annotation symbols resolve to their byte ids
    for sym in "#()[]{}":
        assert adapter.encode(sym)[0] in ids, sym
    # the merged " -" / " '" first tokens (word-initial hyphen/apostrophe)
    assert 257 in ids and 258 in ids
    # ordinary text must never be banned
    for ch in "aez ":
        assert adapter.encode(ch)[0] not in ids, ch
    assert ids == sorted(set(ids))


def test_default_begin_suppress_ids(adapter):
    """begin_suppress == [space token, eot] (HF whisper semantics)."""
    assert adapter.default_begin_suppress_ids() == \
        [adapter.encode(" ")[0], adapter.config.eot_id]


def test_byte_tokenizer_contract_shared(adapter):
    """The adapter and ByteTokenizer expose the same label CONTRACT
    (prefix scheme, eot termination) even though ids differ."""
    bt = ByteTokenizer(WhisperConfig(**WhisperConfig.layout_for_vocab(256)))
    for tok in (adapter, bt):
        lab = tok.build_labels("hi", "english", "transcribe")
        c = tok.config
        assert lab[0] == c.sot_id and lab[-1] == c.eot_id
        assert lab[1] == c.first_language_id
        assert lab[2] == c.transcribe_id and lab[3] == c.notimestamps_id


def test_evaluation_cli_e2e_with_fixture(fixture_dir, tmp_path):
    """cli.evaluation end to end with --tokenizer=<local HF dir>: labels,
    suppress derivation, decode, and the metric battery all run through
    the adapter — the exact real-assets invocation with only the dir
    swapped (reference evaluation.py:59-69)."""
    from neuspeech1_tpu.cli.evaluation import main as evaluate
    from neuspeech1_tpu.data.synthetic import make_synthetic_corpus

    corpus = str(tmp_path / "corpus")
    make_synthetic_corpus(corpus, n_clips=6, n_channels=4, seed=7,
                          max_dur=0.6, min_dur=0.5)
    out = str(tmp_path / "eval")
    metrics = evaluate([
        f"--test_data={corpus}/test.jsonl", "--base_model=random",
        f"--tokenizer={fixture_dir}", "--eeg_ch=4", "--batch_size=2",
        "--num_beams=1", "--max_new_tokens=8",
        "--max_audio_len=0.64", "--min_audio_len=0.5",
        "--d_model=32", "--encoder_layers=1", "--decoder_layers=1",
        "--encoder_heads=2", "--decoder_heads=2", "--encoder_ffn=64",
        "--decoder_ffn=64", "--max_source_positions=32",
        "--max_target_positions=40", "--bf16=False",
        f"--output_dir={out}",
    ])
    assert 0 <= metrics["wer"]
