"""Data-contract tests: tokenizer layout, labels, dataset tensors, collator."""

import numpy as np
import pytest

from neuspeech1_tpu.config import (
    LABEL_IGNORE_ID,
    SIGNAL_SAMPLES,
    WhisperConfig,
    tiny_config,
)
from neuspeech1_tpu.data.collate import Collator
from neuspeech1_tpu.data.dataset import EEGDataset, SpeechDataset
from neuspeech1_tpu.data.loader import DataLoader
from neuspeech1_tpu.data import manifest as mf
from neuspeech1_tpu.utils.tokenizer import ByteTokenizer, language_token_id


def test_whisper_base_special_token_layout():
    """Ids must match the multilingual whisper-base tokenizer
    (reference `utils/reader.py:182-186` reads them from the vocab)."""
    c = WhisperConfig()
    assert c.eot_id == 50257
    assert c.sot_id == 50258
    assert language_token_id(c, "english") == 50259
    assert language_token_id(c, "dutch") == 50259 + 12
    assert c.transcribe_id == 50359
    assert c.nocaptions_id == 50362
    assert c.notimestamps_id == 50363
    assert c.timestamp_begin == 50364
    assert c.num_timestamps == 1501  # 0.00 .. 30.00 s
    assert c.vocab_size == 51865


def test_tiny_layout_mirrors_big_layout():
    c = tiny_config()
    assert c.eot_id == 256
    assert c.sot_id == 257
    assert c.timestamp_begin == c.notimestamps_id + 1
    assert c.vocab_size == c.timestamp_begin + 1501


def test_prefix_and_labels(tiny_tok):
    c = tiny_tok.config
    pre = tiny_tok.prefix_tokens("english", "transcribe", timestamps=False)
    assert pre == [c.sot_id, c.first_language_id, c.transcribe_id, c.notimestamps_id]
    pre_ts = tiny_tok.prefix_tokens("english", timestamps=True)
    assert pre_ts == pre[:3]
    labels = tiny_tok.build_labels("ab", "english")
    assert labels == pre + [97, 98] + [c.eot_id]


def test_timestamp_encoding(tiny_tok):
    """Whisper timestamp token = begin + round(t*100)//2 with odd-centisecond
    nudging (reference `utils/reader.py:363-365`)."""
    c = tiny_tok.config
    assert tiny_tok.timestamp_id(0.0) == c.timestamp_begin
    assert tiny_tok.timestamp_id(30.0) == c.timestamp_begin + 1500
    assert tiny_tok.timestamp_id(1.0) == c.timestamp_begin + 50
    sents = [{"text": "a", "start": 0.13, "end": 1.0}]
    labels = tiny_tok.build_timestamp_labels(sents, "english")
    # 0.13 -> 0.14 -> tok begin+7 ; end 1.0 -> begin+50
    assert labels == [
        c.sot_id,
        c.first_language_id,
        c.transcribe_id,
        c.timestamp_begin + 7,
        97,
        c.timestamp_begin + 50,
        c.eot_id,
    ]


def test_byte_tokenizer_roundtrip(tiny_tok):
    s = "hello world"
    assert tiny_tok.decode(tiny_tok.encode(s)) == s
    # specials skipped; -100 ignored
    ids = tiny_tok.build_labels(s) + [LABEL_IGNORE_ID]
    assert tiny_tok.decode(ids) == s


def test_eeg_dataset_tensor_contract(tiny_corpus, tiny_tok):
    root, rows = tiny_corpus
    ds = EEGDataset(f"{root}/train.jsonl", tiny_tok, mode="eval", modal_ch=8)
    item = ds[0]
    assert item["input_features"].shape == (8, SIGNAL_SAMPLES)
    assert item["input_features"].dtype == np.float32
    assert item["labels"][0] == tiny_tok.sot_id
    assert item["labels"][-1] == tiny_tok.eot_id
    # channel padding: ask for more channels than the clips have
    ds16 = EEGDataset(f"{root}/train.jsonl", tiny_tok, mode="eval", modal_ch=16)
    item16 = ds16[0]
    assert item16["input_features"].shape == (16, SIGNAL_SAMPLES)
    np.testing.assert_array_equal(item16["input_features"][8:], 0.0)


def test_eeg_dataset_augmented_train_mode(tiny_corpus, tiny_tok):
    root, _ = tiny_corpus
    cfg = {
        "noise": {"prob": 1.0, "min_snr_dB": 20, "max_snr_dB": 50},
        "mask": {"prob": 1.0, "kwargs": {"unit": [1, 40], "mask_prob": 0.25}},
        "shift": {"prob": 1.0},
        "taylor": {"prob": 1.0},
    }
    ds = EEGDataset(
        f"{root}/train.jsonl", tiny_tok, mode="train", modal_ch=8, augment_config=cfg
    )
    item = ds[0]
    assert item["input_features"].shape == (8, SIGNAL_SAMPLES)
    # train mode must ALSO work with no augment config (divergence from the
    # reference's KeyError, SURVEY §7)
    ds2 = EEGDataset(f"{root}/train.jsonl", tiny_tok, mode="train", modal_ch=8)
    assert ds2[0]["input_features"].shape == (8, SIGNAL_SAMPLES)


def test_timestamp_dataset_labels(tiny_corpus, tiny_tok):
    root, _ = tiny_corpus
    ds = EEGDataset(
        f"{root}/train.jsonl", tiny_tok, mode="eval", modal_ch=8, timestamps=True
    )
    labels = ds[0]["labels"]
    c = tiny_tok.config
    assert labels[0] == c.sot_id
    assert c.notimestamps_id not in labels
    assert any(t >= c.timestamp_begin for t in labels)


def test_dataset_task_translate_prefix(tiny_corpus, tiny_tok):
    """--task translate (reference finetune.py:51) must put the translate
    token in the label prefix, both plain and timestamped, and in
    get_labels (the native-loader path)."""
    root, _ = tiny_corpus
    c = tiny_tok.config
    ds = EEGDataset(f"{root}/train.jsonl", tiny_tok, mode="eval",
                    modal_ch=8, task="translate")
    labels = ds[0]["labels"]
    assert c.translate_id in labels and c.transcribe_id not in labels
    assert labels == ds.get_labels(0)
    ds_ts = EEGDataset(f"{root}/train.jsonl", tiny_tok, mode="eval",
                       modal_ch=8, task="translate", timestamps=True)
    assert c.translate_id in ds_ts[0]["labels"]


def test_collator_masking_and_shift(tiny_tok):
    c = tiny_tok.config
    col = Collator(pad_id=tiny_tok.pad_id, decoder_start_id=c.sot_id)
    samples = [
        {"input_features": np.zeros((4, 10), np.float32), "labels": tiny_tok.build_labels("ab")},
        {"input_features": np.ones((4, 10), np.float32), "labels": tiny_tok.build_labels("abcd")},
    ]
    batch = col(samples)
    assert batch["input_features"].shape == (2, 4, 10)
    labels = batch["labels"]
    dec = batch["decoder_input_ids"]
    assert labels.shape == dec.shape
    assert labels.shape[1] % 8 == 0
    # sot stripped from labels, re-added as decoder start
    assert labels[0, 0] == c.first_language_id
    assert dec[0, 0] == c.sot_id
    # shifted-by-one alignment
    np.testing.assert_array_equal(
        dec[0, 1:4], labels[0, :3]
    )
    # padding -100 in labels, pad_id in decoder inputs
    row0 = labels[0]
    n_real = (row0 != LABEL_IGNORE_ID).sum()
    assert row0[n_real - 1] == c.eot_id
    assert (row0[n_real:] == LABEL_IGNORE_ID).all()
    assert (dec[0][n_real + 1 :] == tiny_tok.pad_id).all()


def test_collator_static_length(tiny_tok):
    col = Collator(
        pad_id=tiny_tok.pad_id,
        decoder_start_id=tiny_tok.config.sot_id,
        max_label_len=32,
    )
    samples = [
        {"input_features": np.zeros((2, 5), np.float32), "labels": tiny_tok.build_labels("xy")}
    ]
    assert col(samples)["labels"].shape == (1, 32)


def test_loader_prefetch_and_sharding(tiny_corpus, tiny_tok):
    root, _ = tiny_corpus
    ds = EEGDataset(f"{root}/train.jsonl", tiny_tok, mode="eval", modal_ch=8)
    col = Collator(pad_id=tiny_tok.pad_id, decoder_start_id=tiny_tok.config.sot_id)
    dl = DataLoader(ds, col, batch_size=4, shuffle=True, seed=1, prefetch=2)
    batches = list(dl)
    assert len(batches) == len(ds) // 4
    assert batches[0]["input_features"].shape[0] == 4
    # two-host simulation: each host sees half of every global batch, with
    # disjoint indices that union to the global batch
    dl0 = DataLoader(ds, col, batch_size=4, shuffle=True, seed=1, prefetch=0,
                     process_index=0, process_count=2)
    dl1 = DataLoader(ds, col, batch_size=4, shuffle=True, seed=1, prefetch=0,
                     process_index=1, process_count=2)
    b0, b1 = next(iter(dl0)), next(iter(dl1))
    assert b0["input_features"].shape[0] == 2
    dl_global = DataLoader(ds, col, batch_size=4, shuffle=True, seed=1, prefetch=0)
    assert set(b0["_indices"]) | set(b1["_indices"]) == set(
        list(dl_global._batch_index_lists()[0])
    )


def test_manifest_filters(tiny_corpus):
    root, rows = tiny_corpus
    all_rows = mf.read_jsonlines(f"{root}/all.jsonl")
    assert len(all_rows) == len(rows)
    subj0 = mf.filter_subject(all_rows, 0)
    assert all(r["subj"] == 0 for r in subj0)
    tagged = [dict(r, sent_type="ZINNEN") for r in all_rows[:3]] + [
        dict(r, sent_type="WOORDEN") for r in all_rows[3:]
    ]
    assert len(mf.filter_schoffelen_sentences(tagged)) == 3
    tr, va, te = mf.split_train_val_test(all_rows, seed=3)
    assert len(tr) + len(va) + len(te) == len(all_rows)


def test_speech_dataset_mel_contract(tiny_corpus, tiny_tok):
    root, _ = tiny_corpus
    ds = SpeechDataset(f"{root}/train.jsonl", tiny_tok, n_mels=80)
    item = ds[0]
    assert item["input_features"].shape == (80, 3000)
    assert np.isfinite(item["input_features"]).all()


def test_byte_tokenizer_unicode_fuzz(tiny_tok, rng):
    """Round-trips arbitrary unicode (multi-byte chars) through byte labels
    + collation + decode."""
    texts = ["héllo wörld", "日本語テスト", "ñañá 😀 mix", "a" * 200]
    for t in texts:
        ids = tiny_tok.build_labels(t)
        assert tiny_tok.decode(ids) == t
    from neuspeech1_tpu.data.collate import Collator

    col = Collator(pad_id=tiny_tok.pad_id,
                   decoder_start_id=tiny_tok.config.sot_id,
                   max_label_len=256)
    samples = [
        {"input_features": np.zeros((2, 4), np.float32),
         "labels": tiny_tok.build_labels(t)}
        for t in texts
    ]
    batch = col(samples)
    for i, t in enumerate(texts):
        assert tiny_tok.decode(batch["labels"][i]) == t


def test_combine_sentences_extends_transcript(tiny_corpus, tiny_tok):
    """Sentence combining: longer signals + concatenated transcripts with
    shifted timings (reference `utils/reader.py:321-342`)."""
    root, _ = tiny_corpus
    ds = EEGDataset(f"{root}/train.jsonl", tiny_tok, mode="train", modal_ch=8,
                    combine_sentences=True, seed=3)
    base = EEGDataset(f"{root}/train.jsonl", tiny_tok, mode="eval", modal_ch=8)
    lens = []
    for i in range(len(ds)):
        sig, transcript, _ = ds._combine_random(i)
        lens.append(len(transcript))
        # timings strictly ordered across combined sentences
        starts = [t["start"] for t in transcript]
        assert starts == sorted(starts)
    assert max(lens) > 1  # at least one combination happened


def test_split_sentences_shortens(tiny_corpus, tiny_tok):
    root, _ = tiny_corpus
    ds = EEGDataset(f"{root}/train.jsonl", tiny_tok, mode="train", modal_ch=8,
                    split_sentences=True, seed=0)
    full_len = len(ds.rows[0]["sentence"].split())
    seen_shorter = False
    for seed in range(5):
        ds.rng = np.random.default_rng(seed)
        sig, transcript, _ = ds._split_random(0)
        words = transcript[0]["text"].split()
        assert 1 <= len(words) <= full_len
        assert sig.shape[1] <= ds.rows[0]["duration"] * 200 + 1
        seen_shorter |= len(words) < full_len
    assert seen_shorter


def test_shift_augmentation_realigns_words(tiny_corpus, tiny_tok):
    """Time-shift must move signal AND all transcript/word timings by the
    same offset (reference `utils/reader.py:403-441`)."""
    root, _ = tiny_corpus
    ds = EEGDataset(f"{root}/train.jsonl", tiny_tok, mode="train", modal_ch=8,
                    augment_config={"shift": {"prob": 1.0}}, seed=7)
    sig0, tr0, _ = ds._get_row_data(0)
    import copy

    sig1, tr1 = ds._shift(sig0.copy(), copy.deepcopy(tr0))
    dt = tr1[0]["start"] - tr0[0]["start"]
    assert dt >= 0
    assert sig1.shape[1] - sig0.shape[1] == pytest.approx(dt * 200, abs=1)
    for a, b in zip(tr0, tr1):
        assert b["end"] - a["end"] == pytest.approx(dt, abs=1e-9)
        for wa, wb in zip(a.get("words", []), b.get("words", [])):
            assert wb["start"] - wa["start"] == pytest.approx(dt, abs=1e-9)
    # shifted head is zeros
    n0 = int(round(dt * 200))
    if n0 > 0:
        np.testing.assert_array_equal(sig1[:, :n0], 0.0)


def test_device_cache_sampler(tiny_corpus, tiny_tok):
    """Device-resident dataset: staged once, batches gathered on device."""
    import jax
    import jax.numpy as jnp

    from neuspeech1_tpu.data.device_cache import DeviceCache

    root, _ = tiny_corpus
    ds = EEGDataset(f"{root}/train.jsonl", tiny_tok, mode="eval", modal_ch=8)
    col = Collator(pad_id=tiny_tok.pad_id,
                   decoder_start_id=tiny_tok.config.sot_id, max_label_len=32)
    cache = DeviceCache.build(ds, col, feature_dtype=jnp.float32)
    assert cache.n == len(ds)
    sample = cache.make_sampler(4)
    b = sample(jax.random.key(0))
    assert b["input_features"].shape == (4, 8, ds.n_samples)
    assert b["labels"].shape == (4, 32)
    # epoch iterator covers every element exactly once
    seen = []
    for batch in cache.epoch_batches(jax.random.key(1), batch_size=4):
        assert batch["decoder_input_ids"].shape == (4, 32)
        seen.append(np.asarray(batch["labels"]))
    assert len(seen) == cache.n // 4


def test_word_tokenizer_roundtrip(tmp_path):
    """WordTokenizer: word-level ids, layout check, file-spec construction."""
    import pytest

    from neuspeech1_tpu.config import WhisperConfig
    from neuspeech1_tpu.utils.tokenizer import WordTokenizer, make_tokenizer

    vocab = ["alpha", "beta", "gamma"]
    cfg = WhisperConfig(**WhisperConfig.layout_for_vocab(3))
    tok = WordTokenizer(cfg, vocab)
    assert tok.encode("beta alpha gamma") == [1, 0, 2]
    assert tok.decode([2, 1]) == "gamma beta"
    # unknown words are dropped, specials skipped in decode
    assert tok.encode("beta unknown alpha") == [1, 0]
    assert tok.decode([0, cfg.eot_id, 1]) == "alpha beta"
    with pytest.raises(ValueError):
        WordTokenizer(WhisperConfig(), vocab)  # wrong layout

    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(vocab) + "\n")
    tok2 = make_tokenizer(f"word:{p}")
    assert tok2.encode("gamma") == [2]
    assert tok2.config.eot_id == 3
    # suppress derivation: no vocab-derived bans, but special-token bans
    assert tok2.non_speech_token_ids() == []
    assert tok2.config.sot_id in tok2.default_suppress_ids()
