"""Execute the asset-gated metrics (BERTScore, LM perplexity) with tiny
randomly-initialized LOCAL HF models — closing VERDICT r1's "implemented but
never executed" gap. Goldens are independent re-implementations of
bert_score's greedy matching and lmppl's exp(mean NLL) formula.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

WORDS = ["the", "cat", "sat", "on", "mat", "dog", "ran", "fast",
         "brain", "signals", "decode", "speech"]


@pytest.fixture(scope="module")
def encoder_dir(tmp_path_factory):
    from transformers import BertConfig, BertModel, BertTokenizer

    d = tmp_path_factory.mktemp("tiny_bert")
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + WORDS
    vf = d / "vocab.txt"
    vf.write_text("\n".join(vocab))
    tok = BertTokenizer(str(vf))
    cfg = BertConfig(
        vocab_size=len(vocab), hidden_size=16, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=32,
        max_position_embeddings=64,
    )
    torch.manual_seed(0)
    model = BertModel(cfg)
    model.save_pretrained(d)
    tok.save_pretrained(d)
    return str(d)


@pytest.fixture(scope="module")
def causal_dir(tmp_path_factory):
    from transformers import BertTokenizer, GPT2Config, GPT2LMHeadModel

    d = tmp_path_factory.mktemp("tiny_gpt2")
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + WORDS
    vf = d / "vocab.txt"
    vf.write_text("\n".join(vocab))
    tok = BertTokenizer(str(vf))
    cfg = GPT2Config(
        vocab_size=len(vocab), n_embd=16, n_layer=2, n_head=2, n_positions=64,
    )
    torch.manual_seed(1)
    model = GPT2LMHeadModel(cfg)
    model.save_pretrained(d)
    tok.save_pretrained(d)
    return str(d)


def test_bertscore_identity_is_100(encoder_dir):
    from neuspeech1_tpu.metrics.bertscore import bert_score

    texts = ["the cat sat on mat", "brain signals decode speech"]
    out = bert_score(texts, list(texts), encoder_dir)
    assert out["bert_score_precision"] == pytest.approx(100.0, abs=1e-3)
    assert out["bert_score_recall"] == pytest.approx(100.0, abs=1e-3)
    assert out["bert_score_f1"] == pytest.approx(100.0, abs=1e-3)


def test_bertscore_matches_greedy_matching_gold(encoder_dir):
    """Independent loop-based reimplementation of bert_score's greedy
    cosine matching (reference metrics/bert_score.py:8-15 semantics)."""
    from transformers import AutoModel, AutoTokenizer

    from neuspeech1_tpu.metrics.bertscore import bert_score

    preds = ["the cat sat", "dog ran fast on mat"]
    refs = ["the cat sat on mat", "dog ran"]
    out = bert_score(preds, refs, encoder_dir)

    tok = AutoTokenizer.from_pretrained(encoder_dir)
    model = AutoModel.from_pretrained(encoder_dir).eval()

    def embed_one(text):
        enc = tok(text, return_tensors="pt")
        with torch.no_grad():
            hs = model(**enc).last_hidden_state[0]
        hs = hs / hs.norm(dim=-1, keepdim=True)
        return hs.numpy()

    ps, rs, fs = [], [], []
    for p_text, r_text in zip(preds, refs):
        ep, er = embed_one(p_text), embed_one(r_text)
        sim = np.zeros((len(ep), len(er)))
        for i in range(len(ep)):
            for j in range(len(er)):
                sim[i, j] = float(np.dot(ep[i], er[j]))
        p = float(np.mean([sim[i].max() for i in range(len(ep))]))
        r = float(np.mean([sim[:, j].max() for j in range(len(er))]))
        f = 2 * p * r / (p + r)
        ps.append(p); rs.append(r); fs.append(f)

    assert out["bert_score_precision"] == pytest.approx(np.mean(ps) * 100, abs=1e-3)
    assert out["bert_score_recall"] == pytest.approx(np.mean(rs) * 100, abs=1e-3)
    assert out["bert_score_f1"] == pytest.approx(np.mean(fs) * 100, abs=1e-3)


def test_bertscore_baseline_rescale(encoder_dir, tmp_path):
    """Fork semantics (`chinese_bert_score.py:325-342`): per-sentence
    (s - b) / (1 - b) with each component's own baseline, F rescaled (not
    recomputed); TSV read matches pd.read_csv(...).iloc[num_layers]."""
    from neuspeech1_tpu.metrics.bertscore import bert_score, read_baseline_tsv

    preds = ["the cat sat", "dog ran fast on mat"]
    refs = ["the cat sat on mat", "dog ran"]
    bl = (0.3, 0.4, 0.35)
    # rescale is per-sentence but affine, so it commutes with the mean:
    # mean((s - b)/(1 - b)) == (mean(s) - b)/(1 - b)
    raw = bert_score(preds, refs, encoder_dir)
    out = bert_score(preds, refs, encoder_dir, rescale_baseline=bl)
    for k, b in zip(("bert_score_precision", "bert_score_recall",
                     "bert_score_f1"), bl):
        want = (raw[k] / 100.0 - b) / (1.0 - b) * 100.0
        assert out[k] == pytest.approx(want, abs=1e-6)

    tsv = tmp_path / "baseline.tsv"
    tsv.write_text("LAYER,P,R,F\n0,0.1,0.2,0.15\n1,0.3,0.4,0.35\n")
    assert read_baseline_tsv(str(tsv), 1) == (0.3, 0.4, 0.35)
    via_tsv = bert_score(preds[:1], refs[:1], encoder_dir,
                         baseline_path=str(tsv), num_layers=1)
    # num_layers=1 embeddings differ from last-layer; just check it runs
    assert np.isfinite(via_tsv["bert_score_f1"])


def test_bertscore_plot_example(encoder_dir, tmp_path):
    pytest.importorskip("matplotlib")
    from neuspeech1_tpu.metrics.bertscore import plot_example

    out = plot_example("the cat sat", "the cat sat on mat", encoder_dir,
                       str(tmp_path / "sim.png"))
    import os

    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_perplexity_matches_manual_nll(causal_dir):
    from transformers import AutoModelForCausalLM, AutoTokenizer

    from neuspeech1_tpu.metrics.perplexity import (
        lm_perplexity, perplexity_battery,
    )

    texts = ["the cat sat on mat", "brain signals decode speech fast"]
    got = lm_perplexity(texts, causal_dir)

    tok = AutoTokenizer.from_pretrained(causal_dir)
    model = AutoModelForCausalLM.from_pretrained(causal_dir).eval()
    losses = []
    for t in texts:
        ids = tok(t, return_tensors="pt").input_ids
        with torch.no_grad():
            logits = model(ids).logits[0]
        logp = torch.log_softmax(logits[:-1].float(), dim=-1)
        nll = -logp[torch.arange(ids.shape[1] - 1), ids[0, 1:]].mean()
        losses.append(float(nll))
    want = float(np.exp(np.mean(losses)))
    assert got == pytest.approx(want, rel=1e-4)

    # lmppl-style battery scores BOTH streams (reference perplexity.py:8-15)
    batt = perplexity_battery(texts, ["dog ran", "the mat"], causal_dir)
    assert batt["ppl_pred"] == pytest.approx(got, rel=1e-4)
    assert batt["ppl_label"] > 0


def test_battery_integration(encoder_dir, causal_dir):
    from neuspeech1_tpu.metrics.battery import compute_battery

    out = compute_battery(
        ["the cat sat"], ["the cat sat"],
        bertscore_model=encoder_dir, perplexity_model=causal_dir,
    )
    assert out["bert_score_f1"] == pytest.approx(100.0, abs=1e-3)
    assert np.isfinite(out["ppl_pred"]) and out["ppl_pred"] > 0
    assert out["wer"] == 0.0


def test_empty_and_short_texts_are_skipped(causal_dir):
    from neuspeech1_tpu.metrics.perplexity import lm_perplexity

    assert np.isnan(lm_perplexity(["", "   "], causal_dir))
