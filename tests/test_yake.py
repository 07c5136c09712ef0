"""Native YAKE extraction: algorithmic property + golden tests.

The `yake` package is not installed in this image (PARITY.md), so goldens
are hand-constructed corpora with unambiguous expected behavior of the
published algorithm rather than package-diff tests.
"""

import pytest

from neuspeech1_tpu.decode.yake import STOPWORDS_EN, YakeExtractor


TEXT = (
    "Machine learning is a field of artificial intelligence. "
    "Machine learning algorithms build a model based on sample data. "
    "The model makes predictions without being explicitly programmed. "
    "Deep learning is a subset of machine learning based on neural networks. "
    "Neural networks were inspired by the human brain."
)


def top_keys(text, **kw):
    return [k for k, _ in YakeExtractor(**kw).extract_keywords(text)]


def test_scores_ascending_and_lower_is_better():
    res = YakeExtractor().extract_keywords(TEXT)
    scores = [s for _, s in res]
    assert scores == sorted(scores)
    assert all(s > 0 for s in scores)


def test_salient_bigram_ranks_top():
    # "machine learning" appears 3x across sentences — the algorithm's
    # multi-word scoring (prod/sum over term scores, divided by TF) must
    # rank it above any of its unigrams alone
    keys = top_keys(TEXT)
    assert "machine learning" in keys[:3]
    assert keys.index("machine learning") < keys.index("learning")


def test_no_stopword_boundaries():
    for k in top_keys(TEXT):
        words = k.split()
        assert words[0] not in STOPWORDS_EN
        assert words[-1] not in STOPWORDS_EN


def test_interior_stopword_allowed_in_trigrams():
    text = (
        "The art of war teaches strategy. "
        "Art of war principles apply to business. "
        "Scholars study the art of war closely."
    )
    extractor = YakeExtractor(max_ngram=3)
    keys = [k for k, _ in extractor.extract_keywords(text)]
    # 'of' is an interior stopword: 'art of war' is an eligible trigram
    # while 'of war' / 'art of' (stopword at a boundary) are not
    assert "art of war" in keys
    assert "of war" not in keys and "art of" not in keys


def test_digits_excluded():
    text = "Results improved by 42 percent in 2023. The 42 percent gain held."
    for k in top_keys(text):
        assert "42" not in k and "2023" not in k


def test_case_feature_promotes_proper_nouns():
    # Uppercase-initial occurrences off sentence-start boost WCase and thus
    # lower (improve) the term score
    text = (
        "We met Alice yesterday and saw Alice again today. "
        "Later Alice wrote about widgets. Widgets and gizmos and widgets. "
        "The gizmos with widgets arrived."
    )
    res = dict(YakeExtractor().extract_keywords(text))
    assert "alice" in res and "widgets" in res
    assert res["alice"] < res["widgets"]


def test_dedup_drops_near_duplicates():
    text = "transformer models scale. transformer model scales. transformer models win."
    keys = top_keys(text, dedup_lim=0.8)
    # 'transformer models' and 'transformer model' are >80% similar — only
    # the better-scored survives
    assert not (
        "transformer models" in keys and "transformer model" in keys
    )


def test_top_limits_output():
    keys = top_keys(TEXT, top=5)
    assert len(keys) <= 5


def test_empty_and_stopword_only_text():
    assert YakeExtractor().extract_keywords("") == []
    assert YakeExtractor().extract_keywords("the of and to. is was.") == []


def test_sequence_bias_uses_yake(tmp_path):
    import json

    from neuspeech1_tpu.config import tiny_config
    from neuspeech1_tpu.decode.sequence_bias import build_sequence_bias
    from neuspeech1_tpu.utils.tokenizer import ByteTokenizer

    rows = [
        {"sentence": "machine learning models decode brain signals"},
        {"sentence": "brain signals carry speech information"},
    ]
    p = tmp_path / "train.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    tok = ByteTokenizer(tiny_config())
    spec = build_sequence_bias(str(p), tok, bias=-1.0,
                               extract_type="phrase_word")
    assert spec is not None
    # word-only mode gives single words exactly
    spec_w = build_sequence_bias(str(p), tok, bias=-1.0, extract_type="word")
    assert spec_w is not None
    with pytest.raises(NotImplementedError):
        build_sequence_bias(str(p), tok, extract_type="nope")
