"""Metric battery tests vs independent implementations + hand-computed golds."""

import numpy as np
import pytest

from neuspeech1_tpu.metrics import battery, bleu, edit, meteor, rouge
from neuspeech1_tpu.utils import text as tx

# note: every pred has >= 4 tokens so nltk's max(1, denominator) quirk for
# empty n-gram sets never triggers — our BLEU follows torchmetrics (the
# reference's metric), which does NOT clamp.
PREDS = [
    "the quick brown fox jumps",
    "hello world again today",
    "a completely different sentence here",
    "the the the the",
]
REFS = [
    "the quick brown fox jumped",
    "hello there world today",
    "something else entirely",
    "the cat sat",
]


def test_edit_counts_hand():
    # ref: a b c ; hyp: a x c d -> H=2 (a, c), S=1 (b->x), D=0, I=1 (d)
    h, s, d, i = edit.edit_counts(["a", "b", "c"], ["a", "x", "c", "d"])
    assert (h, s, d, i) == (2, 1, 0, 1)
    h, s, d, i = edit.edit_counts(list("abc"), list("abc"))
    assert (h, s, d, i) == (3, 0, 0, 0)
    h, s, d, i = edit.edit_counts(list("abc"), [])
    assert (h, s, d, i) == (0, 0, 3, 0)


def test_wer_corpus_semantics():
    # torchmetrics WordErrorRate: total edits / total ref words
    preds = ["a b c", "x"]
    refs = ["a b d", "y z"]
    # pair1: 1 sub / 3 ref ; pair2: 1 sub + 1 del / 2 ref -> (1+2)/5
    assert edit.wer(preds, refs) == pytest.approx(3 / 5)


def test_word_measures_identities():
    m = edit.word_measures(PREDS, REFS)
    assert 0 <= m["wip"] <= 1
    assert m["wil"] == pytest.approx(1 - m["wip"])
    assert m["mer"] <= 1.0
    perfect = edit.word_measures(["x y"], ["x y"])
    assert perfect["wer"] == 0 and perfect["wip"] == 1.0


def test_cer_hand():
    assert edit.cer(["abc"], ["abc"]) == 0
    assert edit.cer(["abcd"], ["abc"]) == pytest.approx(1 / 3)
    # jiwer counts spaces as characters
    assert edit.cer(["a c"], ["abc"]) == pytest.approx(1 / 3)


def test_bleu_matches_nltk():
    from nltk.translate.bleu_score import corpus_bleu as nltk_bleu

    refs_list = [[r] for r in REFS]
    for n in (1, 2, 3, 4):
        weights = tuple([1.0 / n] * n)
        ref_val = nltk_bleu(
            [[r.split()] for r in REFS], [p.split() for p in PREDS],
            weights=weights,
        )
        ours = bleu.corpus_bleu(PREDS, refs_list, max_n=n)
        assert ours == pytest.approx(ref_val, abs=1e-9), f"n={n}"


def test_bleu_matches_sacrebleu_bleu4():
    import sacrebleu

    # sacrebleu tokenizes; use pre-tokenized texts with 13a-neutral content
    preds = ["the quick brown fox jumps over the lazy dog today",
             "hello world how are you"]
    refs = ["the quick brown fox jumped over the lazy dog today",
            "hello world how is you"]
    ref_val = sacrebleu.corpus_bleu(
        preds, [refs], tokenize="none", smooth_method="none"
    ).score / 100.0
    ours = bleu.corpus_bleu(preds, [[r] for r in refs], max_n=4)
    assert ours == pytest.approx(ref_val, abs=1e-6)


def test_bleu_battery_keys():
    out = bleu.bleu_battery(PREDS, REFS)
    assert set(out) == {"bleu-1", "bleu-2", "bleu-3", "bleu-4"}
    assert out["bleu-1"] >= out["bleu-4"]


def test_rouge_matches_rouge_score_lib():
    from rouge_score import rouge_scorer

    scorer = rouge_scorer.RougeScorer(
        ["rouge1", "rouge2", "rougeL", "rougeLsum"], use_stemmer=False,
    )
    multi = [
        ("first line here\nsecond bit of text", "first line\nanother bit of text"),
    ]
    for pred, ref in list(zip(PREDS, REFS)) + multi:
        ref_scores = scorer.score(ref, pred)  # (target, prediction)
        ours = rouge.rouge_pair(pred, ref)
        for name in ("rouge1", "rouge2", "rougeL", "rougeLsum"):
            assert ours[f"{name}_precision"] == pytest.approx(
                ref_scores[name].precision, abs=1e-6), (name, pred, ref)
            assert ours[f"{name}_recall"] == pytest.approx(
                ref_scores[name].recall, abs=1e-6)
            assert ours[f"{name}_fmeasure"] == pytest.approx(
                ref_scores[name].fmeasure, abs=1e-6)


def test_rouge_battery_scaling():
    out = rouge.rouge_battery(["a b c"], ["a b c"])
    assert out["rouge1_fmeasure"] == pytest.approx(100.0)


def test_meteor_hand_and_properties():
    # identical sentences: P=R=1, fmean=1, one chunk, frag=1/m
    s = meteor.single_meteor_score("the cat sat".split(), "the cat sat".split())
    # penalty = 0.5 * (1/3)^3
    assert s == pytest.approx(1.0 * (1 - 0.5 * (1 / 3) ** 3))
    assert meteor.single_meteor_score("a b".split(), "c d".split()) == 0.0
    # stem stage: jumping vs jumped match via porter stem ("jump")
    s2 = meteor.single_meteor_score(["jumping"], ["jumped"])
    assert s2 > 0
    out = meteor.meteor_battery(PREDS, REFS)
    assert 0 <= out["meteor"] <= 1


@pytest.mark.skipif(not meteor._HAS_WORDNET, reason="nltk wordnet not installed")
def test_meteor_matches_nltk():
    from nltk.translate.meteor_score import single_meteor_score as nltk_meteor

    for pred, ref in zip(PREDS, REFS):
        ours = meteor.single_meteor_score(ref.split(), pred.split())
        theirs = nltk_meteor(ref.split(), pred.split())
        assert ours == pytest.approx(theirs, abs=1e-9)


class _FakeLemma:
    def __init__(self, name):
        self._n = name

    def name(self):
        return self._n


class _FakeSynset:
    def __init__(self, names):
        self._l = [_FakeLemma(n) for n in names]

    def lemmas(self):
        return self._l


class _FakeWordnet:
    """Minimal nltk-wordnet duck type: synsets(w) -> [synset.lemmas()]."""

    TABLE = {
        "quick": [["quick", "fast", "speedy"]],
        "fast": [["fast", "quick"], ["fast", "rapid"]],
        "dog": [["dog", "canine", "multi_word_skipped"]],
        "happy": [["happy", "glad"]],
        "sofa": [["sofa", "couch"]],
    }

    def synsets(self, word):
        return [_FakeSynset(names) for names in self.TABLE.get(word, [])]


def test_meteor_wordnet_stage_matches_nltk():
    """Synonym-stage parity vs nltk with the SAME injected wordnet backend
    (nltk `single_meteor_score(..., wordnet=...)`) — runs without the corpus
    download the zero-egress image lacks."""
    from nltk.translate.meteor_score import single_meteor_score as nltk_meteor

    wn = _FakeWordnet()
    cases = [
        ("the fast dog runs", "the quick canine runs"),     # 2 synonym matches
        ("a glad couch", "a happy sofa"),                   # hyp-side synsets
        ("fast fast dog", "quick rapid canine"),            # multi-synset word
        ("no synonyms here", "none at all"),
        ("quick", "quick"),
        # duplicate surface forms: pairing order (reverse hyp scan, latest
        # ref position) changes the chunk count — parity-sensitive
        ("the the fast the", "the quick the the"),
        ("fast dog fast dog", "dog fast quick canine"),
        ("happy happy glad", "glad happy happy"),
        # stems feed the wordnet stage (nltk quirk): 'dogs' stems to 'dog',
        # whose synset contains 'canine'
        ("the dogs", "the canine"),
    ]
    for hyp, ref in cases:
        ours = meteor.single_meteor_score(ref.split(), hyp.split(), wordnet=wn)
        theirs = nltk_meteor(ref.split(), hyp.split(), wordnet=wn)
        assert ours == pytest.approx(theirs, abs=1e-9), (hyp, ref)
    # the stage actually fires: score with synonyms > score without
    with_wn = meteor.single_meteor_score(
        "the quick canine runs".split(), "the fast dog runs".split(), wordnet=wn)
    without = meteor.single_meteor_score(
        "the quick canine runs".split(), "the fast dog runs".split())
    assert with_wn > without


def test_battery_merge_and_files(tmp_path):
    m = battery.compute_battery(PREDS, REFS)
    for key in ("wer", "mer", "wil", "wip", "cer", "bleu-1", "bleu-4",
                "rouge1_fmeasure", "rougeL_fmeasure", "meteor"):
        assert key in m, key
    files = battery.write_results(str(tmp_path / "res"), PREDS, REFS, m)
    assert "label: " + REFS[0] in open(files["txt"]).read()
    import json

    rows = [json.loads(l) for l in open(files["jsonl"])]
    assert rows[1] == {"pred": PREDS[1], "label": REFS[1]}
    loaded = json.load(open(files["json"]))
    assert loaded["wer"] == pytest.approx(m["wer"])


def test_per_sentence_and_char_split():
    rows = battery.per_sentence_metrics(PREDS, REFS)
    assert len(rows) == len(PREDS)
    assert rows[0]["wer"] == pytest.approx(1 / 5)
    ch = battery.char_split_battery(["abc"], ["abd"])
    assert ch["wer"] == pytest.approx(1 / 3)


def test_random_choice_baseline():
    out = battery.random_choice_baseline(REFS, seed=1)
    assert sorted(out) == sorted(REFS)


def test_text_postprocessing():
    assert tx.filter_ascii_text("héllo wörld") == "hllo wrld"
    assert tx.convert_lower_text(["ABC"]) == ["abc"]
    assert tx.remove_punctuation(["a, b! c?"]) == ["a b c"]
    assert tx.to_simple(["abc"]) == ["abc"]
    assert len(tx.generate_random_string(10)) == 10


def test_edit_counts_identities_fuzz():
    """Alignment count identities on random pairs: H+S+D = |ref|,
    H+S+I = |hyp|, and cost S+D+I equals the true Levenshtein distance."""
    rng = np.random.default_rng(0)

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, x in enumerate(a, 1):
            cur = [i]
            for j, y in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (x != y)))
            prev = cur
        return prev[-1]

    for _ in range(30):
        n, m = rng.integers(0, 10, 2)
        ref = [str(x) for x in rng.integers(0, 4, n)]
        hyp = [str(x) for x in rng.integers(0, 4, m)]
        h, s, d, i = edit.edit_counts(ref, hyp)
        assert h + s + d == len(ref)
        assert h + s + i == len(hyp)
        assert s + d + i == lev(ref, hyp)
        assert min(h, s, d, i) >= 0


def test_wer_symmetry_properties():
    assert edit.wer(["a b c"], ["a b c"]) == 0
    # insertion-only and deletion-only
    assert edit.wer(["a b c d"], ["a b c"]) == pytest.approx(1 / 3)
    assert edit.wer(["a b"], ["a b c"]) == pytest.approx(1 / 3)


def test_traditional_to_simplified_table():
    """Vendored t2s table: canonical conversions + passthrough for
    simplified/shared/non-CJK text (reference zhconv `to_simple`)."""
    from neuspeech1_tpu.utils.text import to_simple
    from neuspeech1_tpu.utils.zh_t2s import T2S, convert_t2s

    assert convert_t2s("中國人民學習機器") == "中国人民学习机器"
    assert convert_t2s("我們說漢語") == "我们说汉语"
    assert convert_t2s("开门见山") == "开门见山"  # already simplified
    assert convert_t2s("hello 123") == "hello 123"
    assert to_simple("電腦網絡") == ["电脑网络"]
    assert to_simple(["聽說讀寫", "ok"]) == ["听说读写", "ok"]
    # table sanity: values are simplified (no key maps to another key's key)
    for trad, simp in T2S.items():
        assert len(trad) == 1 and len(simp) == 1
