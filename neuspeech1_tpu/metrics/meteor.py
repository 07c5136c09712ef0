"""METEOR (nltk-compatible single_meteor_score).

The reference averages `nltk single_meteor_score` over pairs
(`metrics/meteor.py:7-11`). This is the same algorithm (exact -> porter-stem
-> wordnet-synonym alignment stages; F-mean alpha=0.9, penalty
gamma=0.5 * frag^3). The wordnet stage is used when the nltk wordnet corpus
is installed and silently skipped otherwise (zero-egress images have no
corpus downloads; exact+stem dominates the score in practice).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

try:
    from nltk.stem.porter import PorterStemmer

    _STEMMER = PorterStemmer()
except Exception:  # pragma: no cover
    _STEMMER = None

try:
    from nltk.corpus import wordnet as _wn

    _wn.synsets("dog")  # force the LookupError early if data is missing
    _HAS_WORDNET = True
except Exception:  # pragma: no cover
    _wn = None
    _HAS_WORDNET = False


def _match_stage(hyp, ref, key):
    """Greedy first-come matching on key(word); removes matched items.

    hyp/ref: list of (index, word) still unmatched. Returns matches as
    (hyp_idx, ref_idx) pairs plus the remaining lists — nltk's
    `_match_enums` semantics.
    """
    matches = []
    rem_hyp = []
    ref = list(ref)
    for hi, hw in hyp:
        found = None
        for k, (ri, rw) in enumerate(ref):
            if key(hw) == key(rw):
                found = k
                matches.append((hi, ri))
                break
        if found is not None:
            ref.pop(found)
        else:
            rem_hyp.append((hi, hw))
    return matches, rem_hyp, ref


def _wordnet_match(hyp, ref):
    matches = []
    rem_hyp = []
    ref = list(ref)
    for hi, hw in hyp:
        syns_h = {
            lemma.name()
            for ss in _wn.synsets(hw)
            for lemma in ss.lemmas()
            if lemma.name().find("_") < 0
        } | {hw}
        found = None
        for k, (ri, rw) in enumerate(ref):
            if rw in syns_h:
                found = k
                matches.append((hi, ri))
                break
        if found is not None:
            ref.pop(found)
        else:
            rem_hyp.append((hi, hw))
    return matches, rem_hyp, ref


def _count_chunks(matches: List[Tuple[int, int]]) -> int:
    matches = sorted(matches)
    chunks = 0
    prev = None
    for h, r in matches:
        if prev is None or h != prev[0] + 1 or r != prev[1] + 1:
            chunks += 1
        prev = (h, r)
    return chunks


def single_meteor_score(
    reference: List[str],
    hypothesis: List[str],
    alpha: float = 0.9,
    beta: float = 3.0,
    gamma: float = 0.5,
) -> float:
    """nltk argument order: (reference_tokens, hypothesis_tokens)."""
    ref = [(i, w.lower()) for i, w in enumerate(reference)]
    hyp = [(i, w.lower()) for i, w in enumerate(hypothesis)]
    len_h, len_r = len(hyp), len(ref)
    m_exact, hyp, ref = _match_stage(hyp, ref, lambda w: w)
    if _STEMMER is not None:
        m_stem, hyp, ref = _match_stage(hyp, ref, _STEMMER.stem)
    else:
        m_stem = []
    if _HAS_WORDNET:
        m_wn, hyp, ref = _wordnet_match(hyp, ref)
    else:
        m_wn = []
    matches = m_exact + m_stem + m_wn
    m = len(matches)
    if m == 0 or len_h == 0 or len_r == 0:
        return 0.0
    precision = m / len_h
    recall = m / len_r
    fmean = (precision * recall) / (alpha * precision + (1 - alpha) * recall)
    chunks = _count_chunks(matches)
    frag = chunks / m
    penalty = gamma * frag**beta
    return fmean * (1.0 - penalty)


def meteor_battery(preds: List[str], refs: List[str]) -> Dict[str, float]:
    """Mean single_meteor_score (reference `metrics/meteor.py`)."""
    import numpy as np

    scores = [
        single_meteor_score(ref.split(), pred.split())
        for pred, ref in zip(preds, refs)
    ]
    return {"meteor": float(np.mean(scores)) if scores else 0.0}
