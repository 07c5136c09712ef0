"""Train-set sequence-bias construction for decoding.

Reference `utils/generation_helper.py:18-73` (GetSequenceBias): extract YAKE
keywords (n-grams up to 3) plus all whitespace words from the training
manifest's sentences and bias each token sequence by -1.0 during decoding
(`evaluation.py:339-343,362-367`).

yake is not installed in this image, so keyword extraction falls back to a
frequency-based n-gram scorer with a small stopword list; the word-level
entries (the bulk of the bias set) are identical either way.
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, List, Optional, Tuple

from neuspeech1_tpu.data.manifest import read_jsonlines
from neuspeech1_tpu.decode.logits_process import SequenceBiasSpec

_STOPWORDS = set(
    "the a an and or of to in is are was were be on at it this that with for "
    "as by from had has have he she they we you i his her its not".split()
)


def _yake_keywords(text: str, top: int, max_ngram: int) -> List[str]:
    try:
        import yake  # pragma: no cover (not installed here)

        kw = yake.KeywordExtractor(n=max_ngram, top=top)
        return [k for k, _ in kw.extract_keywords(text)]
    except ImportError:
        return _freq_keywords(text, top, max_ngram)


def _freq_keywords(text: str, top: int, max_ngram: int) -> List[str]:
    words = [w.strip(".,!?;:").lower() for w in text.split()]
    words = [w for w in words if w]
    counts: Counter = Counter()
    for n in range(1, max_ngram + 1):
        for i in range(len(words) - n + 1):
            gram = words[i : i + n]
            if gram[0] in _STOPWORDS or gram[-1] in _STOPWORDS:
                continue
            counts[" ".join(gram)] += 1
    return [g for g, _ in counts.most_common(top)]


def build_sequence_bias(
    manifest_path: str,
    tokenizer,
    bias: float = -1.0,
    top_keywords: int = 100,
    max_ngram: int = 3,
    include_words: bool = True,
) -> Optional[SequenceBiasSpec]:
    """Returns a SequenceBiasSpec for `generate(..., bias_spec=...)`."""
    rows = read_jsonlines(manifest_path)
    corpus = " ".join(r.get("sentence", "") for r in rows)
    phrases = set(_yake_keywords(corpus, top_keywords, max_ngram))
    if include_words:
        phrases.update(w for w in corpus.split() if w)
    bias_map: Dict[Tuple[int, ...], float] = {}
    for phrase in phrases:
        for variant in (phrase, " " + phrase):
            ids = tuple(tokenizer.encode(variant))
            if ids:
                bias_map[ids] = bias
    return SequenceBiasSpec.build(bias_map)
