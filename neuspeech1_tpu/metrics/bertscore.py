"""BERTScore from a local encoder checkpoint.

The reference calls the `bert_score` package with lang='en' (downloads
roberta-large; `metrics/bert_score.py:8-15`) and vendors a Chinese fork
(`metrics/chinese_bert_score.py`). Zero-egress equivalent: greedy cosine
matching over contextual embeddings of ANY local HF encoder directory
(idf off; baseline rescaling available as the fork's opt-in —
`chinese_bert_score.py:325-342` `(s - b) / (1 - b)` from a per-layer
baseline TSV or explicit values; the reference's live path uses defaults,
which have rescaling off). `plot_example` is the fork's token-level
similarity heatmap (`chinese_bert_score.py:377-470`). Scores are
reported x100 like the reference.

Gated: raises a clear error if no local model is available.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple


def read_baseline_tsv(path: str, num_layers: int) -> Tuple[float, float, float]:
    """(P, R, F) baselines for ``num_layers`` from a bert_score-format TSV
    (header ``LAYER,P,R,F``; row index = layer — the fork reads it with
    ``pd.read_csv(...).iloc[num_layers]``, `chinese_bert_score.py:330-334`)."""
    import csv

    with open(path) as f:
        rows = list(csv.reader(f))
    vals = rows[1 + num_layers]  # header + 0-indexed layer rows
    return float(vals[1]), float(vals[2]), float(vals[3])


def _rescale(x: float, b: float) -> float:
    return (x - b) / (1.0 - b)


def bert_score(
    preds: List[str],
    refs: List[str],
    model_dir: str,
    num_layers: Optional[int] = None,
    batch_size: int = 16,
    device: str = "cpu",
    rescale_baseline: Optional[Sequence[float]] = None,
    baseline_path: Optional[str] = None,
) -> Dict[str, float]:
    """``rescale_baseline``: optional (P, R, F) baseline triple applied
    per sentence as ``(s - b) / (1 - b)`` before averaging (the fork's
    rescale_with_baseline); ``baseline_path``: read the triple from a
    bert_score-format TSV instead (mutually exclusive)."""
    try:
        import torch
        from transformers import AutoModel, AutoTokenizer
    except Exception as e:  # pragma: no cover
        raise RuntimeError("bert_score requires torch + transformers") from e

    tok = AutoTokenizer.from_pretrained(model_dir, local_files_only=True)
    model = AutoModel.from_pretrained(model_dir, local_files_only=True)
    model.eval().to(device)

    if baseline_path is not None:
        assert rescale_baseline is None, "pass one baseline source"
        # num_layers=None embeds with last_hidden_state ==
        # hidden_states[num_hidden_layers], so the baseline row must be
        # the model's real layer count, NOT row 0 (the embedding layer —
        # its baselines differ a lot and would silently mis-rescale)
        rescale_baseline = read_baseline_tsv(
            baseline_path,
            model.config.num_hidden_layers if num_layers is None
            else num_layers)

    def embed(texts):
        out = []
        for i in range(0, len(texts), batch_size):
            chunk = texts[i : i + batch_size]
            enc = tok(
                chunk, return_tensors="pt", padding=True, truncation=True,
                max_length=512,
            ).to(device)
            with torch.no_grad():
                if num_layers is None:
                    hs = model(**enc).last_hidden_state
                else:
                    hs = model(**enc, output_hidden_states=True).hidden_states[
                        num_layers
                    ]
            hs = torch.nn.functional.normalize(hs, dim=-1)
            for j in range(len(chunk)):
                mask = enc["attention_mask"][j].bool()
                out.append(hs[j][mask])
        return out

    e_pred = embed(preds)
    e_ref = embed(refs)
    ps, rs, fs = [], [], []
    import torch

    for ep, er in zip(e_pred, e_ref):
        sim = ep @ er.T  # [Tp, Tr]
        p = sim.max(dim=1).values.mean().item()
        r = sim.max(dim=0).values.mean().item()
        f = 2 * p * r / (p + r) if p + r else 0.0
        if rescale_baseline is not None:
            # fork semantics: each per-sentence component rescaled with its
            # own baseline BEFORE averaging; F is rescaled, not recomputed
            bp, br, bf = rescale_baseline
            p, r, f = _rescale(p, bp), _rescale(r, br), _rescale(f, bf)
        ps.append(p)
        rs.append(r)
        fs.append(f)

    import numpy as np

    return {
        "bert_score_precision": float(np.mean(ps)) * 100.0,
        "bert_score_recall": float(np.mean(rs)) * 100.0,
        "bert_score_f1": float(np.mean(fs)) * 100.0,
    }


def plot_example(
    candidate: str,
    reference: str,
    model_dir: str,
    fname: str,
    num_layers: Optional[int] = None,
    rescale_baseline: Optional[Sequence[float]] = None,
    baseline_path: Optional[str] = None,
    device: str = "cpu",
) -> str:
    """Token-level similarity heatmap for one (candidate, reference) pair —
    the zh fork's `plot_example` (`chinese_bert_score.py:377-470`): cosine
    matrix over contextual embeddings with special tokens stripped, Blues
    colormap on [0, 1], cell values annotated, optional F-baseline rescale
    of the matrix. Saves to ``fname`` and returns it (matplotlib gated)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception as e:  # pragma: no cover
        raise RuntimeError("plot_example requires matplotlib") from e
    import torch
    from transformers import AutoModel, AutoTokenizer

    tok = AutoTokenizer.from_pretrained(model_dir, local_files_only=True)
    model = AutoModel.from_pretrained(model_dir, local_files_only=True)
    model.eval().to(device)

    def embed_tokens(text):
        enc = tok(text, return_tensors="pt").to(device)
        with torch.no_grad():
            if num_layers is None:
                hs = model(**enc).last_hidden_state[0]
            else:
                hs = model(**enc, output_hidden_states=True).hidden_states[
                    num_layers][0]
        hs = torch.nn.functional.normalize(hs, dim=-1)
        ids = enc["input_ids"][0].tolist()
        toks = [tok.decode([i]) for i in ids]
        # strip the special tokens (fork: sim[1:-1, 1:-1]) — generically,
        # by mask rather than by position
        keep = [i for i, t in enumerate(ids)
                if t not in set(tok.all_special_ids)]
        return hs[keep], [toks[i] for i in keep]

    eh, h_tokens = embed_tokens(candidate)
    er, r_tokens = embed_tokens(reference)
    sim = (eh @ er.T).cpu().numpy()
    if baseline_path is not None:
        assert rescale_baseline is None, "pass one baseline source"
        rescale_baseline = read_baseline_tsv(
            baseline_path,
            model.config.num_hidden_layers if num_layers is None
            else num_layers)
    if rescale_baseline is not None:
        bf = float(rescale_baseline[2])  # fork rescales the matrix by F's
        sim = (sim - bf) / (1.0 - bf)

    fig, ax = plt.subplots(
        figsize=(max(len(r_tokens), 2), max(len(h_tokens), 2)))
    im = ax.imshow(sim, cmap="Blues", vmin=0, vmax=1)
    ax.set_xticks(range(len(r_tokens)))
    ax.set_yticks(range(len(h_tokens)))
    ax.set_xticklabels(r_tokens, fontsize=10, rotation=45, ha="right")
    ax.set_yticklabels(h_tokens, fontsize=10)
    ax.set_xlabel("reference", fontsize=12)
    ax.set_ylabel("candidate", fontsize=12)
    for i in range(len(h_tokens)):
        for j in range(len(r_tokens)):
            ax.text(j, i, f"{sim[i, j]:.3f}", ha="center", va="center",
                    color="k" if sim[i, j] < 0.5 else "w", fontsize=8)
    fig.colorbar(im, ax=ax)
    fig.tight_layout()
    fig.savefig(fname)
    plt.close(fig)
    return fname
