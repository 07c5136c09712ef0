"""BERTScore from a local encoder checkpoint.

The reference calls the `bert_score` package with lang='en' (downloads
roberta-large; `metrics/bert_score.py:8-15`) and vendors a Chinese fork
(`metrics/chinese_bert_score.py`). Zero-egress equivalent: greedy cosine
matching over contextual embeddings of ANY local HF encoder directory
(idf off, no baseline rescaling — the reference uses defaults, which also
have rescaling off). Scores are reported x100 like the reference.

Gated: raises a clear error if no local model is available.
"""

from __future__ import annotations

from typing import Dict, List, Optional


def bert_score(
    preds: List[str],
    refs: List[str],
    model_dir: str,
    num_layers: Optional[int] = None,
    batch_size: int = 16,
    device: str = "cpu",
) -> Dict[str, float]:
    try:
        import torch
        from transformers import AutoModel, AutoTokenizer
    except Exception as e:  # pragma: no cover
        raise RuntimeError("bert_score requires torch + transformers") from e

    tok = AutoTokenizer.from_pretrained(model_dir, local_files_only=True)
    model = AutoModel.from_pretrained(model_dir, local_files_only=True)
    model.eval().to(device)

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
        ps.append(p)
        rs.append(r)
        fs.append(f)

    import numpy as np

    return {
        "bert_score_precision": float(np.mean(ps)) * 100.0,
        "bert_score_recall": float(np.mean(rs)) * 100.0,
        "bert_score_f1": float(np.mean(fs)) * 100.0,
    }
