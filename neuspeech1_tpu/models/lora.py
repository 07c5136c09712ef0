"""LoRA / AdaLoRA as parameter-tree transforms.

The reference wires PEFT's (Ada)LoRA onto encoder q/k/v/out/fc1/fc2 with the
conv stem kept fully trainable (`finetune.py:189-212`). Here adapters are a
*parallel pytree* mirroring the stacked layer structure; each adapted linear
adds a low-rank delta in its forward (`models/whisper.py::linear`), and
merging is a pure function `merge(params, lora) -> params`.

Entry formats (leaves stacked over layers, leading axis L):
  LoRA:    {"A": [L, d_in, r], "B": [L, r, d_out]}         delta = x A B * s
  AdaLoRA: {"E": [L, r, 1], "A", "B", "mask": [L, r, 1]}    delta = x A (E*m) B * s
           (SVD parameterization P Λ Q of the PEFT AdaLoRA paper; `mask`
           freezes pruned ranks without changing shapes — static-shape
           friendly rank reallocation on TPU.)

`scaling` = alpha / r is folded into the tree as a static scalar leaf-less
attribute: we store it broadcast into B's initialization instead of carrying
a python float through jit — see `init_lora` (B starts at zero anyway, so
scaling is applied in `lora_delta` from the "alpha" array).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

# The reference's default target set: encoder q/k/v/out/fc1/fc2
# (`finetune.py:194-198`, prefix `model.encoder`).
DEFAULT_TARGETS = ("q", "k", "v", "out", "fc1", "fc2")


def lora_delta(x, entry: Params):
    """Low-rank delta for one adapted linear; dispatches LoRA vs AdaLoRA.

    `alpha` (scaling) and `mask` (AdaLoRA rank gate) are hyper-parameters,
    not weights — PEFT never trains them. stop_gradient keeps AdamW from
    drifting them even though they ride in the trainable partition (their
    gradients are exactly zero, so the update is exactly zero)."""
    a = entry["A"].astype(x.dtype)
    b = entry["B"].astype(x.dtype)
    h = jnp.dot(x, a)
    if "E" in entry:
        gate = jax.lax.stop_gradient(entry["mask"])
        lam = (entry["E"] * gate).astype(x.dtype)  # [r, 1]
        h = h * lam[..., 0]
    scale = jax.lax.stop_gradient(entry["alpha"]).astype(x.dtype) / a.shape[-1]
    return jnp.dot(h, b) * scale


def _entry_shapes(d_model: int, ffn: int, name: str) -> Tuple[int, int]:
    if name in ("q", "k", "v", "out"):
        return d_model, d_model
    if name == "fc1":
        return d_model, ffn
    if name == "fc2":
        return ffn, d_model
    raise KeyError(name)


def init_lora(
    key,
    config,
    rank: int = 32,
    alpha: float = 64.0,
    targets: Sequence[str] = DEFAULT_TARGETS,
    parts: Sequence[str] = ("encoder",),
    adalora: bool = False,
    dtype=jnp.float32,
    layer_range: Optional[Tuple[int, int]] = None,
) -> Params:
    """Build the adapter tree. A ~ N(0, 1/r) (kaiming-ish), B = 0, so the
    model starts exactly at the base weights (PEFT convention).

    Reference configs: LoRA r=32 α=64 (`finetune.py:210-211`); AdaLoRA
    init_r=12 (`finetune.py:205-208`) — pass rank=12 with adalora=True.

    `layer_range=(lo, hi)` restricts adaptation to layers lo..hi-1 by zeroing
    alpha elsewhere (the reference's `fine_tune_layers` selects the last N
    encoder layers via module-name matching, `finetune.py:189-198` /
    `utils/load_model.py:48-100`; alpha-masking keeps shapes static).
    """
    tree: Params = {}
    for part in parts:
        n_layers = config.encoder_layers if part == "encoder" else config.decoder_layers
        ffn = config.encoder_ffn if part == "encoder" else config.decoder_ffn
        layers: Params = {}
        for name in targets:
            d_in, d_out = _entry_shapes(config.d_model, ffn, name)
            key, k1 = jax.random.split(key)
            alpha_col = np.full((n_layers, 1, 1), alpha, dtype=np.float32)
            if layer_range is not None:
                lo, hi = layer_range
                mask = np.zeros((n_layers, 1, 1), np.float32)
                mask[lo:hi] = 1.0
                alpha_col = alpha_col * mask
            entry = {
                "A": jax.random.normal(k1, (n_layers, d_in, rank), dtype) / np.sqrt(rank),
                "B": jnp.zeros((n_layers, rank, d_out), dtype),
                "alpha": jnp.asarray(alpha_col, dtype),
            }
            if adalora:
                entry["E"] = jnp.zeros((n_layers, rank, 1), dtype)
                entry["mask"] = jnp.ones((n_layers, rank, 1), dtype)
                # PEFT AdaLoRA initializes E to zero and A/B ~ N(0, 0.02)
                key, k2 = jax.random.split(key)
                entry["A"] = 0.02 * jax.random.normal(k2, (n_layers, d_in, rank), dtype)
                key, k3 = jax.random.split(key)
                entry["B"] = 0.02 * jax.random.normal(k3, (n_layers, rank, d_out), dtype)
            dest = layers
            if name in ("q", "k", "v", "out"):
                dest = layers.setdefault("self_attn", {})
            dest[name] = entry
        tree[part] = {"layers": layers}
    return tree


def merge_lora(params: Params, lora: Params) -> Params:
    """Fold adapters into base weights: W += s * A (Λm) B.

    Pure-function equivalent of the reference `merge_lora.py` CLI
    (PEFT `merge_and_unload`, `merge_lora.py:43-44`).
    """
    def fold(dst: Params, src: Params):
        for name, entry in src.items():
            if isinstance(entry, dict) and "A" in entry:
                a, b = entry["A"], entry["B"]
                if "E" in entry:
                    gate = jax.lax.stop_gradient(entry["mask"])
                    a = a * (entry["E"] * gate).transpose(0, 2, 1)
                scale = jax.lax.stop_gradient(entry["alpha"]) / a.shape[-1]
                delta = jnp.einsum("lir,lro->lio", a, b) * scale
                dst[name] = dict(dst[name])
                dst[name]["w"] = dst[name]["w"] + delta.astype(dst[name]["w"].dtype)
            elif isinstance(entry, dict):
                dst[name] = dict(dst[name])
                fold(dst[name], entry)

    new = {k: (dict(v) if isinstance(v, dict) else v) for k, v in params.items()}
    for part, sub in lora.items():
        new[part] = dict(new[part])
        new[part]["layers"] = {
            k: (dict(v) if isinstance(v, dict) else v)
            for k, v in new[part]["layers"].items()
        }
        fold(new[part]["layers"], sub["layers"])
    return new


# ----------------------------------------------------------------------
# AdaLoRA rank allocation (importance-based budget decay)
# ----------------------------------------------------------------------

def adalora_importance(lora: Params, grads: Params) -> Params:
    """Per-rank sensitivity |θ·∂L/∂θ| aggregated over A, B, E for each
    adapted matrix — the PEFT/paper importance score."""
    def entry_imp(entry, gentry):
        sa = jnp.abs(entry["A"] * gentry["A"]).mean(axis=1)          # [L, r]
        sb = jnp.abs(entry["B"] * gentry["B"]).mean(axis=2)          # [L, r]
        se = jnp.abs(entry["E"] * gentry["E"])[..., 0]               # [L, r]
        return sa + sb + se

    return _map_entries(lora, grads, entry_imp)


def _map_entries(lora, other, fn):
    out = {}
    for k, v in lora.items():
        if isinstance(v, dict) and "A" in v:
            out[k] = fn(v, other[k])
        elif isinstance(v, dict):
            out[k] = _map_entries(v, other[k], fn)
    return out


def adalora_budget(step: int, init_r: int, target_r: int, tinit: int,
                   tfinal: int, total_steps: int) -> int:
    """Cubic budget schedule, boundary-exact with PEFT's
    `RankAllocator.budget_schedule`: keep init_r through tinit, hold
    target_r after total_steps - tfinal, cubic decay between.
    Reference config: init_r=12, target_r=4, tinit=200, tfinal=1000
    (`finetune.py:205-208`)."""
    if step <= tinit:
        return init_r
    if step > total_steps - tfinal:
        return target_r
    mul = 1 - (step - tinit) / (total_steps - tfinal - tinit)
    return int((init_r - target_r) * mul**3 + target_r)


def adalora_update_masks_global(
    lora: Params, importance: Params, budget_per_matrix: int
) -> Params:
    """PEFT-faithful GLOBAL rank allocation: the budget is pooled across all
    adapted matrices and the globally most important ranks keep their masks
    (PEFT `RankAllocator.mask_to_budget`), so hot matrices can hold more
    ranks than cold ones. Shapes never change — only masks flip."""
    entries = []

    def collect(tree, imp):
        for k, v in tree.items():
            if isinstance(v, dict) and "A" in v:
                entries.append((v, imp[k]))
            elif isinstance(v, dict):
                collect(v, imp[k])

    collect(lora, importance)
    if not entries:
        return lora
    all_imp = jnp.concatenate([jnp.ravel(i) for _, i in entries])
    total_budget = budget_per_matrix * sum(
        int(i.shape[0]) for _, i in entries  # budget per (layer, matrix)
    )
    total_budget = min(total_budget, all_imp.shape[0])
    if total_budget >= all_imp.shape[0]:
        thresh = -jnp.inf
    else:
        thresh = jnp.sort(all_imp)[-total_budget]

    def rebuild(tree, imp):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict) and "A" in v:
                mask = (imp[k] >= thresh).astype(v["mask"].dtype)[..., None]
                out[k] = {**v, "mask": mask}
            elif isinstance(v, dict):
                out[k] = rebuild(v, imp[k])
            else:
                out[k] = v
        return out

    return rebuild(lora, importance)


def adalora_update_masks(lora: Params, importance: Params, budget: int) -> Params:
    """Keep the top-`budget` ranks per adapted matrix (per layer), zero the
    rest via the mask — shapes never change, so no recompilation."""
    def upd(entry, imp):
        # imp: [L, r]; top-budget per row
        r = entry["mask"].shape[1]
        if budget >= r:
            mask = jnp.ones_like(entry["mask"])
        else:
            thresh = jnp.sort(imp, axis=1)[:, -budget][:, None]  # [L, 1]
            mask = (imp >= thresh).astype(entry["mask"].dtype)[..., None]
        return {**entry, "mask": mask}

    out = {}
    for k, v in lora.items():
        if isinstance(v, dict) and "A" in v:
            out[k] = upd(v, importance[k])
        elif isinstance(v, dict):
            out[k] = adalora_update_masks(v, importance[k], budget)
        else:
            out[k] = v
    return out


def adalora_orth_loss(lora: Params) -> jnp.ndarray:
    """Orthogonality regularizer ||AᵀA − I|| + ||BBᵀ − I|| summed over
    adapted matrices (reference orth_reg_weight=0.5, `finetune.py:208`)."""
    total = 0.0
    leaves: List = []

    def collect(tree):
        for v in tree.values():
            if isinstance(v, dict) and "A" in v:
                if "E" in v:
                    leaves.append((v["A"], v["B"]))
            elif isinstance(v, dict):
                collect(v)

    collect(lora)
    for a, b in leaves:
        r = a.shape[-1]
        eye = jnp.eye(r, dtype=a.dtype)
        ata = jnp.einsum("lir,lis->lrs", a, a)
        bbt = jnp.einsum("lro,lso->lrs", b, b)
        total = total + jnp.mean((ata - eye) ** 2) + jnp.mean((bbt - eye) ** 2)
    return total
