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

from functools import partial
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
        # PEFT semantics: rank pruning zeroes lora_E at allocation time
        # (adalora_mask_to_budget); the forward does NOT gate on `mask`, so
        # pruned ranks keep receiving gradients and can revive.
        lam = entry["E"].astype(x.dtype)  # [r, 1]
        h = h * lam[..., 0]
    scale = jax.lax.stop_gradient(entry["alpha"]).astype(x.dtype) / a.shape[-1]
    return jnp.dot(h, b) * scale


# ----------------------------------------------------------------------
# Folded linear with low-rank-only backward (training hot path)
# ----------------------------------------------------------------------

def _w_eff_of(w, entry: Params):
    """W + s*A(Em)B for one LAYER-SLICED entry (A [din,r], B [r,dout],
    E [r,1], alpha [1,1]) — same math/dtype staging as `merge_lora`
    (delta in f32, added to the f32 master weight)."""
    a = entry["A"]
    if "E" in entry:
        a = a * entry["E"][..., 0][None, :]
    scale = jax.lax.stop_gradient(entry["alpha"]).reshape(()) / a.shape[-1]
    return w + (a @ entry["B"]) * scale


def folded_linear(x, p: Params, entry: Params):
    """x @ (W + s*A(Em)B) + bias with a LOW-RANK-ONLY backward.

    The active `ops.int8_matmul` mode is captured STATICALLY here (forward
    trace time — the backward traces after the int8_mode context exits)
    and routes the big W_eff / dx dots through the quantized matmul; the
    narrow rank-r adapter products stay exact.

    FROZEN-BASE CONTRACT: the base weight/bias cotangents are returned as
    zeros — callers must guarantee W and bias are in the frozen partition
    (exactly the reference's fold_lora training regime: LoRA/AdaLoRA
    adapters + stem trainable, base frozen; `finetune.py:176-177,205-212`).
    `make_loss_fn(fold_lora=True)` is the only caller.

    Why: autodiff through a pre-merged W_eff materializes full-rank dW_eff
    for every adapted matrix — 3.7 TFLOP/step + a 21.9 ms/step stacked
    f32 gradient assembly at whisper-base bs64 (round-3 device trace),
    even though only dA/dB/dE (rank-32) are consumed. This backward
    computes them directly with narrow dots:
        t1 = dy B^T [N,r]; u = x A [N,r]
        dA = s * (x^T t1) * (Em);  dB = s * (u*Em)^T dy
        dE = s * rowsum(u * t1)
    """
    from neuspeech1_tpu.ops import int8_matmul as _i8

    return _folded_linear(_i8.mode(), x, p, entry)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _folded_linear(i8: str, x, p: Params, entry: Params):
    w_eff = _w_eff_of(p["w"], entry).astype(x.dtype)
    y = _flat_dot(x, w_eff, i8=i8)
    if p.get("b") is not None:
        y = y + p["b"].astype(x.dtype)
    return y


def _tmajor() -> bool:
    """MEASURED REJECT, kept selectable. Hypothesis: flatten [B, T, d]
    activations T-MAJOR (transpose(1,0,2) before the flat reshape) so the
    flatten is a free bitcast under the {2,0,1} (T-outer) layout XLA
    prefers for these activations, killing the ~9 ms/step of standalone
    transposes the round-3 trace blamed on the pallas operands' pinned
    {2,1,0}. Measured (whisper-base bs64 noremat, round 3): fc fold
    202.6 -> 227.8 ms/step, linear fold 207.0 -> 237.3 — XLA's layout
    solver does NOT settle on {2,0,1} in the fold regime, so the explicit
    transposes materialize on top of the existing copies. The kernel's
    token sums are order-invariant, so either orientation is correct
    (tests pass under both)."""
    import os

    return os.environ.get("NEUSPEECH_FOLD_TMAJOR", "0") == "1"


def _flat_dot(x, w, i8: str = "off"):
    """x @ w through a flat [N, din] view — keeps every producer/consumer
    of the folded path on the flat {1,0} layout the backward kernel pins
    (mixed 3D/flat forms made XLA materialize {2,0,1}<->{2,1,0} copies).
    ``i8`` != 'off' runs the dot as a dynamic int8 matmul
    (ops/int8_matmul._qdot2 — raw, no STE wrapper: this call sits inside
    folded_linear's custom VJP, which owns the gradients)."""
    from neuspeech1_tpu.ops.int8_matmul import _qdot2

    dot2 = ((lambda a, b: _qdot2(a, b, a.dtype)) if i8 != "off"
            else (lambda a, b: jnp.dot(a, b)))
    din = x.shape[-1]
    if x.ndim == 3 and _tmajor():
        bb, tt, _ = x.shape
        y = dot2(x.transpose(1, 0, 2).reshape(bb * tt, din), w)
        return y.reshape(tt, bb, w.shape[-1]).transpose(1, 0, 2)
    n = 1
    for s in x.shape[:-1]:
        n *= s
    return dot2(x.reshape(n, din), w).reshape(*x.shape[:-1], w.shape[-1])


def _folded_linear_fwd(i8, x, p, entry):
    w_eff = _w_eff_of(p["w"], entry).astype(x.dtype)
    y = _flat_dot(x, w_eff, i8=i8)
    if p.get("b") is not None:
        y = y + p["b"].astype(x.dtype)
    return y, (x, w_eff, p, entry)


def _folded_linear_bwd(i8, res, dy):
    x, w_eff, p, entry = res
    a = entry["A"]
    b = entry["B"]
    r = a.shape[-1]
    din = x.shape[-1]
    dout = dy.shape[-1]
    n_tokens = 1
    for s in x.shape[:-1]:
        n_tokens *= s
    scale32 = (jax.lax.stop_gradient(entry["alpha"]).reshape(())
               / r).astype(jnp.float32)

    from neuspeech1_tpu.ops import lora_bwd as _lb

    block_n = (_lb.pick_block_n(n_tokens, din, dout, r)
               if _lb.on_tpu() else None)
    if block_n is not None:
        # fused one-pass kernel: all four narrow adapter products from ONE
        # streaming pass over (x, dy) (ops/lora_bwd.py). dx stays an XLA
        # dot: measured in-kernel dx = 228 ms/step vs 207 (the kernel's
        # per-block matmul loses the deep pipelining + consumer fusion of
        # XLA's dx dot, and its VMEM footprint shrinks the token blocks).
        tmaj = x.ndim == 3 and _tmajor()
        if tmaj:
            # T-major flatten: free bitcast under the {2,0,1} layout XLA
            # prefers for these activations (see _tmajor); the kernel's
            # token sums are order-invariant
            dy2 = dy.transpose(1, 0, 2).reshape(n_tokens, dout)
            x2 = x.transpose(1, 0, 2).reshape(n_tokens, din)
        else:
            dy2 = dy.reshape(n_tokens, dout)
            x2 = x.reshape(n_tokens, din)
        da32, db_raw, de_raw = _lb.lora_adapter_bwd(
            x2, dy2, a.astype(x.dtype), b.astype(dy.dtype), block_n=block_n)
        da32 = da32 * scale32
        de32 = de_raw * scale32
        # flat dx dot so dy's two consumers (kernel + this dot) agree on
        # the flat {1,0} layout. Layout note (round-3 traces): XLA prefers
        # {2,0,1} (T-outer) operands for these dots and hides the
        # transposes inside fusions; a pallas operand pins {2,1,0} and
        # turns them into ~9 ms/step of standalone copies — measured
        # equal whether dx is flat, 3D-einsum, or in-kernel (207 / 207.2 /
        # 228 ms/step vs 205.6 for NEUSPEECH_FOLD_IMPL=merge).
        if i8 == "full":
            from neuspeech1_tpu.ops.int8_matmul import _qdot2

            dx = _qdot2(dy2, w_eff.T, dy2.dtype)
        else:
            dx = jnp.dot(dy2, w_eff.T)
        if tmaj:
            dx = dx.reshape(x.shape[1], x.shape[0], din).transpose(1, 0, 2)
            dx = dx.astype(x.dtype)
        else:
            dx = dx.reshape(x.shape).astype(x.dtype)
    else:
        if i8 == "full":
            from neuspeech1_tpu.ops.int8_matmul import _qdot2

            n_t, dout_ = n_tokens, dy.shape[-1]
            dx = _qdot2(dy.reshape(n_t, dout_), w_eff.T,
                        dy.dtype).reshape(x.shape).astype(x.dtype)
        else:
            dx = jnp.einsum("...o,do->...d", dy, w_eff).astype(x.dtype)
        lead = tuple(range(x.ndim - 1))  # contracted batch/time dims
        t1 = jnp.einsum("...o,ro->...r", dy, b.astype(dy.dtype))  # [..., r]
        u = jnp.einsum("...d,dr->...r", x, a.astype(x.dtype))     # [..., r]
        da32 = jax.lax.dot_general(
            x, t1, (((lead), (lead)), ((), ())),
            preferred_element_type=jnp.float32) * scale32         # [din, r]
        db_raw = jax.lax.dot_general(
            u, dy, (((lead), (lead)), ((), ())),
            preferred_element_type=jnp.float32)                   # [r, dout]
        de32 = jnp.einsum("...r,...r->r", u, t1,
                          preferred_element_type=jnp.float32) * scale32
    # cotangents must mirror the input pytrees exactly: start from zeros
    # (hyper-parameter leaves like alpha/mask keep exact-zero grads — PEFT
    # never trains them) and fill in the low-rank grads
    zeros = lambda t: jax.tree_util.tree_map(jnp.zeros_like, t)
    d_entry = zeros(entry)
    if "E" in entry:
        ge = entry["E"][..., 0]                        # [r] f32
        d_entry["E"] = de32[:, None].astype(entry["E"].dtype)
        da32 = da32 * ge[None, :].astype(jnp.float32)
        db32 = ge[:, None].astype(jnp.float32) * db_raw * scale32
    else:
        db32 = db_raw * scale32
    d_entry["A"] = da32.astype(entry["A"].dtype)
    d_entry["B"] = db32.astype(entry["B"].dtype)
    # frozen-base contract: zero cotangents (DCE'd — base is never trained
    # under fold; see the docstring)
    d_p = zeros(p)
    return dx, d_p, d_entry


_folded_linear.defvjp(_folded_linear_fwd, _folded_linear_bwd)


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
    alpha elsewhere (the reference's `fine_tune_layers=n` selects the FIRST
    n encoder layers via module-name matching — `range(n)` at
    `finetune.py:190` / `utils/load_model.py:48-100`; alpha-masking keeps
    shapes static).
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


def split_lora_fc(lora: Params) -> Tuple[Params, Params]:
    """Partition the adapter tree into (attention entries, fc entries),
    preserving structure — the hybrid NEUSPEECH_FOLD_IMPL=fc train path
    merges the former and runs the latter through `folded_linear`."""
    def walk(t):
        m: Params = {}
        f: Params = {}
        for k, v in t.items():
            if isinstance(v, dict) and "A" in v:
                (f if k in ("fc1", "fc2") else m)[k] = v
            elif isinstance(v, dict):
                sm, sf = walk(v)
                if sm:
                    m[k] = sm
                if sf:
                    f[k] = sf
        return m, f

    return walk(lora)


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
                    # E already holds zeros at pruned ranks (PEFT semantics)
                    a = a * entry["E"].transpose(0, 2, 1)
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
#
# Faithful to PEFT's RankAllocator (peft/tuners/adalora/model.py):
#   * TWO elementwise EMAs per A/B/E tensor — sensitivity |θ·g| smoothed
#     with beta1 and an uncertainty EMA of |ipt − avg| with beta2;
#   * element score = avg · unc, reduced per rank AFTER smoothing
#     (mean over A's input dim, mean over B's output dim, E elementwise);
#   * triplet score = s(E) + mean(A) + mean(B);
#   * allocation zeroes lora_E at pruned ranks (masked_fill) — the forward
#     does NOT gate on the mask, so pruned ranks keep receiving gradients
#     and can revive at a later allocation, exactly like PEFT.
# `mask` remains in the tree as the current 0/1 rank pattern (bookkeeping
# + tests); it never enters the forward computation.
# ----------------------------------------------------------------------

def adalora_ipt_init(lora: Params) -> Params:
    """Zeroed {avg, unc} EMA trees over the A/B/E leaves of AdaLoRA
    entries (PEFT exp_avg_ipt / exp_avg_unc)."""
    def walk(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict) and "A" in v:
                if "E" in v:
                    out[k] = {n: jnp.zeros_like(v[n]) for n in ("A", "B", "E")}
            elif isinstance(v, dict):
                sub = walk(v)
                if sub:
                    out[k] = sub
        return out

    zeros = walk(lora)
    if not zeros:
        return {}
    # distinct buffers for avg and unc — aliased leaves would break jit
    # donation ("attempt to donate the same buffer twice")
    unc = jax.tree_util.tree_map(jnp.zeros_like, zeros)
    return {"avg": zeros, "unc": unc}


def adalora_ipt_update(
    ipt_state: Params,
    lora: Params,
    grads: Params,
    beta1: float = 0.85,
    beta2: float = 0.85,
) -> Params:
    """One PEFT `update_ipt` step: ipt = |θ·g|; avg ← β₁avg + (1−β₁)ipt;
    unc ← β₂unc + (1−β₂)|ipt − avg_new| (uses the UPDATED avg, matching the
    in-place order in PEFT)."""
    def upd(avg_tree, unc_tree, lora_tree, grad_tree):
        new_avg, new_unc = {}, {}
        for k, v in avg_tree.items():
            if isinstance(v, dict) and "A" in v:
                na, nu = {}, {}
                for n in ("A", "B", "E"):
                    ipt = jnp.abs(lora_tree[k][n] * grad_tree[k][n])
                    a = beta1 * v[n] + (1 - beta1) * ipt
                    na[n] = a
                    nu[n] = beta2 * unc_tree[k][n] + (1 - beta2) * jnp.abs(ipt - a)
                new_avg[k], new_unc[k] = na, nu
            else:
                new_avg[k], new_unc[k] = upd(
                    v, unc_tree[k], lora_tree[k], grad_tree[k]
                )
        return new_avg, new_unc

    avg, unc = upd(ipt_state["avg"], ipt_state["unc"], lora, grads)
    return {"avg": avg, "unc": unc}


def adalora_triplet_scores(ipt_state: Params) -> Params:
    """Per-rank triplet importance [L, r] per adapted matrix:
    s(E) + mean_in(s(A)) + mean_out(s(B)) with s = avg·unc
    (PEFT `_element_score` + `_combine_ipt`)."""
    def walk(avg_tree, unc_tree):
        out = {}
        for k, v in avg_tree.items():
            if isinstance(v, dict) and "A" in v:
                u = unc_tree[k]
                sa = (v["A"] * u["A"]).mean(axis=1)        # [L, r]
                sb = (v["B"] * u["B"]).mean(axis=2)        # [L, r]
                se = (v["E"] * u["E"])[..., 0]             # [L, r]
                out[k] = se + sa + sb
            else:
                out[k] = walk(v, unc_tree[k])
        return out

    return walk(ipt_state["avg"], ipt_state["unc"])


def adalora_total_ranks(lora: Params) -> int:
    """init_bgt in PEFT terms: one budget unit per (layer, matrix, rank)."""
    total = 0

    def walk(tree):
        nonlocal total
        for v in tree.values():
            if isinstance(v, dict) and "A" in v:
                if "E" in v:
                    total += int(v["E"].shape[0] * v["E"].shape[1])
            elif isinstance(v, dict):
                walk(v)

    walk(lora)
    return total


def adalora_matrix_count(lora: Params) -> int:
    """Number of (layer, matrix) adapted units — PEFT's len(name_set) × L."""
    count = 0

    def walk(tree):
        nonlocal count
        for v in tree.values():
            if isinstance(v, dict) and "A" in v:
                if "E" in v:
                    count += int(v["E"].shape[0])
            elif isinstance(v, dict):
                walk(v)

    walk(lora)
    return count


def adalora_apply_pattern(lora: Params, pattern: Params) -> Params:
    """Re-apply a frozen 0/1 rank pattern: E ← E·mask (PEFT
    `mask_using_rank_pattern`, called every step of the final phase because
    pruned-rank E entries keep receiving gradients and regrow)."""
    def rebuild(tree, pat):
        out = {}
        for key, v in tree.items():
            if isinstance(v, dict) and "A" in v:
                if "E" not in v:
                    out[key] = v
                    continue
                m = pat[key]
                out[key] = {**v, "E": v["E"] * m,
                            "mask": m.astype(v["mask"].dtype)}
            elif isinstance(v, dict):
                out[key] = rebuild(v, pat[key])
            else:
                out[key] = v
        return out

    return rebuild(lora, pattern)


def adalora_pattern_of(lora: Params) -> Params:
    """Extract the current 0/1 mask tree (rank pattern) from the adapters."""
    def walk(tree):
        out = {}
        for key, v in tree.items():
            if isinstance(v, dict) and "A" in v:
                if "E" in v:
                    out[key] = v["mask"]
            elif isinstance(v, dict):
                sub = walk(v)
                if sub:
                    out[key] = sub
        return out

    return walk(lora)


def adalora_budget_schedule(
    step: int, init_bgt: int, target_bgt: int, tinit: int, tfinal: int,
    total_steps: int, deltaT: int,
) -> Tuple[int, bool]:
    """(budget, mask_ind) — exact PEFT `budget_schedule` in total-rank
    units (cubic decay computed on budgets, not per-matrix ranks)."""
    if step <= tinit:
        return init_bgt, False
    if step > total_steps - tfinal:
        return target_bgt, True
    mul = 1 - (step - tinit) / (total_steps - tfinal - tinit)
    budget = int((init_bgt - target_bgt) * mul**3 + target_bgt)
    return budget, (step % deltaT == 0)


def adalora_mask_to_budget(
    lora: Params, scores: Params, budget: int, init_bgt: Optional[int] = None
) -> Params:
    """PEFT `mask_to_budget`: global threshold = k-th smallest triplet score
    with k = init_bgt − budget; E is zeroed where score <= threshold and
    `mask` records the surviving rank pattern."""
    if init_bgt is None:
        init_bgt = adalora_total_ranks(lora)
    k = init_bgt - budget
    entries: List[Tuple[Params, Any]] = []

    def collect(tree, sc):
        for key, v in tree.items():
            if isinstance(v, dict) and "A" in v:
                if "E" in v:
                    entries.append((v, sc[key]))
            elif isinstance(v, dict):
                collect(v, sc[key])

    collect(lora, scores)
    if not entries or k <= 0:
        return lora
    all_scores = jnp.concatenate([jnp.ravel(s) for _, s in entries])
    thresh = jnp.sort(all_scores)[k - 1]  # k-th smallest (torch.kthvalue)

    def rebuild(tree, sc):
        out = {}
        for key, v in tree.items():
            if isinstance(v, dict) and "A" in v:
                if "E" not in v:
                    out[key] = v
                    continue
                keep = (sc[key] > thresh)[..., None]       # [L, r, 1]
                out[key] = {
                    **v,
                    "E": jnp.where(keep, v["E"], 0.0),
                    "mask": keep.astype(v["mask"].dtype),
                }
            elif isinstance(v, dict):
                out[key] = rebuild(v, sc[key])
            else:
                out[key] = v
        return out

    return rebuild(lora, scores)


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
    """Global rank allocation from per-rank [L, r] importance trees —
    thin wrapper over `adalora_mask_to_budget` (the budget is pooled across
    all adapted matrices; hot matrices hold more ranks than cold ones)."""
    n_rows = 0

    def count(tree):
        nonlocal n_rows
        for v in tree.values():
            if isinstance(v, dict) and "A" in v:
                if "E" in v:
                    n_rows += int(v["E"].shape[0])
            elif isinstance(v, dict):
                count(v)

    count(lora)
    budget = budget_per_matrix * n_rows
    return adalora_mask_to_budget(lora, importance, budget)


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
