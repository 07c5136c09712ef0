"""Optimizer / schedule / trainable-parameter partitioning.

Reference training config (HF Seq2SeqTrainer defaults + `finetune.py:231-253`):
AdamW, linear warmup (500 steps) then linear decay to zero over total steps,
lr 1e-3, fp16 (-> bf16 here), gradient accumulation via `optax.MultiSteps`.

Trainable-set semantics mirror `finetune.py:176-212`: everything frozen
except the adapter tree and the stem convs (`modules_to_save=['...conv1',
'...conv2']`, `finetune.py:202`); `ft_full` / `fine_tune_layers` widen the
predicate.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import optax

Params = Dict[str, Any]
PathPred = Callable[[str], bool]


def path_of(kp) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)


def default_trainable_pred(
    ft_full: bool = False, fine_tune_layers: Optional[int] = None
) -> PathPred:
    """Paths under the combined {"model": ..., "lora": ...} tree.

    default: lora/* + model/encoder/stem/* + model/encoder/conv2/*
    ft_full: everything (`finetune.py:191` ft_full branch)
    fine_tune_layers=n (reference: LoRA on the FIRST n encoder layers,
      `finetune.py:190`) is not expressible per-layer in a stacked tree
      without masking; the adapter route covers it instead via
      `init_lora(layer_range=(0, n))` — see cli/finetune.py.
    """
    if ft_full:
        return lambda p: True
    return lambda p: (
        p.startswith("lora/")
        or p.startswith("model/encoder/stem/")
        or p.startswith("model/encoder/conv2/")
    )


def partition_params(tree: Params, pred: PathPred) -> Tuple[Params, Params]:
    """Split into (trainable, frozen) trees of identical structure with None
    at the other side's leaves (jax treats None as an empty subtree, so
    grads/optimizers only ever see the trainable leaves)."""
    flat = jax.tree_util.tree_flatten_with_path(tree)
    train = jax.tree_util.tree_map_with_path(
        lambda kp, x: x if pred(path_of(kp)) else None, tree
    )
    frozen = jax.tree_util.tree_map_with_path(
        lambda kp, x: None if pred(path_of(kp)) else x, tree
    )
    return train, frozen


def combine_params(train: Params, frozen: Params) -> Params:
    """Inverse of partition_params."""
    def pick(a, b):
        return a if a is not None else b

    return jax.tree_util.tree_map(
        pick, train, frozen, is_leaf=lambda x: x is None
    )


# Leaves that are hyper-parameters or norm/bias terms — never weight-decayed
# (HF Trainer excludes bias/LayerNorm by default; LoRA 'alpha'/'mask' are not
# weights at all and must not decay even though they sit in the trainable
# partition — see models/lora.py::lora_delta stop_gradient note).
_NO_DECAY_LEAVES = {"b", "bias", "scale", "alpha", "mask"}


def weight_decay_mask(params: Params) -> Params:
    return jax.tree_util.tree_map_with_path(
        lambda kp, _: path_of(kp).rsplit("/", 1)[-1] not in _NO_DECAY_LEAVES,
        params,
    )


def warmup_linear_schedule(
    peak_lr: float, warmup_steps: int, total_steps: int
) -> optax.Schedule:
    """HF Trainer's default 'linear' schedule: 0 -> peak over warmup, then
    linear decay to 0 at total_steps."""
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, peak_lr, max(warmup_steps, 1)),
            optax.linear_schedule(
                peak_lr, 0.0, max(total_steps - warmup_steps, 1)
            ),
        ],
        [warmup_steps],
    )


def make_optimizer(
    peak_lr: float = 1e-3,
    warmup_steps: int = 500,
    total_steps: int = 100_000,
    weight_decay: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    grad_clip: Optional[float] = 1.0,
    accum_steps: int = 1,
) -> optax.GradientTransformation:
    """AdamW + warmup-linear + clip (+ MultiSteps accumulation).

    HF Trainer defaults: max_grad_norm=1.0, adam eps 1e-8, wd 0.0
    (the reference never sets weight_decay).
    """
    sched = warmup_linear_schedule(peak_lr, warmup_steps, total_steps)
    chain = []
    if grad_clip:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(
        optax.adamw(
            sched, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay,
            mask=weight_decay_mask if weight_decay else None,
        )
    )
    tx = optax.chain(*chain)
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx
