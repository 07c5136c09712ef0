"""The jit-compiled training step.

One compiled program does: (optional) on-device augmentation -> bf16 forward
through the EEG-Whisper -> masked CE (+ AdaLoRA orth reg) -> backward ->
AdamW update on the trainable partition. Under a sharded mesh the same
program is the data-parallel (and TP/FSDP) version — XLA inserts the
gradient all-reduces from the shardings (no DDP machinery; contrast
reference `finetune.py:119-122`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from neuspeech1_tpu.config import StemConfig, WhisperConfig
from neuspeech1_tpu.models import whisper as jw
from neuspeech1_tpu.models.lora import adalora_orth_loss
from neuspeech1_tpu.ops.augment import augment_batch_jnp
from neuspeech1_tpu.train.optimizer import combine_params

Params = Dict[str, Any]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    """Mutable training state. The frozen partition is deliberately NOT part
    of the state so the jitted step can donate state buffers without
    invalidating the caller's base parameters."""

    step: jnp.ndarray
    trainable: Params
    opt_state: Any
    rng: jax.Array
    # AdaLoRA sensitivity/uncertainty EMAs (PEFT RankAllocator exp_avg_ipt /
    # exp_avg_unc); {} when not using AdaLoRA. Not checkpointed — PEFT's
    # allocator state is in-memory only too.
    ipt: Any = None


def init_train_state(
    key, params: Params, lora: Optional[Params], tx, pred
) -> Tuple[TrainState, Params]:
    """Returns (state, frozen_tree) from a full param tree + adapters."""
    from neuspeech1_tpu.train.optimizer import partition_params

    from neuspeech1_tpu.models.lora import adalora_ipt_init

    combined = {"model": params, "lora": lora if lora is not None else {}}
    trainable, frozen = partition_params(combined, pred)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        trainable=trainable,
        opt_state=tx.init(trainable),
        rng=key,
        ipt=adalora_ipt_init(lora or {}),
    )
    return state, frozen


def model_params_of(state: TrainState, frozen: Params) -> Tuple[Params, Optional[Params]]:
    combined = combine_params(state.trainable, frozen)
    lora = combined.get("lora") or None
    if lora is not None and not jax.tree_util.tree_leaves(lora):
        lora = None
    return combined["model"], lora


def make_loss_fn(
    config: WhisperConfig,
    stem: StemConfig,
    orth_reg_weight: float = 0.0,
    fold_lora: bool = False,
    int8_matmul: str = "off",
):
    """With ``fold_lora`` the adapter deltas are materialized into the
    weights ONCE per step (differentiable W_eff = W + s·A(Λm)B) instead of
    running per-token low-rank matmuls in every adapted linear — fewer,
    larger MXU ops at the cost of per-matrix dW_eff gradients.

    NEUSPEECH_FOLD_IMPL picks how (all regimes are gradient-identical,
    pinned by tests/test_folded_linear.py; base weights must be frozen —
    exactly the reference's adapter regime):
      'fc' (default): attention adapters merged, fc adapters through
        `models/lora.py::folded_linear` — a custom VJP whose backward gets
        dA/dB/dE from ONE streaming pass over (x, dy) on the MXU
        (`ops/lora_bwd.py`) instead of autodiff's full-rank dW_eff. The fc
        dW_eff was the expensive 2048-wide 14.6 ms/step of stacked-grad
        assembly at whisper-base bs64; the kernel does those grads in
        8.0 ms and the hybrid measures 202.4 vs 205.6 ms/step all-merge.
      'merge': round-2 behavior, every adapter pre-merged (autodiff builds
        all dW_eff).
      'linear': every adapted linear folded — measured 207.0 (the qkvo
        dW_eff is small and near MXU peak, while pinning those activations
        to the kernel's flat layout costs ~9 ms of XLA layout copies)."""
    import os as _os

    fold_impl = _os.environ.get("NEUSPEECH_FOLD_IMPL", "fc")

    def loss_fn(trainable, frozen, batch, dropout_rng):
        combined = combine_params(trainable, frozen)
        params = combined["model"]
        lora = combined.get("lora") or None
        if lora is not None and not jax.tree_util.tree_leaves(lora):
            lora = None
        reg_lora = lora
        fold_ctx = None
        if fold_lora and lora is not None:
            if fold_impl == "merge":
                from neuspeech1_tpu.models.lora import merge_lora

                params = merge_lora(params, lora)
                lora = None
            elif fold_impl == "fc":
                # hybrid: attention adapters merged (their dW_eff is small
                # and runs near MXU peak), fc adapters through the
                # folded-linear kernel (their dW_eff is the expensive
                # 2048-wide 14.6 ms/step of the stacked-grad assembly)
                from neuspeech1_tpu.models.lora import (
                    merge_lora, split_lora_fc)

                merge_tree, fc_tree = split_lora_fc(lora)
                if jax.tree_util.tree_leaves(merge_tree):
                    params = merge_lora(params, merge_tree)
                lora = fc_tree if jax.tree_util.tree_leaves(fc_tree) else None
                if lora is not None:
                    fold_ctx = jw.fold_at_linear
            else:
                fold_ctx = jw.fold_at_linear
        import contextlib

        # AQT-style int8 training matmuls (ops/int8_matmul): 'fwd' or
        # 'full' routes every `linear`/folded dot through dynamic int8
        # quantization on the int8 MXU (2x bf16 rate); off for eval/decode
        if int8_matmul != "off":
            from neuspeech1_tpu.ops.int8_matmul import int8_mode

            i8_ctx = lambda: int8_mode(int8_matmul)  # noqa: E731
        else:
            i8_ctx = contextlib.nullcontext
        with (fold_ctx() if fold_ctx else contextlib.nullcontext()), \
                i8_ctx():
            logits = jw.forward(
                params,
                batch["input_features"],
                batch["decoder_input_ids"],
                config,
                stem,
                lora=lora,
                deterministic=dropout_rng is None,
                dropout_rng=dropout_rng,
            )
        loss = jw.ce_loss(logits, batch["labels"])
        aux = {"ce_loss": loss}
        if reg_lora is not None and not jax.tree_util.tree_leaves(reg_lora):
            reg_lora = None
        if orth_reg_weight > 0.0 and reg_lora is not None:
            reg = adalora_orth_loss(reg_lora)
            loss = loss + orth_reg_weight * reg
            aux["orth_reg"] = reg
        aux["loss"] = loss
        return loss, aux

    return loss_fn


def make_train_step(
    config: WhisperConfig,
    stem: StemConfig,
    tx,
    orth_reg_weight: float = 0.0,
    augment_config: Optional[dict] = None,
    use_dropout: bool = False,
    donate: bool = True,
    track_adalora_importance: bool = False,
    fold_lora: bool = False,
    adalora_ipt_stop_step: Optional[int] = None,
    int8_matmul: str = "off",
):
    """Returns jitted `train_step(state, frozen, batch) -> (state, metrics)`;
    only `state` is donated. With `track_adalora_importance`, the state's
    AdaLoRA sensitivity/uncertainty EMAs are updated in-jit each step (PEFT
    RankAllocator.update_ipt: ipt = |θ·g| on the POST-update params, the
    reference call order `optimizer.step(); update_and_allocate()`); updates
    stop at `adalora_ipt_stop_step` (PEFT: total_step − tfinal)."""
    loss_fn = make_loss_fn(config, stem, orth_reg_weight,
                           fold_lora=fold_lora, int8_matmul=int8_matmul)

    def train_step(state: TrainState, frozen, batch):
        rng, aug_rng, drop_rng = jax.random.split(state.rng, 3)
        if augment_config:
            batch = dict(batch)
            batch["input_features"] = augment_batch_jnp(
                aug_rng, batch["input_features"], augment_config
            )
        grads, aux = jax.grad(loss_fn, has_aux=True)(
            state.trainable,
            frozen,
            batch,
            drop_rng if use_dropout else None,
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.trainable)
        new_trainable = optax.apply_updates(state.trainable, updates)
        metrics = dict(aux)
        metrics["grad_norm"] = optax.global_norm(grads)
        new_ipt = state.ipt
        if track_adalora_importance and state.ipt:
            from neuspeech1_tpu.models.lora import adalora_ipt_update

            updated = adalora_ipt_update(
                state.ipt, new_trainable["lora"], grads["lora"]
            )
            if adalora_ipt_stop_step is not None:
                keep = state.step < adalora_ipt_stop_step
                updated = jax.tree_util.tree_map(
                    lambda n, o: jnp.where(keep, n, o), updated, state.ipt
                )
            new_ipt = updated
        new_state = TrainState(
            step=state.step + 1,
            trainable=new_trainable,
            opt_state=new_opt,
            rng=rng,
            ipt=new_ipt,
        )
        return new_state, metrics

    if donate:
        return jax.jit(train_step, donate_argnums=(0,))
    return jax.jit(train_step)


def make_eval_step(config: WhisperConfig, stem: StemConfig):
    """jitted eval loss (teacher forcing, no augmentation/dropout)."""
    loss_fn = make_loss_fn(config, stem, 0.0)

    @jax.jit
    def eval_step(trainable, frozen, batch):
        _, aux = loss_fn(trainable, frozen, batch, None)
        mask = batch["labels"] != -100
        n_tokens = jnp.sum(mask)
        return {"loss": aux["ce_loss"], "n_tokens": n_tokens}

    return eval_step
