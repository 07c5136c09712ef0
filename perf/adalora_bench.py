"""AdaLoRA-vs-LoRA training-step cost on the real chip (VERDICT r2 item 4).

The reference's published adapter config is AdaLoRA init_r=12 -> target_r=4
with tinit=200 / tfinal=1000 / deltaT=10 (`/root/reference/finetune.py:
205-208`); bench.py's headline measures LoRA r=32 + fold_lora. This panel
times, at the flagship geometry (whisper-base EEG, bs64, bf16, remat=False):

  lora32_fold      — the bench.py configuration (baseline);
  adalora12        — AdaLoRA step with in-jit sensitivity/uncertainty EMA
                     tracking (what runs EVERY step);
  adalora12_alloc  — plus the host-side global allocation every deltaT=10
                     steps exactly as the Trainer drives it (reads the ipt
                     EMAs back, global sort, masks lora_E) — the full
                     update_and_allocate cost including its device->host
                     syncs.

One JSON line per row: chained-K timing (the perf/overhead.py methodology).
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from neuspeech1_tpu import enable_compilation_cache
from neuspeech1_tpu.config import StemConfig, WhisperConfig
from neuspeech1_tpu.models.init import init_params
from neuspeech1_tpu.models.lora import (
    adalora_budget_schedule,
    adalora_mask_to_budget,
    adalora_matrix_count,
    adalora_total_ranks,
    adalora_triplet_scores,
    init_lora,
)
from neuspeech1_tpu.train import optimizer as opt
from neuspeech1_tpu.train import trainstep as ts

enable_compilation_cache()

BS, LABEL = 64, 64
ADA = dict(init_r=12, target_r=4, tinit=200, tfinal=1000, deltaT=10,
           total_steps=2000)

config = WhisperConfig(remat=False)
stem = StemConfig("base", in_channels=208)
rng = np.random.default_rng(0)
batch = {
    "input_features": jnp.asarray(
        rng.standard_normal((BS, 208, 6000)).astype(np.float32)),
    "labels": jnp.asarray(rng.integers(0, 50000, (BS, LABEL)).astype(np.int32)),
    "decoder_input_ids": jnp.asarray(
        rng.integers(0, 50000, (BS, LABEL)).astype(np.int32)),
}


def build(adalora: bool, **step_kw):
    params = init_params(jax.random.key(0), config, stem)
    if adalora:
        lora = init_lora(jax.random.key(1), config, rank=ADA["init_r"],
                         alpha=32.0, adalora=True)
    else:
        lora = init_lora(jax.random.key(1), config, rank=32, alpha=64.0)
    tx = opt.make_optimizer(peak_lr=1e-3, warmup_steps=500, total_steps=100_000)
    state, frozen = ts.init_train_state(
        jax.random.key(2), params, lora, tx, opt.default_trainable_pred())
    step = ts.make_train_step(config, stem, tx, **step_kw)
    return state, frozen, step


def host_allocate(state, step_num: int):
    """The Trainer's _adalora_update masking path, driven unconditionally
    (the bench pins step_num inside the masking window)."""
    import dataclasses

    lora = state.trainable.get("lora")
    init_bgt = adalora_total_ranks(lora)
    n_mat = max(adalora_matrix_count(lora), 1)
    budget, _ = adalora_budget_schedule(
        step_num, init_bgt, ADA["target_r"] * n_mat, ADA["tinit"],
        ADA["tfinal"], ADA["total_steps"], ADA["deltaT"])
    scores = adalora_triplet_scores(state.ipt)
    new_lora = adalora_mask_to_budget(lora, scores, budget, init_bgt)
    return dataclasses.replace(
        state, trainable={**state.trainable, "lora": new_lora})


def timed(tag, state, frozen, step, allocate_every=0, base_step=400):
    s, m = step(state, frozen, batch)  # compile
    float(jax.device_get(m["loss"]))
    s, m = step(s, frozen, batch)
    float(jax.device_get(m["loss"]))
    K = 20
    totals = []
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(K):
            s, m = step(s, frozen, batch)
            if allocate_every and (i + 1) % allocate_every == 0:
                s = host_allocate(s, base_step + i)
        float(jax.device_get(m["loss"]))
        totals.append(time.perf_counter() - t0)
    dt = sorted(totals)[1] / K
    print(json.dumps({
        "config": tag, "batch": BS, "step_ms": round(dt * 1e3, 1),
        "samples_per_sec": round(BS / dt, 1),
    }), flush=True)
    return dt


state, frozen, step = build(False, fold_lora=True)
t_lora = timed("lora32_fold", state, frozen, step)

state, frozen, step = build(True, fold_lora=True,
                            track_adalora_importance=True,
                            adalora_ipt_stop_step=1000)
t_ada = timed("adalora12", state, frozen, step)

state, frozen, step = build(True, fold_lora=True,
                            track_adalora_importance=True,
                            adalora_ipt_stop_step=1000)
t_ada_alloc = timed("adalora12_alloc", state, frozen, step,
                    allocate_every=ADA["deltaT"])

print(json.dumps({
    "config": "summary",
    "adalora_overhead_pct": round(100 * (t_ada / t_lora - 1), 2),
    "alloc_overhead_pct": round(100 * (t_ada_alloc / t_ada - 1), 2),
}), flush=True)
