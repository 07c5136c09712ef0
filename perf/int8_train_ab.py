"""A/B: bf16 vs int8 (AQT-style) quantized-matmul training, on-chip.

VERDICT round-3 item 1: the only physics lever past MFU 0.546 is v5e's
int8 MXU (~2x bf16). ops/int8_matmul.py implements the AQT recipe
(dynamic symmetric per-contraction-vector scales, int32 accumulation,
straight-through grads); this measures what it actually buys at the
flagship configuration (whisper-base EEG, bs64, 208ch x 6000, bf16,
LoRA r=32 folded, remat=False), plus trajectory fidelity: K steps of the
int8 program on the SAME batch stream as the exact program, comparing the
final loss.

Methodology per CLAUDE.md: K chained data-dependent steps, ONE final
device->host loss fetch, median of 3.

Usage: python perf/int8_train_ab.py [base|large]
  base  (default) — whisper-base, bs64, remat=False (round-4 verdict:
        clean reject, bf16 200.2 vs int8-full 280.1 ms/step)
  large — whisper-LARGE-V3 geometry (d1280, 32+32, 20 heads), bs4,
        remat=True: settles BASELINE.md's "int8 turns favourable at
        large widths" extrapolation with a measurement (round-4 VERDICT
        item 4 — the dot/quantize ratio grows with d_model).
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from neuspeech1_tpu import enable_compilation_cache
from neuspeech1_tpu.config import StemConfig, WhisperConfig, preset_config
from neuspeech1_tpu.models.init import init_params
from neuspeech1_tpu.models.lora import init_lora
from neuspeech1_tpu.train import optimizer as opt
from neuspeech1_tpu.train import trainstep as ts

enable_compilation_cache()

GEOMETRY = (sys.argv[1] if len(sys.argv) > 1 else "base").lower()
stem = StemConfig("base", in_channels=208)
if GEOMETRY == "large":
    B, L = 4, 64
    REMAT = True
else:
    B, L = 64, 64
    REMAT = False
rng = np.random.default_rng(0)
batch = {
    "input_features": jnp.asarray(
        rng.standard_normal((B, 208, 6000)).astype(np.float32)
    ).astype(jnp.bfloat16),
    "labels": jnp.asarray(rng.integers(0, 50000, (B, L)).astype(np.int32)),
    "decoder_input_ids": jnp.asarray(
        rng.integers(0, 50000, (B, L)).astype(np.int32)),
}


def build(int8: str, remat: bool = REMAT):
    config = (preset_config("large", remat=remat) if GEOMETRY == "large"
              else WhisperConfig(remat=remat))
    params = init_params(jax.random.key(0), config, stem)
    lora = init_lora(jax.random.key(1), config, rank=32, alpha=64)
    tx = opt.make_optimizer(peak_lr=1e-3, warmup_steps=500,
                            total_steps=100_000)
    state, frozen = ts.init_train_state(
        jax.random.key(2), params, lora, tx, opt.default_trainable_pred())
    step = ts.make_train_step(config, stem, tx, fold_lora=True,
                              int8_matmul=int8)
    return state, frozen, step


def timed(tag, int8, K=20, remat=REMAT):
    try:
        state, frozen, step = build(int8, remat=remat)
        state, m = step(state, frozen, batch)
        float(jax.device_get(m["loss"]))  # compile + sync
        totals = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(K):
                state, m = step(state, frozen, batch)
            float(jax.device_get(m["loss"]))
            totals.append(time.perf_counter() - t0)
        dt = sorted(totals)[1] / K
        out = {"k": tag, "step_ms": round(dt * 1e3, 1),
               "samples_per_sec": round(B / dt, 1)}
        print(json.dumps(out), flush=True)
        return dt
    except Exception as e:
        print(json.dumps({"k": tag, "error": f"{type(e).__name__}: "
                          f"{str(e)[:300]}"}), flush=True)
        return None


def trajectory(int8, K=12):
    """Final loss after K steps on a varying batch stream (same stream for
    every mode: batch scaled by a per-step constant so each step's input
    differs without host round-trips)."""
    state, frozen, step = build(int8)
    b = dict(batch)
    for i in range(K):
        b["input_features"] = batch["input_features"] * jnp.bfloat16(
            1.0 + 0.01 * i)
        state, m = step(state, frozen, b)
    return float(jax.device_get(m["loss"]))


if __name__ == "__main__":
    K = 8 if GEOMETRY == "large" else 20  # large step is ~300 ms
    t_off = timed(f"bf16_exact_{GEOMETRY}", "off", K=K)
    t_fwd = timed(f"int8_fwd_{GEOMETRY}", "fwd", K=K)
    t_full = timed(f"int8_full_{GEOMETRY}", "full", K=K)
    if t_off and t_full:
        print(json.dumps({"k": f"speedup_full_vs_bf16_{GEOMETRY}",
                          "x": round(t_off / t_full, 3)}), flush=True)
    l_off = trajectory("off")
    l_full = trajectory("full")
    rel = abs(l_full - l_off) / max(abs(l_off), 1e-9)
    print(json.dumps({"k": "trajectory_12step_loss",
                      "bf16": round(l_off, 4), "int8_full": round(l_full, 4),
                      "rel": round(rel, 4)}), flush=True)
