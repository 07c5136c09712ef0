"""On-chip numerics check: folded-linear (fused kernel backward) vs merge.

Runs TWO train steps of the flagship config under NEUSPEECH_FOLD_IMPL=
linear and =merge from identical initial state and compares losses and the
trainable-update norms. The CPU suite pins the einsum fallback to merge
exactly (tests/test_folded_linear.py); this probe covers the TPU kernel
path (ops/lora_bwd.py) at production shapes, where bf16/f32 accumulation
order differs slightly.

Usage: python perf/fold_equiv_check.py [--adalora]
"""
import argparse
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

from neuspeech1_tpu import enable_compilation_cache
from neuspeech1_tpu.config import StemConfig, WhisperConfig
from neuspeech1_tpu.models.init import init_params
from neuspeech1_tpu.models.lora import init_lora
from neuspeech1_tpu.train import optimizer as opt
from neuspeech1_tpu.train import trainstep as ts

enable_compilation_cache()


def run(impl, adalora, batch):
    os.environ["NEUSPEECH_FOLD_IMPL"] = impl
    config = WhisperConfig(remat=False)
    stem = StemConfig("base", in_channels=208)
    params = init_params(jax.random.key(0), config, stem)
    lora = init_lora(jax.random.key(1), config, rank=32, alpha=64,
                     adalora=adalora)
    # B starts at zero (PEFT): perturb so dA has signal through A@B
    lora = jax.tree_util.tree_map(lambda v: v + jnp.float32(0.01), lora)
    tx = opt.make_optimizer(peak_lr=1e-3, warmup_steps=5, total_steps=100)
    state, frozen = ts.init_train_state(
        jax.random.key(2), params, lora, tx, opt.default_trainable_pred())
    step = ts.make_train_step(config, stem, tx, fold_lora=True, donate=False)
    losses = []
    for _ in range(2):
        state, m = step(state, frozen, batch)
        losses.append(float(jax.device_get(m["loss"])))
    return losses, state.trainable


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--adalora", action="store_true")
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    batch = {
        "input_features": jnp.asarray(
            rng.standard_normal((64, 208, 6000)).astype(np.float32)),
        "labels": jnp.asarray(
            rng.integers(0, 50000, (64, 64)).astype(np.int32)),
        "decoder_input_ids": jnp.asarray(
            rng.integers(0, 50000, (64, 64)).astype(np.int32)),
    }
    l_lin, t_lin = run("linear", args.adalora, batch)
    l_mrg, t_mrg = run("merge", args.adalora, batch)
    print(f"losses linear={l_lin} merge={l_mrg}")
    worst = 0.0
    for (p1, a1), (p2, a2) in zip(
        jax.tree_util.tree_leaves_with_path(t_lin),
        jax.tree_util.tree_leaves_with_path(t_mrg),
    ):
        assert p1 == p2
        a1 = np.asarray(a1, np.float64)
        a2 = np.asarray(a2, np.float64)
        denom = max(np.abs(a2).max(), 1e-8)
        rel = np.abs(a1 - a2).max() / denom
        if rel > worst:
            worst, worst_path = rel, p1
    print(f"worst trainable rel-diff after 2 steps: {worst:.3e} at "
          f"{jax.tree_util.keystr(worst_path)}")
    ok = (abs(l_lin[1] - l_mrg[1]) / max(abs(l_mrg[1]), 1e-8) < 1e-3
          and worst < 5e-2)
    print("OK" if ok else "MISMATCH")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
