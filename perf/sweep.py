"""Perf sweep harness (real TPU): times the whisper-base EEG train step for
a list of config variants. One JSON line per variant.

Timing: per-step device->host loss fetch (block_until_ready returns early on
the axon runtime); data-dependent chained steps; median of N.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from neuspeech1_tpu import enable_compilation_cache
from neuspeech1_tpu.config import StemConfig, WhisperConfig
from neuspeech1_tpu.models.init import init_params
from neuspeech1_tpu.models.lora import init_lora
from neuspeech1_tpu.train import optimizer as opt
from neuspeech1_tpu.train import trainstep as ts

enable_compilation_cache()

BS = 64
LABEL_LEN = 64


def measure(tag, config, batch_size=BS, steps=10, **step_kw):
    stem = StemConfig("base", in_channels=208)
    params = init_params(jax.random.key(0), config, stem)
    lora = init_lora(jax.random.key(1), config, rank=32, alpha=64)
    tx = opt.make_optimizer(peak_lr=1e-3, warmup_steps=500, total_steps=100_000)
    state, frozen = ts.init_train_state(
        jax.random.key(2), params, lora, tx, opt.default_trainable_pred()
    )
    step_kw.setdefault("fold_lora", True)
    step = ts.make_train_step(config, stem, tx, **step_kw)
    rng = np.random.default_rng(0)
    batch = {
        "input_features": jnp.asarray(
            rng.standard_normal((batch_size, 208, 6000)).astype(np.float32)),
        "labels": jnp.asarray(
            rng.integers(0, 50000, (batch_size, LABEL_LEN)).astype(np.int32)),
        "decoder_input_ids": jnp.asarray(
            rng.integers(0, 50000, (batch_size, LABEL_LEN)).astype(np.int32)),
    }
    try:
        # chained-dispatch timing: K data-dependent steps, ONE final
        # device->host fetch. The axon runtime has a ~26 ms dispatch+sync
        # floor per fetched call (perf/overhead.py), so per-step wall time
        # with a per-step fetch overstates the step by that floor; chaining
        # amortizes it to <1.5 ms at K=20. The final loss depends on every
        # step (state threads through), so all K steps must really execute.
        t0 = time.perf_counter()
        state, m = step(state, frozen, batch)
        float(jax.device_get(m["loss"]))
        compile_s = time.perf_counter() - t0
        state, m = step(state, frozen, batch)
        float(jax.device_get(m["loss"]))

        K = 20
        totals = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(K):
                state, m = step(state, frozen, batch)
            float(jax.device_get(m["loss"]))
            totals.append(time.perf_counter() - t0)
        dt = sorted(totals)[1] / K
        print(json.dumps({
            "variant": tag, "step_ms": round(dt * 1e3, 1),
            "samples_per_sec": round(batch_size / dt, 1),
            "compile_s": round(compile_s, 1),
        }), flush=True)
    except Exception as e:
        print(json.dumps({"variant": tag, "error": str(e)[:300]}), flush=True)
    finally:
        del state, frozen, params, lora, batch


def _conv(impl):
    from neuspeech1_tpu.models import whisper as jw
    jw.set_conv_cl_impl(impl)


VARIANTS = {
    "none": (lambda: WhisperConfig(remat=True), None),
    "flash": (lambda: WhisperConfig(remat=True, remat_policy="flash"), None),
    "flash_decflash": (lambda: WhisperConfig(
        remat=True, remat_policy="flash", decoder_flash_min_q=1), None),
    "flash_unfold": (lambda: WhisperConfig(remat=True, remat_policy="flash"),
                     lambda: _conv("unfold")),
    "everything": (lambda: WhisperConfig(remat=True, remat_policy="everything"),
                   None),
    "everything_unfold": (lambda: WhisperConfig(
        remat=True, remat_policy="everything"), lambda: _conv("unfold")),
    "noremat": (lambda: WhisperConfig(remat=False), None),
    "noremat_xcross": (lambda: WhisperConfig(
        remat=False, decoder_flash_cross_min_q=256), None),
    "noremat_nofold": (lambda: WhisperConfig(remat=False), None),
    "flash_mlp": (lambda: WhisperConfig(remat=True, remat_policy="flash_mlp"),
                  None),
    "flash_qkv2": (lambda: WhisperConfig(remat=True, remat_policy="flash_qkv"),
                   None),
    "default": (lambda: WhisperConfig(remat=True), None),
}

if __name__ == "__main__":
    names = [n for n in sys.argv[1:] if n != "ch8"] or (
        [] if "ch8" in sys.argv else list(VARIANTS))
    for name in names:
        cfg_fn, setup = VARIANTS[name]
        _conv("conv")
        if setup:
            setup()
        kw = {"fold_lora": False} if name.endswith("_nofold") else {}
        measure(name, cfg_fn(), **kw)

# usage: python perf/sweep.py ch8   (stem-cost ablation: conv_a flops ∝ channels)
def measure_ch8():
    config = WhisperConfig(remat=True)
    stem = StemConfig("base", in_channels=8)
    params = init_params(jax.random.key(0), config, stem)
    lora = init_lora(jax.random.key(1), config, rank=32, alpha=64)
    tx = opt.make_optimizer(peak_lr=1e-3, warmup_steps=500, total_steps=100_000)
    state, frozen = ts.init_train_state(
        jax.random.key(2), params, lora, tx, opt.default_trainable_pred())
    step = ts.make_train_step(config, stem, tx, fold_lora=True)
    rng = np.random.default_rng(0)
    batch = {
        "input_features": jnp.asarray(
            rng.standard_normal((BS, 8, 6000)).astype(np.float32)),
        "labels": jnp.asarray(rng.integers(0, 50000, (BS, LABEL_LEN)).astype(np.int32)),
        "decoder_input_ids": jnp.asarray(rng.integers(0, 50000, (BS, LABEL_LEN)).astype(np.int32)),
    }
    state, m = step(state, frozen, batch); float(jax.device_get(m["loss"]))
    state, m = step(state, frozen, batch); float(jax.device_get(m["loss"]))
    K = 20
    totals = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(K):
            state, m = step(state, frozen, batch)
        float(jax.device_get(m["loss"]))
        totals.append(time.perf_counter() - t0)
    dt = sorted(totals)[1] / K
    print(json.dumps({"variant": "ch8", "step_ms": round(dt*1e3, 1)}), flush=True)

if "ch8" in sys.argv:
    measure_ch8()
