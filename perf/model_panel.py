"""Whisper-small / large-v3 measured panel (VERDICT r2 item 10): turn the
round-2 geometry-generality SMOKES into recorded numbers.

  small_train   — whisper-small EEG (12+12, d768, 12 heads), bs32, the
                  auto-remat policy's pick: samples/s, step ms, MFU;
  large_decode  — whisper-large-v3 geometry (32+32, d1280, 20 heads,
                  128-mel premel-compatible speech stem), greedy decode
                  ms/token at bs8 via the two-point slope.

One JSON line per row (chained-dispatch methodology, perf/overhead.py).
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from neuspeech1_tpu import enable_compilation_cache
from neuspeech1_tpu.config import StemConfig, preset_config
from neuspeech1_tpu.models.init import init_params
from neuspeech1_tpu.models.lora import init_lora
from neuspeech1_tpu.train import memory as trainmem
from neuspeech1_tpu.train import optimizer as opt
from neuspeech1_tpu.train import trainstep as ts

enable_compilation_cache()
V5E_PEAK = 197e12


def small_train():
    import bench as benchmod  # fwd_flops_per_sample

    bs, label = 32, 64
    stem = StemConfig("base", in_channels=208)
    config = preset_config("small")
    remat = trainmem.resolve_remat(
        "auto", config, stem, bs,
        trainable_count=trainmem.trainable_count_estimate(
            config, stem, ft_full=False, lora_rank=32),
        label_len=label)
    config = preset_config("small", remat=remat)
    params = init_params(jax.random.key(0), config, stem)
    lora = init_lora(jax.random.key(1), config, rank=32, alpha=64)
    tx = opt.make_optimizer(peak_lr=1e-3, warmup_steps=500, total_steps=100_000)
    state, frozen = ts.init_train_state(
        jax.random.key(2), params, lora, tx, opt.default_trainable_pred())
    step = ts.make_train_step(config, stem, tx, fold_lora=True)
    rng = np.random.default_rng(0)
    batch = {
        "input_features": jnp.asarray(
            rng.standard_normal((bs, 208, 6000)).astype(np.float32)),
        "labels": jnp.asarray(
            rng.integers(0, 50000, (bs, label)).astype(np.int32)),
        "decoder_input_ids": jnp.asarray(
            rng.integers(0, 50000, (bs, label)).astype(np.int32)),
    }
    state, m = step(state, frozen, batch)
    float(jax.device_get(m["loss"]))
    K = 10
    totals = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(K):
            state, m = step(state, frozen, batch)
        float(jax.device_get(m["loss"]))
        totals.append(time.perf_counter() - t0)
    dt = sorted(totals)[1] / K
    sps = bs / dt
    flops = benchmod.fwd_flops_per_sample(config, label, 208)
    print(json.dumps({
        "config": "small_train", "batch": bs, "remat": remat,
        "step_ms": round(dt * 1e3, 1), "samples_per_sec": round(sps, 1),
        "mfu": round(sps * 3.0 * flops / V5E_PEAK, 3),
    }), flush=True)


def large_train():
    """whisper-LARGE-V3 geometry TRAIN row (VERDICT r3 item 7): 32+32,
    d1280, 20 heads, EEG 208-ch base stem (apples-to-apples with
    small_train), LoRA r=32 + stem, remat=True (the memory-realistic
    config at this scale — f32 master weights alone are ~6 GB), bs8 with
    a bs4 fallback. The geometry most likely to expose kernel-envelope
    assumptions: d_head 64 at h=20 (odd head-per-block packing), 128-dim
    mel-scale widths, dW accumulations at d1280."""
    import bench as benchmod

    label = 64
    stem = StemConfig("base", in_channels=208)
    config = preset_config("large", remat=True)
    for bs in (8, 4):
        params = lora = state = frozen = None
        try:
            params = init_params(jax.random.key(0), config, stem)
            lora = init_lora(jax.random.key(1), config, rank=32, alpha=64)
            tx = opt.make_optimizer(peak_lr=1e-3, warmup_steps=500,
                                    total_steps=100_000)
            state, frozen = ts.init_train_state(
                jax.random.key(2), params, lora, tx,
                opt.default_trainable_pred())
            step = ts.make_train_step(config, stem, tx, fold_lora=True)
            rng = np.random.default_rng(0)
            batch = {
                "input_features": jnp.asarray(
                    rng.standard_normal((bs, 208, 6000)).astype(np.float32)),
                "labels": jnp.asarray(
                    rng.integers(0, 50000, (bs, label)).astype(np.int32)),
                "decoder_input_ids": jnp.asarray(
                    rng.integers(0, 50000, (bs, label)).astype(np.int32)),
            }
            state, m = step(state, frozen, batch)
            float(jax.device_get(m["loss"]))
        except Exception as e:
            print(json.dumps({"config": "large_v3_train", "batch": bs,
                              "error": f"{type(e).__name__}: {str(e)[:200]}"}),
                  flush=True)
            # release before the fallback bs (init itself may have failed
            # with these unbound — hence the pre-try None assignment)
            params = lora = state = frozen = None
            continue
        K = 5
        totals = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(K):
                state, m = step(state, frozen, batch)
            float(jax.device_get(m["loss"]))
            totals.append(time.perf_counter() - t0)
        dt = sorted(totals)[1] / K
        sps = bs / dt
        flops = benchmod.fwd_flops_per_sample(config, label, 208)
        print(json.dumps({
            "config": "large_v3_train", "batch": bs, "remat": True,
            "step_ms": round(dt * 1e3, 1), "samples_per_sec": round(sps, 1),
            "mfu": round(sps * 3.0 * flops / V5E_PEAK, 3),
            "fwd_gflops_per_sample": round(flops / 1e9, 1),
        }), flush=True)
        return


def large_decode(bs: int = 8, int8: bool = False):
    from neuspeech1_tpu.decode.generate import GenerationConfig, greedy_decode

    config = preset_config("large", remat=True)
    stem = StemConfig("speech")  # 128-mel speech stem (large-v3 frontend)
    params = init_params(jax.random.key(0), config, stem)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal(
        (bs, config.num_mel_bins, config.max_source_positions * 2)
    ).astype(np.float32))
    prompt = np.asarray([[config.sot_id, config.first_language_id,
                          config.transcribe_id, config.notimestamps_id]] * bs,
                        np.int32)
    res = {}
    for max_new in (8, 32):
        gen = GenerationConfig.for_model(
            config, max_length=prompt.shape[1] + max_new,
            int8_kv_cache=int8)
        out = greedy_decode(params, feats, prompt, config, stem, gen)
        np.asarray(out)
        times = []
        f = feats
        for _ in range(3):
            t0 = time.perf_counter()
            out = greedy_decode(params, f, prompt, config, stem, gen)
            s = float(np.asarray(out)[0, -1])
            times.append(time.perf_counter() - t0)
            f = feats * (1.0 + s * 1e-9)
        res[max_new] = sorted(times)[1]
    slope = (res[32] - res[8]) / 24 * 1e3
    print(json.dumps({
        "config": "large_v3_decode" + ("_int8kv" if int8 else ""),
        "batch": bs,
        "ms8": round(res[8] * 1e3, 1), "ms32": round(res[32] * 1e3, 1),
        "ms_per_token": round(slope, 2),
        "tok_per_sec": round(bs / (slope / 1e3), 0),
    }), flush=True)


if __name__ == "__main__":
    import sys

    rows = sys.argv[1:] or ["small_train", "large_train", "large_decode"]
    for r in rows:
        {"small_train": small_train, "large_train": large_train,
         "large_decode": large_decode,
         # int8 KV + serving batch: the family's throughput-serving row
         "large_decode_int8_bs32": lambda: large_decode(bs=32, int8=True),
        }[r]()
