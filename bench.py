"""Benchmark harness — run on the real TPU chip (default env).

Measures training throughput (samples/sec/chip) of the flagship
configuration: whisper-base geometry EEG model, 208 channels x 6000 samples
(30 s @ 200 Hz), batch 64, bf16 compute, LoRA(r=32) on encoder
q/k/v/out/fc1/fc2 + trainable conv stem — the reference's training regime
(`README.md` gwilliams block; `finetune.py:205-212`).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference repo publishes no numbers (BASELINE.md), so the
denominator is an analytic A100 estimate documented here: ~225 GFLOPs/sample
(fwd ~90 GFLOPs incl. stem, x2.5 for LoRA backward), A100 fp16 at a
charitable 40% MFU through HF Trainer ~= 125 TFLOP/s -> ~550 samples/s.
BASELINE.json's north star is >=3x that per chip.
"""

from __future__ import annotations

import json
import time

A100_EST_SAMPLES_PER_SEC = 550.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from neuspeech1_tpu.config import StemConfig, WhisperConfig
    from neuspeech1_tpu.models.init import init_params
    from neuspeech1_tpu.models.lora import init_lora
    from neuspeech1_tpu.train import optimizer as opt
    from neuspeech1_tpu.train import trainstep as ts

    config = WhisperConfig(remat=True)  # bf16 compute; remat: 1500-frame
    # attention probs must be recomputed in backward or whisper-base at
    # bs64 blows the 16 GB HBM (6x[64,8,1500,1500] f32 = 27.6 GB)
    stem = StemConfig("base", in_channels=208)
    batch_size = 64
    label_len = 64

    params = init_params(jax.random.key(0), config, stem)
    lora = init_lora(jax.random.key(1), config, rank=32, alpha=64)
    tx = opt.make_optimizer(peak_lr=1e-3, warmup_steps=500, total_steps=100_000)
    state, frozen = ts.init_train_state(
        jax.random.key(2), params, lora, tx, opt.default_trainable_pred()
    )
    step = ts.make_train_step(config, stem, tx, fold_lora=True)

    rng = np.random.default_rng(0)
    batch = {
        "input_features": jnp.asarray(
            rng.standard_normal((batch_size, 208, 6000)).astype(np.float32)
        ),
        "labels": jnp.asarray(
            rng.integers(0, 50000, (batch_size, label_len)).astype(np.int32)
        ),
        "decoder_input_ids": jnp.asarray(
            rng.integers(0, 50000, (batch_size, label_len)).astype(np.int32)
        ),
    }

    # compile + warmup. NOTE: on this runtime jax.block_until_ready has been
    # observed to return before execution completes; the only reliable
    # synchronization is an actual device->host transfer, so each timed step
    # fetches its scalar loss. Median of per-step wall times.
    import numpy as _np

    def sync(m):
        return float(jax.device_get(m["loss"]))

    state, m = step(state, frozen, batch)
    sync(m)
    state, m = step(state, frozen, batch)
    sync(m)

    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        state, m = step(state, frozen, batch)
        sync(m)
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]

    samples_per_sec = batch_size / dt
    print(
        json.dumps(
            {
                "metric": "train_samples_per_sec_per_chip",
                "value": round(samples_per_sec, 2),
                "unit": "samples/s",
                "vs_baseline": round(samples_per_sec / A100_EST_SAMPLES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
