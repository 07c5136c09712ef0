"""Benchmark harness — run on the real TPU chip (default env).

Measures the flagship configuration end to end: whisper-base geometry EEG
model, 208 channels x 6000 samples (30 s @ 200 Hz), batch 64, bf16 compute,
LoRA(r=32) on encoder q/k/v/out/fc1/fc2 + trainable conv stem — the
reference's training regime (`README.md` gwilliams block;
`finetune.py:205-212`).

Prints ONE JSON line with the headline metric plus the full panel the
BASELINE.md procedure (item 2) requires: samples/sec/chip, train step ms,
model FLOPs utilisation, and greedy-decode tokens/sec.

Timing methodology (perf/overhead.py): the axon runtime has a ~26 ms
dispatch+sync floor per host-fetched call and `jax.block_until_ready`
returns early, so the step is timed as K=20 DATA-DEPENDENT chained steps
with ONE final device->host loss fetch (the final loss transitively
requires every step, so all K must execute); median of 3 repeats. This is
also the rate a real training loop sustains, since it never syncs per step.

vs_baseline: the reference repo publishes no numbers (BASELINE.md), so the
denominator is an analytic A100 estimate documented there: ~225
GFLOPs/sample at a charitable 40% MFU through HF Trainer -> ~550 samples/s.
BASELINE.json's north star is >=3x that per chip.
"""

from __future__ import annotations

import json
import time

A100_EST_SAMPLES_PER_SEC = 550.0
V5E_PEAK_BF16_FLOPS = 197e12  # single v5e chip, bf16
# Usable bf16 rate measured ON THIS CHIP via chained 8192^3 matmuls
# (BASELINE.md "North-star reconciliation"): the remote/tunneled runtime
# tops out at ~131 TF/s, so the honest single-chip ceiling for this
# workload is usable_flops / (3 x fwd_flops_per_sample) ~= 385 samples/s
# in bf16. mfu_of_usable below reports utilisation against that.
V5E_USABLE_BF16_FLOPS = 131e12


def fwd_flops_per_sample(c, label_len: int, in_channels: int) -> float:
    """Analytic forward FLOPs per sample (matmuls/convs; 2 flops per MAC).

    Components: conv stem (base kind), encoder layers (qkvo + qk/pv attn +
    mlp), decoder layers (self attn, cross k/v over 1500 frames, mlp),
    tied-embedding logits. LoRA deltas (~1%) ignored.
    """
    T = c.max_source_positions          # 1500 encoder frames
    Tin = T * 4                         # raw signal length
    d, f_enc, f_dec = c.d_model, c.encoder_ffn, c.decoder_ffn
    L = label_len
    stem = (
        Tin * in_channels * d * 3 * 2          # conv_a k3 s1
        + (Tin // 2) * d * d * 3 * 2           # conv_b k3 s2
        + T * d * d * 3 * 2                    # conv2 k3 s2
    )
    enc_layer = (
        4 * T * d * d * 2                      # q,k,v,out
        + 2 * T * T * d * 2                    # qk^T + pv
        + 2 * T * d * f_enc * 2                # mlp
    )
    dec_layer = (
        4 * L * d * d * 2                      # self q,k,v,out
        + 2 * L * L * d * 2                    # self attn
        + 2 * T * d * d * 2                    # cross k,v over enc frames
        + 2 * L * d * d * 2                    # cross q,out
        + 2 * L * T * d * 2                    # cross attn
        + 2 * L * d * f_dec * 2                # mlp
    )
    logits = L * d * c.vocab_size * 2
    return float(
        stem + c.encoder_layers * enc_layer + c.decoder_layers * dec_layer
        + logits
    )


def main():
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

    # remat=False is the measured-best single-chip config (220 ms vs 250
    # with remat under the fully-unrolled layer stack — bf16 + flash
    # activations fit 16 GB HBM at bs64); fall back to remat if this
    # machine can't hold it.
    stem = StemConfig("base", in_channels=208)
    batch_size = 64
    label_len = 64

    rng = np.random.default_rng(0)
    batch = {
        # staged bf16, matching the shipped fast path: the Trainer's
        # device cache (data/device_cache.py feature_dtype=bfloat16) holds
        # the corpus on-chip in bf16, so the step never sees f32 features
        # (an f32 feed adds a ~1.3 ms/step device-trace-visible cast pass)
        "input_features": jnp.asarray(
            rng.standard_normal((batch_size, 208, 6000)).astype(np.float32)
        ).astype(jnp.bfloat16),
        "labels": jnp.asarray(
            rng.integers(0, 50000, (batch_size, label_len)).astype(np.int32)
        ),
        "decoder_input_ids": jnp.asarray(
            rng.integers(0, 50000, (batch_size, label_len)).astype(np.int32)
        ),
    }

    def build(remat: bool):
        config = WhisperConfig(remat=remat)
        params = init_params(jax.random.key(0), config, stem)
        lora = init_lora(jax.random.key(1), config, rank=32, alpha=64)
        tx = opt.make_optimizer(
            peak_lr=1e-3, warmup_steps=500, total_steps=100_000)
        state, frozen = ts.init_train_state(
            jax.random.key(2), params, lora, tx, opt.default_trainable_pred()
        )
        step = ts.make_train_step(config, stem, tx, fold_lora=True)
        return config, state, frozen, step

    # shared remat policy (train/memory.py — same function the finetune
    # CLI's --remat=auto uses): no-remat when the step fits HBM
    from neuspeech1_tpu.train import memory as trainmem

    auto_remat = trainmem.resolve_remat(
        "auto", WhisperConfig(), stem, batch_size,
        trainable_count=trainmem.trainable_count_estimate(
            WhisperConfig(), stem, ft_full=False, lora_rank=32),
        label_len=label_len,
    )
    try:
        config, state, frozen, step = build(remat=auto_remat)
        state, m = step(state, frozen, batch)
        float(jax.device_get(m["loss"]))
    except Exception as e:
        import sys

        print(f"[bench] remat={auto_remat} path failed ({type(e).__name__}: "
              f"{str(e)[:200]}); falling back to remat={not auto_remat}",
              file=sys.stderr, flush=True)
        config, state, frozen, step = build(remat=not auto_remat)
        state, m = step(state, frozen, batch)
        float(jax.device_get(m["loss"]))
    state, m = step(state, frozen, batch)
    float(jax.device_get(m["loss"]))

    K = 20
    totals = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(K):
            state, m = step(state, frozen, batch)
        float(jax.device_get(m["loss"]))  # one real sync for the whole chain
        totals.append(time.perf_counter() - t0)
    dt = sorted(totals)[1] / K

    samples_per_sec = batch_size / dt
    flops = fwd_flops_per_sample(config, label_len, 208)
    mfu = samples_per_sec * 3.0 * flops / V5E_PEAK_BF16_FLOPS

    # ---- greedy decode throughput (KV-cached, whisper-base bs64).
    # Two-point measurement: the (time @48 − time @8)/40 slope isolates the
    # per-token decode cost from the encoder forward + dispatch floor, so
    # `decode_tokens_per_sec` is the sustained incremental rate;
    # `decode_e2e_tokens_per_sec` includes the encoder (48-token utterance).
    decode_tps = decode_e2e_tps = None
    try:
        from neuspeech1_tpu.decode.generate import (
            GenerationConfig, greedy_decode,
        )

        prompt = np.asarray(
            [[config.sot_id, config.first_language_id, config.transcribe_id,
              config.notimestamps_id]] * batch_size, np.int32)
        model_params, lora_tree = ts.model_params_of(state, frozen)
        feats = batch["input_features"]

        def timed_decode(max_new, int8):
            gen = GenerationConfig.for_model(
                config, max_length=prompt.shape[1] + max_new,
                int8_kv_cache=int8)
            out = greedy_decode(model_params, feats, prompt, config, stem,
                                gen, lora=lora_tree)
            np.asarray(out)  # warmup/compile + sync
            times = []
            f = feats
            for _ in range(3):
                t0 = time.perf_counter()
                out = greedy_decode(model_params, f, prompt, config, stem,
                                    gen, lora=lora_tree)
                s = float(np.asarray(out)[0, -1])
                times.append(time.perf_counter() - t0)
                f = feats * (1.0 + s * 1e-9)
            return sorted(times)[1]

        # headline = the int8-KV serving configuration (Transcriber's
        # int8_kv_cache flag; tested e2e vs fp in tests/test_decode.py);
        # the fp rate is reported alongside for parity comparisons
        t8, t48 = timed_decode(8, True), timed_decode(48, True)
        t8f, t48f = timed_decode(8, False), timed_decode(48, False)
        decode_fp_tps = batch_size * 40 / max(t48f - t8f, 1e-9)
        decode_tps = batch_size * 40 / max(t48 - t8, 1e-9)
        decode_e2e_tps = batch_size * 48 / t48
    except Exception:
        pass

    result = {
        "metric": "train_samples_per_sec_per_chip",
        "value": round(samples_per_sec, 2),
        "unit": "samples/s",
        # utilisation against the ~131 TF/s usable bf16 rate measured on
        # this chip (chained matmul8192 probe) — the physically honest
        # ceiling; see BASELINE.md "North-star reconciliation". Leads the
        # comparison fields so the first ratio a reader sees is the one
        # against a reachable number.
        "mfu_of_usable": round(
            samples_per_sec * 3.0 * flops / V5E_USABLE_BF16_FLOPS, 3),
        "bf16_ceiling_samples_per_sec": round(
            V5E_USABLE_BF16_FLOPS / (3.0 * flops), 1),
        # the reference repo publishes no numbers (BASELINE.md); this is
        # the ratio against an ANALYTIC A100 estimate, not a measurement
        "vs_analytic_a100_estimate": round(
            samples_per_sec / A100_EST_SAMPLES_PER_SEC, 3),
        "vs_baseline": round(samples_per_sec / A100_EST_SAMPLES_PER_SEC, 3),
        "train_step_ms": round(dt * 1e3, 1),
        "mfu": round(mfu, 3),
        "fwd_gflops_per_sample": round(flops / 1e9, 1),
        "remat": config.remat,  # which config actually ran (False = fast path)
    }
    if decode_tps is not None:
        result["decode_tokens_per_sec"] = round(decode_tps, 1)
        # e2e includes the one-time encoder prefill amortized over only 48
        # tokens — it is NOT the sustained serving rate (that is
        # decode_tokens_per_sec incremental / perf/serve_bench.py utt/s)
        result["decode_e2e_tokens_per_sec"] = round(decode_e2e_tps, 1)
        result["decode_e2e_includes_encoder_prefill"] = True
        result["decode_fp_tokens_per_sec"] = round(decode_fp_tps, 1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
