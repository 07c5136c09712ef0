"""Serving-path benchmark (real TPU): Transcriber-level throughput for the
reference eval configs — greedy and beam-5/rp5.0/ngram-2 — plus the int8
KV-cache variant. One JSON line per config: utterances/sec end-to-end
(encoder + decode + host sync) at the given batch size.

Uses a randomly initialized whisper-base EEG model (identical compute to a
trained one); 32 new tokens per utterance (typical sentence at the byte
tokenizer is longer, Whisper-tokenizer shorter — slope numbers in
decode_probe.py let other lengths be derived).
"""
import json, time
import jax, jax.numpy as jnp, numpy as np
from neuspeech1_tpu import enable_compilation_cache
from neuspeech1_tpu.config import StemConfig, WhisperConfig
from neuspeech1_tpu.decode.generate import (
    GenerationConfig, beam_search, greedy_decode)
from neuspeech1_tpu.models.init import init_params
enable_compilation_cache()

BS = 32
MAX_NEW = 32
config = WhisperConfig(remat=False)
stem = StemConfig("base", in_channels=208)
params = init_params(jax.random.key(0), config, stem)
rng = np.random.default_rng(0)
feats = jnp.asarray(rng.standard_normal((BS, 208, 6000)).astype(np.float32))
prompt = np.asarray([[config.sot_id, config.first_language_id,
                      config.transcribe_id, config.notimestamps_id]] * BS,
                    np.int32)


def timed(tag, fn):
    try:
        out = fn(feats)
        seqs = np.asarray(out[0] if isinstance(out, tuple) else out)
        times = []
        f = feats
        for _ in range(4):
            t0 = time.perf_counter()
            out = fn(f)
            seqs = np.asarray(out[0] if isinstance(out, tuple) else out)
            times.append(time.perf_counter() - t0)
            f = feats * (1.0 + float(seqs[0, -1]) * 1e-9)
        dt = sorted(times)[len(times) // 2]
        print(json.dumps({
            "config": tag, "batch": BS, "new_tokens": MAX_NEW,
            "ms_per_batch": round(dt * 1e3, 1),
            "utterances_per_sec": round(BS / dt, 1),
        }), flush=True)
    except Exception as e:
        print(json.dumps({"config": tag, "error": str(e)[:200]}), flush=True)


P = prompt.shape[1]
for int8 in (False, True):
    gen = GenerationConfig.for_model(config, max_length=P + MAX_NEW,
                                     int8_kv_cache=int8)
    timed(f"greedy{'_int8kv' if int8 else ''}",
          lambda f, g=gen: greedy_decode(params, f, prompt, config, stem, g))
for int8 in (False, True):
    gen = GenerationConfig.for_model(
        config, max_length=P + MAX_NEW, num_beams=5,
        repetition_penalty=5.0, no_repeat_ngram_size=2,
        int8_kv_cache=int8)
    timed(f"beam5_rp5_ngram2{'_int8kv' if int8 else ''}",
          lambda f, g=gen: beam_search(params, f, prompt, config, stem, g))
