"""Speculative greedy serving A/B (real TPU): spec_greedy_decode vs
greedy_decode at the serving geometry (whisper-base EEG, bs64, int8 cross
cache, 48 new tokens).

Reports, per gamma: ms/batch, utterances/s, the realized iteration count
(<= max_new; lower = more draft acceptance) and the implied mean accepted
tokens/iteration. With RANDOM weights the greedy continuation often
cycles, which flatters the n-gram drafter — the transferable numbers are
the per-iteration cost ratio vs gamma=1 (hardware fact, matches
perf/spec_probe.py) and the speedup formula tps(a) = (1+a)/ratio; the
acceptance rate itself must be re-measured on a trained checkpoint.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from neuspeech1_tpu import enable_compilation_cache
from neuspeech1_tpu.config import StemConfig, WhisperConfig
from neuspeech1_tpu.decode.generate import GenerationConfig, greedy_decode
from neuspeech1_tpu.decode.spec import spec_greedy_decode

from neuspeech1_tpu.models.init import init_params

enable_compilation_cache()

BS = 64
MAX_NEW = 48
# 'byte' argv: the flagship serving geometry (byte-layout vocab 1767) —
# the gamma-fold V-wide verify work (logit projection + argmax) is ~30x
# smaller there than at the whisper 51865 vocab, so the iteration cost
# ratio vs a greedy step drops accordingly
mode = sys.argv[1] if len(sys.argv) > 1 else "base"
if mode == "byte":
    config = WhisperConfig(remat=False,
                           **WhisperConfig.layout_for_vocab(256))
    stem = StemConfig("base", in_channels=208)
elif mode == "large":
    # whisper-large-v3 geometry (32+32, d1280, 20 heads, 128-mel speech
    # stem) at the model-panel serving batch: spec's win should GROW with
    # model size (the per-token cross/weight stream it amortizes is ~8x
    # whisper-base's), so the iteration cost ratio here is the number
    # that decides whether spec pays at the big end of the family.
    from neuspeech1_tpu.config import preset_config

    config = preset_config("large", remat=False)
    stem = StemConfig("speech")
    BS = 8
else:
    config = WhisperConfig(remat=False)
    stem = StemConfig("base", in_channels=208)
params = init_params(jax.random.key(0), config, stem)
rng = np.random.default_rng(0)
if stem.kind == "speech":
    feats = jnp.asarray(rng.standard_normal(
        (BS, config.num_mel_bins, config.max_source_positions * 2)
    ).astype(np.float32))
else:
    feats = jnp.asarray(
        rng.standard_normal((BS, 208, 6000)).astype(np.float32))
prompt = np.asarray([[config.sot_id, config.first_language_id,
                      config.transcribe_id, config.notimestamps_id]] * BS,
                    np.int32)
P = prompt.shape[1]
gen = GenerationConfig.for_model(config, max_length=P + MAX_NEW,
                                 int8_kv_cache=True)


def timed(tag, fn, extra=None):
    try:
        out = fn(feats)
        seqs = np.asarray(out[0] if isinstance(out, tuple) else out)
        iters = int(out[1]) if isinstance(out, tuple) else MAX_NEW
        times = []
        f = feats
        for _ in range(4):
            t0 = time.perf_counter()
            out = fn(f)
            seqs = np.asarray(out[0] if isinstance(out, tuple) else out)
            times.append(time.perf_counter() - t0)
            f = feats * (1.0 + float(seqs[0, -1]) * 1e-9)
        dt = sorted(times)[len(times) // 2]
        rec = {
            "config": tag, "batch": BS, "new_tokens": MAX_NEW,
            "ms_per_batch": round(dt * 1e3, 1),
            "utterances_per_sec": round(BS / dt, 1),
            "loop_iters": iters,
        }
        if extra:
            rec.update(extra)
        print(json.dumps(rec), flush=True)
        return dt, iters
    except Exception as e:
        print(json.dumps({"config": tag, "error": str(e)[:300]}), flush=True)
        return None, None


base_dt, _ = timed("greedy_int8kv",
                   lambda f: greedy_decode(params, f, prompt, config, stem,
                                           gen))
for gamma in (2, 4):
    dt, iters = timed(
        f"spec_greedy_int8kv_g{gamma}",
        lambda f, g=gamma: spec_greedy_decode(params, f, prompt, config,
                                              stem, gen, gamma=g))
    if dt and base_dt:
        # realized per-iteration cost vs a plain greedy step, and the
        # batch-mean accepted tokens per iteration the run achieved
        ratio = (dt / iters) / (base_dt / MAX_NEW)
        print(json.dumps({
            "config": f"spec_g{gamma}_analysis",
            "iter_cost_ratio_vs_greedy_step": round(ratio, 3),
            "mean_accepted_per_iter": round(MAX_NEW / iters, 2),
            "speedup_formula": "tps_rel = mean_accepted / cost_ratio",
        }), flush=True)
