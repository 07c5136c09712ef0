"""A/B of the fused decode-step self-attention kernels (real TPU).

Usage: python perf/fused_step_ab.py off   # XLA reference paths
       python perf/fused_step_ab.py on    # ops/decode_step.py kernels
Run `off` first: `on` loads the saved token buffers and asserts exact
equality before printing its timings. Timing methodology = serve_bench's
(median of data-dependent chained calls; one host fetch per call).

Configs: greedy bf16 / greedy int8-cross / spec gamma=2,4 (self-prefix
drafting on random weights accepts nearly everything — the iteration-cost
view) at whisper-base 208ch bs64, 32 new tokens.
"""
import json
import os
import sys
import time

MODE = sys.argv[1] if len(sys.argv) > 1 else "off"
os.environ["NEUSPEECH_DECODE_SELF_FUSED"] = "1" if MODE == "on" else "0"

import jax
import jax.numpy as jnp
import numpy as np

from neuspeech1_tpu import enable_compilation_cache
from neuspeech1_tpu.config import StemConfig, WhisperConfig
from neuspeech1_tpu.decode.generate import GenerationConfig, greedy_decode
from neuspeech1_tpu.decode.spec import spec_greedy_decode
from neuspeech1_tpu.models.init import init_params

enable_compilation_cache()

BS, MAX_NEW = 64, 32
config = WhisperConfig(remat=False)
stem = StemConfig("base", in_channels=208)
params = init_params(jax.random.key(0), config, stem)
rng = np.random.default_rng(0)
feats = jnp.asarray(rng.standard_normal((BS, 208, 6000)).astype(np.float32))
prompt = np.asarray([[config.sot_id, config.first_language_id,
                      config.transcribe_id, config.notimestamps_id]] * BS,
                    np.int32)
P = prompt.shape[1]


def timed(tag, fn):
    out = fn(feats)
    seqs = np.asarray(out[0] if isinstance(out, tuple) else out)
    times = []
    f = feats
    for _ in range(5):
        t0 = time.perf_counter()
        out = fn(f)
        seqs = np.asarray(out[0] if isinstance(out, tuple) else out)
        times.append(time.perf_counter() - t0)
        f = feats * (1.0 + float(seqs[0, -1] + 1) * 1e-9)
    dt = sorted(times)[len(times) // 2]
    print(json.dumps({
        "config": tag, "mode": MODE, "batch": BS,
        "ms_per_batch": round(dt * 1e3, 1),
        "ms_per_token": round(dt * 1e3 / MAX_NEW, 2),
        "utterances_per_sec": round(BS / dt, 1)}), flush=True)
    first = np.asarray(fn(feats))
    first = first[0] if isinstance(first, tuple) else first
    ref = f"/tmp/fused_ab_{tag}.npy"
    if MODE == "off":
        np.save(ref, first)
    elif os.path.exists(ref):
        gold = np.load(ref)
        assert (first == gold).all(), f"{tag}: fused tokens diverge"
        print(json.dumps({"config": tag, "tokens_match": True}), flush=True)


for int8 in (False, True):
    gen = GenerationConfig.for_model(config, max_length=P + MAX_NEW,
                                     int8_kv_cache=int8)
    timed(f"greedy{'_int8' if int8 else ''}",
          lambda f, g=gen: greedy_decode(params, f, prompt, config, stem, g))

gen8 = GenerationConfig.for_model(config, max_length=P + MAX_NEW,
                                  int8_kv_cache=True)
for g in (2, 4):
    timed(f"spec_g{g}_int8",
          lambda f, g=g: spec_greedy_decode(params, f, prompt, config, stem,
                                            gen8, gamma=g)[0])
