import json, time
import jax, jax.numpy as jnp, numpy as np
from neuspeech1_tpu import enable_compilation_cache
from neuspeech1_tpu.config import StemConfig, WhisperConfig
from neuspeech1_tpu.decode.generate import GenerationConfig, greedy_decode
from neuspeech1_tpu.models.init import init_params
enable_compilation_cache()
BS = 64
config = WhisperConfig(remat=False)
stem = StemConfig("base", in_channels=208)
params = init_params(jax.random.key(0), config, stem)
rng = np.random.default_rng(0)
feats = jnp.asarray(rng.standard_normal((BS, 208, 6000)).astype(np.float32))
prompt = np.asarray([[config.sot_id, config.first_language_id,
                      config.transcribe_id, config.notimestamps_id]] * BS, np.int32)
for int8 in (False, True):
    for max_new in (8, 48):
        gen = GenerationConfig.for_model(
            config, max_length=prompt.shape[1] + max_new, int8_kv_cache=int8)
        out = greedy_decode(params, feats, prompt, config, stem, gen)
        np.asarray(out)
        times = []
        f = feats
        for _ in range(4):
            t0 = time.perf_counter()
            out = greedy_decode(params, f, prompt, config, stem, gen)
            s = float(np.asarray(out)[0, -1])
            times.append(time.perf_counter() - t0)
            f = feats * (1.0 + s * 1e-9)
        dt = sorted(times)[len(times)//2]
        print(json.dumps({"int8": int8, "max_new": max_new,
                          "ms": round(dt*1e3, 1)}), flush=True)
