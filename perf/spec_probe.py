"""Multi-token (speculative) decode bandwidth math — VERDICT r3 item 8.

Greedy decode sits at the per-token HBM floor (~1.5 ms/token at whisper-base
bs64: the int8 cross-cache read dominates). The only way past it is
amortizing that read over >1 token: draft-and-verify runs ONE decoder step
on gamma candidate tokens (the cross K/V stream is read once for all gamma
positions), then accepts the longest prefix matching the model's own greedy
choices — output-exact by construction.

This probe measures the enabling quantity: the cost of a gamma-token cached
decoder step vs a 1-token step, at the serving geometry (whisper-base EEG,
bs64, int8 cross cache, buffer 52). Break-even expected extra acceptance
per step is cost(gamma)/cost(1) - 1; speedup at mean accepted prefix a is
(1 + a) / (cost(gamma)/cost(1)).

Chained-dispatch methodology (CLAUDE.md): steps are data-dependent through
the fed-back argmax token; ONE host fetch per timing block.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from neuspeech1_tpu import enable_compilation_cache
from neuspeech1_tpu.config import StemConfig, WhisperConfig
from neuspeech1_tpu.models import whisper as jw
from neuspeech1_tpu.models.init import init_params

enable_compilation_cache()

BS = 64
L = 52  # serving buffer (prompt 4 + 48 new)
config = WhisperConfig(remat=False)
stem = StemConfig("base", in_channels=208)
params = init_params(jax.random.key(0), config, stem)
rng = np.random.default_rng(0)
feats = jnp.asarray(rng.standard_normal((BS, 208, 6000)).astype(np.float32))

enc = jax.jit(
    lambda p, f: jw.encoder_apply(p, f, config, stem),
)(params, feats)
cache0 = jax.jit(
    lambda p, e: jw.init_cache(p, e, config, max_len=L, int8_cross=True),
)(params, enc)


def step_fn(gamma: int):
    @jax.jit
    def step(tok, cache):
        """One gamma-token cached decoder step at a fixed mid position;
        feeds back the last position's argmax so chained calls are
        data-dependent (the runtime caches identical executions).

        The argmax consumes ALL gamma positions — a draft-verify step
        needs every position's winner. (The first version argmaxed only
        logits[:, -1]; XLA dead-code-eliminated the other gamma-1 logit
        projections and V-wide reductions, and the probe reported a
        1.01x gamma=2 cost ratio that the real loop could not hit.)"""
        toks = jnp.tile(tok[:, None], (1, gamma)).astype(jnp.int32)
        logits, cache = jw.decoder_apply(
            params, toks, enc, config, cache=cache, cache_index=20)
        g = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, gamma]
        # g is a jit OUTPUT so every position's argmax is live
        return g[:, -1], g, cache
    return step


tok0 = jnp.full((BS,), 100, jnp.int32)
res = {}
for gamma in (1, 2, 4, 8):
    f = step_fn(gamma)
    tok, _, cache = f(tok0, cache0)
    jax.block_until_ready(np.asarray(tok))
    K = 40
    ts = []
    for _ in range(3):
        tok, cache = tok0, cache0
        t0 = time.perf_counter()
        for _ in range(K):
            tok, _, cache = f(tok, cache)
        int(np.asarray(tok)[0])
        ts.append((time.perf_counter() - t0) / K)
    ms = sorted(ts)[1] * 1e3
    res[gamma] = ms
    out = {"gamma": gamma, "step_ms": round(ms, 3)}
    if gamma > 1:
        r = ms / res[1]
        out["cost_ratio"] = round(r, 3)
        out["breakeven_accept"] = round(r - 1, 3)
        out["speedup_at_full_accept"] = round(gamma / r, 2)
    print(json.dumps(out), flush=True)
