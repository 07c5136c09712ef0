"""Decompose whisper-base EEG train-step time into stages (real TPU).

Each stage is timed as a separate jitted program with chained
data-dependence and per-call device->host sync. Median of N.
"""
import json
import sys
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

config = WhisperConfig(remat=True, remat_policy="flash")
stem = StemConfig("base", in_channels=208)
params = init_params(jax.random.key(0), config, stem)
rng = np.random.default_rng(0)
feats = jnp.asarray(rng.standard_normal((BS, 208, 6000)).astype(np.float32))
toks = jnp.asarray(rng.integers(0, 50000, (BS, 64)).astype(np.int32))
labels = jnp.asarray(rng.integers(0, 50000, (BS, 64)).astype(np.int32))


def timeit(tag, fn, *args, steps=8):
    try:
        out = fn(*args)
        float(jax.device_get(jnp.ravel(out)[0]))
        times = []
        x = args
        for i in range(steps):
            t0 = time.perf_counter()
            out = fn(*x)
            s = float(jax.device_get(jnp.ravel(out)[0]))
            times.append(time.perf_counter() - t0)
            # data dependence: perturb first arg by the fetched scalar
            x = (x[0] + jnp.asarray(s * 1e-12, x[0].dtype),) + x[1:]
        dt = sorted(times)[len(times) // 2]
        print(json.dumps({"stage": tag, "ms": round(dt * 1e3, 1)}), flush=True)
    except Exception as e:
        print(json.dumps({"stage": tag, "error": str(e)[:200]}), flush=True)


dtype = jnp.bfloat16

# ---- stem
@jax.jit
def stem_fwd(f):
    h = jw.apply_stem(params["encoder"], f.astype(dtype), config, stem)
    return jnp.sum(h.astype(jnp.float32))

@jax.jit
def stem_fwdbwd(f):
    def loss(p):
        h = jw.apply_stem(p["encoder"], f.astype(dtype), config, stem)
        return jnp.sum(h.astype(jnp.float32))
    g = jax.grad(loss)(params)
    return jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(jnp.abs(b).astype(jnp.float32)), g, 0.0)

# ---- encoder
@jax.jit
def enc_fwd(f):
    h = jw.encoder_apply(params, f, config, stem)
    return jnp.sum(h.astype(jnp.float32))

@jax.jit
def enc_fwdbwd(f):
    def loss(p):
        h = jw.encoder_apply(p, f, config, stem)
        return jnp.sum(h.astype(jnp.float32))
    g = jax.grad(loss)(params)
    return jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(jnp.abs(b).astype(jnp.float32)), g, 0.0)

# ---- full forward + CE
@jax.jit
def full_fwd(f):
    logits = jw.forward(params, f, toks, config, stem)
    return jw.ce_loss(logits, labels)

@jax.jit
def full_fwdbwd(f):
    def loss(p):
        logits = jw.forward(p, f, toks, config, stem)
        return jw.ce_loss(logits, labels)
    g = jax.grad(loss)(params)
    return jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(jnp.abs(b).astype(jnp.float32)), g, 0.0)

# ---- decoder only (frozen encoder output)
enc_out = jax.jit(lambda f: jw.encoder_apply(params, f, config, stem))(feats)
enc_out = jax.block_until_ready(enc_out)

@jax.jit
def dec_fwd(e):
    logits = jw.decoder_apply(params, toks, e, config)
    return jw.ce_loss(logits, labels)

@jax.jit
def dec_fwdbwd(e):
    def loss(p):
        logits = jw.decoder_apply(p, toks, e, config)
        return jw.ce_loss(logits, labels)
    g = jax.grad(loss)(params)
    return jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(jnp.abs(b).astype(jnp.float32)), g, 0.0)


stages = sys.argv[1:] or ["stem_fwd", "stem_fwdbwd", "enc_fwd", "enc_fwdbwd",
                          "dec_fwd", "dec_fwdbwd", "full_fwd", "full_fwdbwd"]
table = dict(stem_fwd=(stem_fwd, feats), stem_fwdbwd=(stem_fwdbwd, feats),
             enc_fwd=(enc_fwd, feats), enc_fwdbwd=(enc_fwdbwd, feats),
             dec_fwd=(dec_fwd, enc_out), dec_fwdbwd=(dec_fwdbwd, enc_out),
             full_fwd=(full_fwd, feats), full_fwdbwd=(full_fwdbwd, feats))
for s in stages:
    fn, arg = table[s]
    timeit(s, fn, arg)
