"""Honest (chained) stage decomposition of the whisper-base train step.
Params passed as jit args (captured constants 413 the remote compiler)."""
import json, time
import jax, jax.numpy as jnp, numpy as np
from neuspeech1_tpu import enable_compilation_cache
from neuspeech1_tpu.config import StemConfig, WhisperConfig
from neuspeech1_tpu.models import whisper as jw
from neuspeech1_tpu.models.init import init_params
enable_compilation_cache()

BS = 64
config = WhisperConfig(remat=True)  # flash_qkv policy, decoder XLA attn
stem = StemConfig("base", in_channels=208)
params = init_params(jax.random.key(0), config, stem)
rng = np.random.default_rng(0)
feats = jnp.asarray(rng.standard_normal((BS, 208, 6000)).astype(np.float32))
toks = jnp.asarray(rng.integers(0, 50000, (BS, 64)).astype(np.int32))
labels = jnp.asarray(rng.integers(0, 50000, (BS, 64)).astype(np.int32))
dtype = jnp.bfloat16


def chained(tag, fn, x0, K=15):
    try:
        y = fn(params, x0); float(jax.device_get(jnp.ravel(y)[0]))
        x = x0
        t0 = time.perf_counter()
        for _ in range(K):
            y = fn(params, x)
            x = x0 + jnp.ravel(y)[0].astype(x0.dtype) * 1e-12
        float(jax.device_get(jnp.ravel(y)[0]))
        dt = (time.perf_counter() - t0) / K
        print(json.dumps({"stage": tag, "ms": round(dt*1e3, 1)}), flush=True)
    except Exception as e:
        print(json.dumps({"stage": tag, "error": str(e)[:160]}), flush=True)


def g(loss_fn):
    def f(p, x):
        gr = jax.grad(loss_fn)(p, x)
        return jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(jnp.abs(b).astype(jnp.float32)), gr, 0.0)
    return f

stem_loss = lambda p, x: jnp.sum(jw.apply_stem(p["encoder"], x.astype(dtype), config, stem).astype(jnp.float32))
enc_loss = lambda p, x: jnp.sum(jw.encoder_apply(p, x, config, stem).astype(jnp.float32))
full_loss = lambda p, x: jw.ce_loss(jw.forward(p, x, toks, config, stem), labels)

chained("stem_fwd", jax.jit(stem_loss), feats)
chained("stem_fwdbwd", jax.jit(g(stem_loss)), feats)
chained("enc_fwd", jax.jit(enc_loss), feats)
chained("enc_fwdbwd", jax.jit(g(enc_loss)), feats)
chained("full_fwd", jax.jit(full_loss), feats)
chained("full_fwdbwd", jax.jit(g(full_loss)), feats)

enc_out = jax.jit(lambda p, x: jw.encoder_apply(p, x, config, stem))(params, feats)
dec_loss = lambda p, e: jw.ce_loss(jw.decoder_apply(p, toks, e, config), labels)
chained("dec_fwd", jax.jit(dec_loss), enc_out)
chained("dec_fwdbwd", jax.jit(g(dec_loss)), enc_out)
