"""Random parameter initialization (HF-whisper-compatible distributions).

Linear/conv/embedding weights ~ N(0, 0.02) (HF `init_std`), layer norms at
identity, encoder positions sinusoidal (OpenAI `sinusoids`), decoder
positions learned ~ N(0, 0.02).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from neuspeech1_tpu.config import StemConfig, WhisperConfig

INIT_STD = 0.02


def sinusoids(length: int, channels: int) -> np.ndarray:
    """OpenAI Whisper fixed sinusoidal table [length, channels]."""
    assert channels % 2 == 0
    log_timescale_increment = np.log(10000) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale_increment * np.arange(channels // 2))
    scaled_time = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled_time), np.cos(scaled_time)], axis=1).astype(
        np.float32
    )


def _nrm(key, shape, dtype, std=INIT_STD):
    return std * jax.random.normal(key, shape, dtype)


def _linear(key, d_in, d_out, n_layers, dtype, bias=True):
    k1, k2 = jax.random.split(key)
    p = {"w": _nrm(k1, (n_layers, d_in, d_out), dtype)}
    if bias:
        p["b"] = jnp.zeros((n_layers, d_out), dtype)
    return p


def _ln(n_layers, d, dtype):
    return {
        "scale": jnp.ones((n_layers, d), dtype),
        "bias": jnp.zeros((n_layers, d), dtype),
    }


def _conv(key, c_out, c_in, k, dtype):
    k1, _ = jax.random.split(key)
    return {"w": _nrm(k1, (c_out, c_in, k), dtype), "b": jnp.zeros((c_out,), dtype)}


def _attn(key, d, n_layers, dtype):
    kq, kk, kv, ko = jax.random.split(key, 4)
    return {
        "q": _linear(kq, d, d, n_layers, dtype),
        "k": _linear(kk, d, d, n_layers, dtype, bias=False),  # whisper: no k bias
        "v": _linear(kv, d, d, n_layers, dtype),
        "out": _linear(ko, d, d, n_layers, dtype),
    }


def init_stem(key, config: WhisperConfig, stem: StemConfig, dtype=jnp.float32):
    d = config.d_model
    if stem.kind == "speech":
        return {"conv1": _conv(key, d, config.num_mel_bins, 3, dtype)}
    if stem.kind == "base":
        ka, kb = jax.random.split(key)
        return {
            "conv_a": _conv(ka, d, stem.in_channels, 3, dtype),
            "conv_b": _conv(kb, d, d, 3, dtype),
        }
    if stem.kind == "replace":
        return {"conv": _conv(key, d, stem.in_channels, 3, dtype)}
    if stem.kind == "premel":
        ka, kb = jax.random.split(key)
        return {
            "pre_conv": _conv(ka, config.num_mel_bins, stem.in_channels, 5, dtype),
            "conv1": _conv(kb, d, config.num_mel_bins, 3, dtype),
        }
    raise ValueError(stem.kind)


def init_params(key, config: WhisperConfig, stem: StemConfig, dtype=None):
    """Full random parameter tree (layers stacked on a leading axis)."""
    dtype = jnp.dtype(dtype or config.param_dtype)
    d = config.d_model
    keys = jax.random.split(key, 12)

    encoder = {
        "stem": init_stem(keys[0], config, stem, dtype),
        "conv2": _conv(keys[1], d, d, 3, dtype),
        "pos_embed": jnp.asarray(sinusoids(config.max_source_positions, d), dtype),
        "layers": {
            "self_attn": _attn(keys[2], d, config.encoder_layers, dtype),
            "self_attn_ln": _ln(config.encoder_layers, d, dtype),
            "fc1": _linear(keys[3], d, config.encoder_ffn, config.encoder_layers, dtype),
            "fc2": _linear(keys[4], config.encoder_ffn, d, config.encoder_layers, dtype),
            "final_ln": _ln(config.encoder_layers, d, dtype),
        },
        "ln_post": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
    }
    decoder = {
        "token_embed": _nrm(keys[5], (config.vocab_size, d), dtype),
        "pos_embed": _nrm(keys[6], (config.max_target_positions, d), dtype),
        "layers": {
            "self_attn": _attn(keys[7], d, config.decoder_layers, dtype),
            "self_attn_ln": _ln(config.decoder_layers, d, dtype),
            "cross_attn": _attn(keys[8], d, config.decoder_layers, dtype),
            "cross_attn_ln": _ln(config.decoder_layers, d, dtype),
            "fc1": _linear(keys[9], d, config.decoder_ffn, config.decoder_layers, dtype),
            "fc2": _linear(keys[10], config.decoder_ffn, d, config.decoder_layers, dtype),
            "final_ln": _ln(config.decoder_layers, d, dtype),
        },
        "ln": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
    }
    return {"encoder": encoder, "decoder": decoder}


def param_count(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
