"""Int8 weight-only quantization: roundtrip accuracy + model-level check."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neuspeech1_tpu.config import StemConfig
from neuspeech1_tpu.models import whisper as jw
from neuspeech1_tpu.models.init import init_params
from neuspeech1_tpu.models.quantize import (
    dequantize_params,
    quantization_error,
    quantize_int8,
    quantize_params,
)

from tests.test_train import make_batch, mini_cfg


def test_int8_roundtrip_error_small(rng):
    w = jnp.asarray(rng.standard_normal((2, 64, 32)).astype(np.float32) * 0.02)
    q, s = quantize_int8(w)
    assert q.dtype == jnp.int8
    back = np.asarray(q, np.float32) * np.asarray(s)
    rel = np.abs(back - np.asarray(w)).max() / np.abs(np.asarray(w)).max()
    assert rel < 0.01  # 127-level symmetric quant


def test_quantize_params_structure():
    cfg = mini_cfg()
    stem = StemConfig("base", in_channels=6)
    params = init_params(jax.random.key(0), cfg, stem)
    qp = quantize_params(params)
    attn = qp["encoder"]["layers"]["self_attn"]["q"]
    assert "w_int8" in attn and "w" not in attn
    assert attn["w_int8"].dtype == jnp.int8
    # convs untouched
    assert "w" in qp["encoder"]["stem"]["conv_a"]
    # embeddings untouched (2-D)
    assert "w_int8" not in str(type(qp["decoder"]["token_embed"]))
    back = dequantize_params(qp)
    assert "w" in back["encoder"]["layers"]["self_attn"]["q"]


def test_model_logits_close_after_quant():
    cfg = mini_cfg()
    stem = StemConfig("base", in_channels=6)
    params = init_params(jax.random.key(0), cfg, stem)
    batch = make_batch(cfg, stem, b=2)
    ref = np.asarray(jw.forward(params, batch["input_features"],
                                batch["decoder_input_ids"], cfg, stem))
    deq = dequantize_params(quantize_params(params))
    out = np.asarray(jw.forward(deq, batch["input_features"],
                                batch["decoder_input_ids"], cfg, stem))
    # logits drift small relative to their scale
    denom = np.abs(ref).max()
    assert np.abs(out - ref).max() / denom < 0.05
    # top-1 predictions essentially unchanged
    agree = (out.argmax(-1) == ref.argmax(-1)).mean()
    assert agree > 0.95


def test_quantization_error_metric():
    cfg = mini_cfg()
    stem = StemConfig("base", in_channels=6)
    params = init_params(jax.random.key(0), cfg, stem)
    err = quantization_error(params)
    assert 0 < err < 0.02
