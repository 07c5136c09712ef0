"""Fused decode-step self-attention kernel (ops/decode_step.py) parity.

The kernel collapses the per-layer cache-write + score + softmax + PV
chain into one Pallas op (interpret mode here; the real kernel on TPU).
Parity bar: identical cache updates (exact) and matching attention
context / end-to-end decode tokens vs the XLA `_self_decode_dt` path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neuspeech1_tpu.config import StemConfig, WhisperConfig
from neuspeech1_tpu.decode.generate import (GenerationConfig, beam_search,
                                            greedy_decode)
from neuspeech1_tpu.models import whisper as jw
from neuspeech1_tpu.models.init import init_params
from neuspeech1_tpu.ops import decode_step


def _rand_inputs(b, h, dh, t_max, idx, dtype, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, 1, h, dh)), dtype)
    kn = jnp.asarray(rng.standard_normal((b, 1, h, dh)), dtype)
    vn = jnp.asarray(rng.standard_normal((b, 1, h, dh)), dtype)
    # pre-existing cache contents for positions < idx, garbage beyond
    k_t = jnp.asarray(rng.standard_normal((b, h, dh, t_max)), dtype)
    v_t = jnp.asarray(rng.standard_normal((b, h, dh, t_max)), dtype)
    return q, kn, vn, k_t, v_t


def _xla_reference(q, kn, vn, k_t, v_t, idx):
    """The exact `_self_decode_dt` XLA math (whisper.py)."""
    from jax import lax

    k2 = lax.dynamic_update_slice(k_t, kn.transpose(0, 2, 3, 1),
                                  (0, 0, 0, idx))
    v2 = lax.dynamic_update_slice(v_t, vn.transpose(0, 2, 3, 1),
                                  (0, 0, 0, idx))
    dh = q.shape[-1]
    t_max = k_t.shape[-1]
    scores = jnp.einsum("bqhd,bhdk->bhqk", q, k2).astype(jnp.float32)
    scores = scores * (dh ** -0.5)
    mask = (jnp.arange(t_max) <= idx)[None, None, None, :]
    scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bhdk->bqhd", probs, v2)
    return out, k2, v2


@pytest.mark.parametrize("dtype,tol", [("float32", 1e-5), ("bfloat16", 2e-2)])
@pytest.mark.parametrize("idx", [0, 5, 35])
def test_fused_matches_xla(dtype, tol, idx):
    b, h, dh, t_max = 4, 2, 8, 36  # odd Tmax: sub-128 lane block
    q, kn, vn, k_t, v_t = _rand_inputs(b, h, dh, t_max, idx, dtype, seed=idx)
    ref_o, ref_k, ref_v = _xla_reference(q, kn, vn, k_t, v_t, idx)
    out, k2, v2 = decode_step.fused_self_decode(q, kn, vn, k_t, v_t, idx)
    np.testing.assert_array_equal(np.asarray(k2, np.float32),
                                  np.asarray(ref_k, np.float32))
    np.testing.assert_array_equal(np.asarray(v2, np.float32),
                                  np.asarray(ref_v, np.float32))
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref_o, np.float32),
                               rtol=tol, atol=tol)


def test_fused_chunked_grid(monkeypatch):
    """Force a multi-cell grid (batch chunking) through the VMEM budget."""
    b, h, dh, t_max, idx = 6, 2, 8, 40, 7
    q, kn, vn, k_t, v_t = _rand_inputs(b, h, dh, t_max, idx, "float32")
    tp = -(-t_max // 128) * 128
    per_row = h * dh * tp * (2 * 4 + 16) + h * tp * 32
    monkeypatch.setattr(decode_step, "_VMEM_BUDGET", 3 * per_row)
    assert decode_step._batch_chunk(b, h, dh, t_max, 4) == 3
    ref_o, ref_k, ref_v = _xla_reference(q, kn, vn, k_t, v_t, idx)
    out, k2, v2 = decode_step.fused_self_decode(q, kn, vn, k_t, v_t, idx)
    np.testing.assert_array_equal(np.asarray(k2), np.asarray(ref_k))
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(ref_v))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_o),
                               rtol=1e-5, atol=1e-5)


@pytest.fixture()
def tiny_model():
    layout = WhisperConfig.layout_for_vocab(256)
    cfg = WhisperConfig(
        num_mel_bins=16, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_heads=2, decoder_heads=2, encoder_ffn=64, decoder_ffn=64,
        max_source_positions=16, max_target_positions=24, dtype="float32",
        **layout)
    stem = StemConfig("speech")
    params = init_params(jax.random.key(0), cfg, stem)
    rng = np.random.default_rng(5)
    feats = rng.standard_normal((3, cfg.num_mel_bins,
                                 cfg.max_source_positions * 2)
                                ).astype(np.float32)
    prompt = np.asarray([[cfg.sot_id, cfg.first_language_id,
                          cfg.transcribe_id, cfg.notimestamps_id]] * 3,
                        np.int32)
    return cfg, stem, params, feats, prompt


def _decode_both(monkeypatch, fn):
    monkeypatch.setenv("NEUSPEECH_DECODE_SELF_FUSED", "0")
    base = np.asarray(fn())
    monkeypatch.setenv("NEUSPEECH_DECODE_SELF_FUSED", "1")
    fused = np.asarray(fn())
    return base, fused


def test_greedy_e2e_fused_equals_xla(monkeypatch, tiny_model):
    cfg, stem, params, feats, prompt = tiny_model
    gen = GenerationConfig.for_model(cfg, max_length=14)
    base, fused = _decode_both(
        monkeypatch,
        lambda: greedy_decode(params, feats, prompt, cfg, stem, gen))
    np.testing.assert_array_equal(fused, base)


def test_beam_e2e_fused_equals_xla(monkeypatch, tiny_model):
    cfg, stem, params, feats, prompt = tiny_model
    gen = GenerationConfig.for_model(cfg, max_length=14, num_beams=3,
                                     repetition_penalty=2.0,
                                     no_repeat_ngram_size=2)
    def run():
        seq, scores = beam_search(params, feats, prompt, cfg, stem, gen)
        return np.asarray(seq)
    base, fused = _decode_both(monkeypatch, run)
    np.testing.assert_array_equal(fused, base)


def test_bucketed_greedy_fused_equals_xla(monkeypatch, tiny_model):
    cfg, stem, params, feats, prompt = tiny_model
    gen = GenerationConfig.for_model(cfg, max_length=20,
                                     decode_buckets=(8, 12))
    base, fused = _decode_both(
        monkeypatch,
        lambda: greedy_decode(params, feats, prompt, cfg, stem, gen))
    np.testing.assert_array_equal(fused, base)


# ----------------------------------------------------------------------
# multi-query (speculative draft-verify) kernel
# ----------------------------------------------------------------------

def _xla_reference_multi(q, kn, vn, mask, k_t, v_t, idx):
    """The exact `_self_decode_dt_unrolled` XLA math (whisper.py):
    progressive column writes, per-query matvec+softmax under mask."""
    from jax import lax

    g = q.shape[1]
    dh = q.shape[-1]
    outs = []
    for i in range(g):
        k_t = lax.dynamic_update_slice(
            k_t, kn[:, i:i + 1].transpose(0, 2, 3, 1), (0, 0, 0, idx + i))
        v_t = lax.dynamic_update_slice(
            v_t, vn[:, i:i + 1].transpose(0, 2, 3, 1), (0, 0, 0, idx + i))
        s = jnp.einsum("bqhd,bhdk->bhqk", q[:, i:i + 1], k_t)
        s = s.astype(jnp.float32) * (dh ** -0.5)
        s = jnp.where(mask[:, :, i:i + 1], s, jnp.finfo(jnp.float32).min)
        pr = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        outs.append(jnp.einsum("bhqk,bhdk->bqhd", pr, v_t))
    return jnp.concatenate(outs, axis=1), k_t, v_t


@pytest.mark.parametrize("dtype,tol", [("float32", 1e-5), ("bfloat16", 2e-2)])
def test_fused_multi_matches_xla(dtype, tol):
    b, g, h, dh, t_max, idx = 3, 4, 2, 8, 40, 9
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((b, g, h, dh)), dtype)
    kn = jnp.asarray(rng.standard_normal((b, g, h, dh)), dtype)
    vn = jnp.asarray(rng.standard_normal((b, g, h, dh)), dtype)
    k_t = jnp.asarray(rng.standard_normal((b, h, dh, t_max)), dtype)
    v_t = jnp.asarray(rng.standard_normal((b, h, dh, t_max)), dtype)
    # spec-style mask: random accepted prefix holes + in-block causal
    valid = jnp.asarray(rng.random((b, t_max)) < 0.7)
    valid = valid.at[:, idx:].set(False)
    off = jnp.arange(t_max)[None, None, None, :] - idx
    inblock = (off >= 0) & (off <= jnp.arange(g)[None, None, :, None])
    mask = valid[:, None, None, :] | inblock     # [B, 1, g, T]
    ref_o, ref_k, ref_v = _xla_reference_multi(q, kn, vn, mask, k_t, v_t,
                                               idx)
    out, k2, v2 = decode_step.fused_self_decode_multi(q, kn, vn, mask,
                                                      k_t, v_t, idx)
    np.testing.assert_array_equal(np.asarray(k2, np.float32),
                                  np.asarray(ref_k, np.float32))
    np.testing.assert_array_equal(np.asarray(v2, np.float32),
                                  np.asarray(ref_v, np.float32))
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref_o, np.float32),
                               rtol=tol, atol=tol)


@pytest.mark.parametrize("gamma", [2, 4])
def test_spec_e2e_fused_equals_xla(monkeypatch, tiny_model, gamma):
    from neuspeech1_tpu.decode.spec import spec_greedy_decode

    cfg, stem, params, feats, prompt = tiny_model
    gen = GenerationConfig.for_model(cfg, max_length=16)

    def run():
        out, _ = spec_greedy_decode(params, feats, prompt, cfg, stem, gen,
                                    gamma=gamma)
        return np.asarray(out)

    base, fused = _decode_both(monkeypatch, run)
    np.testing.assert_array_equal(fused, base)
    # and the structural bar: fused spec == plain greedy (both fused)
    gold = np.asarray(greedy_decode(params, feats, prompt, cfg, stem, gen))
    np.testing.assert_array_equal(fused, gold)
