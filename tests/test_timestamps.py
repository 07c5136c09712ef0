"""Timestamp decoding: grammar parity vs HF processor, DTW alignment."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from neuspeech1_tpu.config import StemConfig
from neuspeech1_tpu.decode import timestamps as tsmod

from tests.test_model_parity import VOCAB, hf_model, small_cfg


def _hf_ts_processor(cfg, prompt_len, max_initial=50):
    from transformers import WhisperTimeStampLogitsProcessor
    from transformers import GenerationConfig as HFGen

    g = HFGen(
        no_timestamps_token_id=cfg.notimestamps_id,
        eos_token_id=cfg.eot_id,
        decoder_start_token_id=cfg.sot_id,
        max_initial_timestamp_index=max_initial,
    )
    return WhisperTimeStampLogitsProcessor(g, begin_index=prompt_len)


def _compare(cfg, tokens_np, prompt_len, seed=0):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((tokens_np.shape[0], cfg.vocab_size)).astype(
        np.float32
    )
    proc = _hf_ts_processor(cfg, prompt_len)
    ref = proc(
        torch.tensor(tokens_np, dtype=torch.long), torch.tensor(logits)
    ).numpy()
    cur_len = tokens_np.shape[1]
    pad = np.full((tokens_np.shape[0], 4), cfg.eot_id, np.int32)
    buf = np.concatenate([tokens_np.astype(np.int32), pad], axis=1)
    ours = np.asarray(
        tsmod.timestamp_rules(
            jnp.asarray(logits), jnp.asarray(buf), jnp.asarray(cur_len),
            cfg, prompt_len,
        )
    )
    ban_ref = ~np.isfinite(ref) | (ref < -1e8)
    ban_ours = ours < -1e8
    np.testing.assert_array_equal(ban_ours, ban_ref)
    live = ~ban_ref
    np.testing.assert_allclose(ours[live], ref[live], rtol=1e-5, atol=1e-5)


def test_grammar_parity_first_position():
    cfg = small_cfg()
    prompt = np.array([[cfg.sot_id, cfg.first_language_id, cfg.transcribe_id]])
    _compare(cfg, prompt, prompt_len=3)


def test_grammar_parity_after_single_timestamp():
    cfg = small_cfg()
    ts = cfg.timestamp_begin
    toks = np.array([[cfg.sot_id, cfg.first_language_id, cfg.transcribe_id,
                      ts + 2, 5, 7]])
    _compare(cfg, toks, prompt_len=3, seed=1)


def test_grammar_parity_after_timestamp_pair():
    cfg = small_cfg()
    ts = cfg.timestamp_begin
    toks = np.array([[cfg.sot_id, cfg.first_language_id, cfg.transcribe_id,
                      ts + 2, 5, ts + 9, ts + 9]])
    _compare(cfg, toks, prompt_len=3, seed=2)


def test_grammar_parity_text_then_close():
    cfg = small_cfg()
    ts = cfg.timestamp_begin
    toks = np.array([[cfg.sot_id, cfg.first_language_id, cfg.transcribe_id,
                      ts + 2, 5, 6, ts + 8]])
    _compare(cfg, toks, prompt_len=3, seed=3)


def test_median_filter():
    x = np.array([[1.0, 9.0, 1.0, 1.0, 9.0, 1.0, 1.0]])
    out = tsmod.median_filter(x, 3)
    assert out.shape == x.shape
    assert out[0, 1] == 1.0  # spike removed
    np.testing.assert_array_equal(tsmod.median_filter(x, 1), x)


def test_dtw_path_monotone_diagonal():
    # cost favoring the diagonal -> path is the diagonal
    n = 6
    cost = np.ones((n, n)) * 10
    np.fill_diagonal(cost, 0.0)
    ti, fi = tsmod.dtw_path(cost)
    assert (np.diff(ti) >= 0).all() and (np.diff(fi) >= 0).all()
    assert ti[0] == 0 and fi[0] == 0
    assert ti[-1] == n - 1 and fi[-1] == n - 1
    # diagonal cells all visited
    diag = set(zip(ti.tolist(), fi.tolist()))
    assert all((i, i) in diag for i in range(n))


def test_dtw_path_shifted_alignment():
    # token i aligns to frames [2i, 2i+1]
    n, m = 3, 6
    cost = np.ones((n, m))
    for i in range(n):
        cost[i, 2 * i] = 0.0
        cost[i, 2 * i + 1] = 0.0
    ti, fi = tsmod.dtw_path(cost)
    for i in range(n):
        frames = fi[ti == i]
        assert 2 * i in frames and 2 * i + 1 in frames


def test_word_timestamps_end_to_end():
    """Synthetic cross-attention alignment check on a tiny random model."""
    import jax

    from neuspeech1_tpu.models.init import init_params

    cfg = small_cfg()
    stem = StemConfig("base", in_channels=4)
    params = init_params(jax.random.key(0), cfg, stem)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(
        rng.standard_normal((1, 4, cfg.max_source_positions * 4)).astype(np.float32)
    )
    token_ids = [cfg.sot_id, cfg.first_language_id, cfg.transcribe_id,
                 10, 11, 12, cfg.eot_id]
    out = tsmod.word_timestamps(params, feats, token_ids, cfg, stem,
                                tokenizer=None)
    assert len(out) == 3  # the three text tokens
    for row in out:
        assert 0.0 <= row["start"] <= row["end"]


def test_generate_with_timestamp_grammar():
    """End-to-end greedy decode in timestamp mode emits a leading timestamp
    and respects the pair grammar."""
    from neuspeech1_tpu.decode.generate import GenerationConfig, greedy_decode
    from neuspeech1_tpu.models.convert import params_from_hf_state_dict

    cfg = small_cfg()
    m = hf_model(cfg)
    params = params_from_hf_state_dict(m.state_dict(), cfg, StemConfig("speech"))
    rng = np.random.default_rng(5)
    feats = rng.standard_normal(
        (1, cfg.num_mel_bins, cfg.max_source_positions * 2)
    ).astype(np.float32)
    prompt = np.asarray([[cfg.sot_id, cfg.first_language_id,
                          cfg.transcribe_id]], np.int32)
    gen = GenerationConfig.for_model(cfg, max_length=16, timestamps=True)
    out = np.asarray(greedy_decode(params, feats, prompt, cfg,
                                   StemConfig("speech"), gen))[0]
    assert out[3] >= cfg.timestamp_begin  # first generated token is a ts
    # timestamps non-decreasing
    ts = [t for t in out[3:] if t >= cfg.timestamp_begin]
    assert ts == sorted(ts)


def test_dtw_vectorized_matches_scalar_reference():
    """The anti-diagonal vectorization must reproduce the original scalar
    DP cell-for-cell (identical tie-breaking)."""
    import numpy as np

    from neuspeech1_tpu.decode.timestamps import dtw_path

    def dtw_scalar(cost):
        n, m = cost.shape
        D = np.full((n + 1, m + 1), np.inf)
        D[0, 0] = 0.0
        trace = np.zeros((n + 1, m + 1), dtype=np.int8)
        for i in range(1, n + 1):
            for j in range(1, m + 1):
                c0, c1, c2 = D[i - 1, j - 1], D[i - 1, j], D[i, j - 1]
                if c0 <= c1 and c0 <= c2:
                    D[i, j] = c0 + cost[i - 1, j - 1]; trace[i, j] = 0
                elif c1 <= c2:
                    D[i, j] = c1 + cost[i - 1, j - 1]; trace[i, j] = 1
                else:
                    D[i, j] = c2 + cost[i - 1, j - 1]; trace[i, j] = 2
        ti, fi = [], []
        i, j = n, m
        while i > 0 and j > 0:
            ti.append(i - 1); fi.append(j - 1)
            t = trace[i, j]
            if t == 0:
                i, j = i - 1, j - 1
            elif t == 1:
                i -= 1
            else:
                j -= 1
        return np.array(ti[::-1]), np.array(fi[::-1])

    rng = np.random.default_rng(0)
    for shape in [(5, 9), (12, 7), (1, 20), (30, 30), (17, 3)]:
        cost = rng.standard_normal(shape)
        ti_v, fi_v = dtw_path(cost)
        ti_s, fi_s = dtw_scalar(cost)
        np.testing.assert_array_equal(ti_v, ti_s, err_msg=str(shape))
        np.testing.assert_array_equal(fi_v, fi_s, err_msg=str(shape))
    # ties exercise the tie-breaking rules explicitly
    cost = np.zeros((6, 8))
    ti_v, fi_v = dtw_path(cost)
    ti_s, fi_s = dtw_scalar(cost)
    np.testing.assert_array_equal(ti_v, ti_s)
    np.testing.assert_array_equal(fi_v, fi_s)


def test_dtw_448x1500_is_fast():
    import time

    import numpy as np

    from neuspeech1_tpu.decode.timestamps import dtw_path

    cost = np.random.default_rng(1).standard_normal((448, 1500))
    t0 = time.perf_counter()
    ti, fi = dtw_path(cost)
    dt = time.perf_counter() - t0
    assert dt < 5.0, f"dtw_path took {dt:.1f}s at full whisper geometry"
    # path properties: monotonic, covers both ends
    assert ti[0] == 0 and fi[0] == 0
    assert ti[-1] == 447 and fi[-1] == 1499
    assert (np.diff(ti) >= 0).all() and (np.diff(fi) >= 0).all()
