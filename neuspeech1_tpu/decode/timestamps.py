"""Whisper timestamp decoding: logits rules + DTW word-level timestamps.

Counterparts of the reference's vendored generate-with-timestamps machinery
(`utils/load_model.py:1072-1330` assembles the processor; `:252-324`
`_median_filter` / `_dynamic_time_warping`; `:1362-1401` token-timestamp
extraction from cross-attention).

`timestamp_rules` is a jit-friendly logits processor implementing the HF
WhisperTimeStampLogitsProcessor semantics; `word_timestamps` recomputes
cross-attention alignments teacher-forced and runs median-filter + DTW on
the host (numpy) — an offline analysis path, not a hot loop.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from neuspeech1_tpu.config import StemConfig, WhisperConfig

# host scalar, NOT eager jnp: see decode/logits_process.py NEG_INF — a
# module-level device scalar costs a 228 s device fetch at lowering time
# on the tunneled TPU runtime
NEG_INF = np.float32(-1e9)


def timestamp_rules(
    logits,
    tokens,
    cur_len,
    config,
    prompt_len: int,
    max_initial_timestamp_index: Optional[int] = 50,
):
    """`config` needs .timestamp_begin / .notimestamps_id / .eot_id — either
    a WhisperConfig or a GenerationConfig carrying the ids."""
    """Apply whisper's timestamp grammar to [B, V] logits.

    Rules (HF WhisperTimeStampLogitsProcessor):
      * timestamps come in pairs: after (ts, ts) force text; after (text, ts)
        force timestamp-or-eot;
      * timestamps are non-decreasing: ban timestamps below the largest seen;
      * at the first free position, only timestamps are allowed, optionally
        clamped to <= begin + max_initial_timestamp_index;
      * if total timestamp probability beats the best text token, sample a
        timestamp.
    """
    c = config
    b, v = logits.shape
    l = tokens.shape[-1]
    ts_begin = c.timestamp_begin
    logits = logits.astype(jnp.float32)
    # always forbid <|notimestamps|> in timestamp mode
    logits = logits.at[:, c.notimestamps_id].set(NEG_INF)

    def tok_at(offset):
        pos = jnp.clip(cur_len - offset, 0, l - 1)
        val = jnp.take_along_axis(tokens, pos[None, None].astype(jnp.int32), axis=1)[:, 0]
        return jnp.where(cur_len - offset >= prompt_len, val, -1)

    last = tok_at(1)
    penult = tok_at(2)
    last_was_ts = last >= ts_begin
    penult_was_ts = penult >= ts_begin

    is_ts = jnp.arange(v)[None, :] >= ts_begin  # [1, V]
    is_text_or_ts = jnp.arange(v)[None, :] < c.eot_id  # plain text ids

    # pair rule
    ban_ts = last_was_ts & penult_was_ts
    ban_text = last_was_ts & ~penult_was_ts
    logits = jnp.where(ban_ts[:, None] & is_ts, NEG_INF, logits)
    logits = jnp.where(ban_text[:, None] & is_text_or_ts, NEG_INF, logits)

    # monotonicity: ban timestamps below the last seen (HF: the last
    # timestamp itself stays allowed only while completing a (text, ts) pair)
    pos_idx = jnp.arange(l)[None, :]
    valid = (pos_idx >= prompt_len) & (pos_idx < cur_len)
    ts_tokens = jnp.where(valid & (tokens >= ts_begin), tokens, ts_begin - 1)
    max_ts = jnp.max(ts_tokens, axis=1)  # [B]
    limit = jnp.where(last_was_ts & ~penult_was_ts, max_ts, max_ts + 1)
    vocab_idx = jnp.arange(v)[None, :]
    below = (vocab_idx >= ts_begin) & (vocab_idx < limit[:, None])
    has_ts = max_ts >= ts_begin
    logits = jnp.where(has_ts[:, None] & below, NEG_INF, logits)

    # first free position: timestamps only (+ initial clamp)
    at_begin = cur_len == prompt_len
    first_row = jnp.where(is_ts, logits, NEG_INF)
    if max_initial_timestamp_index is not None:
        clamp = vocab_idx > (ts_begin + max_initial_timestamp_index)
        first_row = jnp.where(clamp, NEG_INF, first_row)
    logits = jnp.where(at_begin, first_row, logits)

    # timestamp-mass rule
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    ts_mass = jax.scipy.special.logsumexp(
        jnp.where(is_ts, logprobs, -jnp.inf), axis=-1
    )  # [B]
    max_text = jnp.max(jnp.where(is_ts, -jnp.inf, logprobs), axis=-1)
    force_ts = ts_mass > max_text
    logits = jnp.where(force_ts[:, None] & ~is_ts, NEG_INF, logits)
    return logits


# ----------------------------------------------------------------------
# DTW word-level timestamps from cross-attention
# ----------------------------------------------------------------------

def median_filter(x: np.ndarray, width: int) -> np.ndarray:
    """1-D median filter over the last axis with edge reflection
    (behavioral parity with the reference `_median_filter`,
    `utils/load_model.py:252-270`)."""
    if width <= 1:
        return x
    pad = width // 2
    xp = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    windows = np.lib.stride_tricks.sliding_window_view(xp, width, axis=-1)
    return np.median(windows, axis=-1)


def dtw_path(cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Monotonic alignment through a [N_tokens, N_frames] cost matrix
    (reference `_dynamic_time_warping`, `utils/load_model.py:273-324`).
    Returns (token_indices, frame_indices) of the optimal path.

    Vectorized over anti-diagonals: cells on diagonal i+j=k depend only on
    diagonals k−1 and k−2, so each diagonal is one numpy step — O(N+M)
    python iterations instead of O(N·M) scalar loops (448 tokens × 1500
    frames: ~2k vector steps vs ~700k Python-loop cells)."""
    n, m = cost.shape
    D = np.full((n + 1, m + 1), np.inf)
    D[0, 0] = 0.0
    trace = np.zeros((n + 1, m + 1), dtype=np.int8)
    for k in range(2, n + m + 1):
        i = np.arange(max(1, k - m), min(n, k - 1) + 1)
        if i.size == 0:
            continue
        j = k - i
        c0 = D[i - 1, j - 1]  # diagonal       (k-2)
        c1 = D[i - 1, j]      # token step     (k-1)
        c2 = D[i, j - 1]      # frame step     (k-1)
        # tie-breaking identical to the scalar version: diag wins ties,
        # then token step
        t = np.where((c0 <= c1) & (c0 <= c2), 0,
                     np.where(c1 <= c2, 1, 2)).astype(np.int8)
        best = np.choose(t, [c0, c1, c2])
        D[i, j] = best + cost[i - 1, j - 1]
        trace[i, j] = t
    ti, fi = [], []
    i, j = n, m
    while i > 0 and j > 0:
        ti.append(i - 1)
        fi.append(j - 1)
        t = trace[i, j]
        if t == 0:
            i, j = i - 1, j - 1
        elif t == 1:
            i -= 1
        else:
            j -= 1
    return np.array(ti[::-1]), np.array(fi[::-1])


def cross_attention_maps(
    params,
    tokens,
    enc_out,
    config: WhisperConfig,
    lora=None,
):
    """Teacher-forced pass collecting per-layer cross-attention probs.

    Returns [L, B, H, T_tok, T_enc] (f32). Offline analysis only.
    """
    from neuspeech1_tpu.models.whisper import (
        _merge_heads, _split_heads, layer_norm, linear, mha, mlp,
    )

    dtype = jnp.dtype(config.dtype)
    dec = params["decoder"]
    b, t = tokens.shape
    h = dec["token_embed"][tokens].astype(dtype)
    h = h + dec["pos_embed"].astype(dtype)[None, :t]
    causal = jnp.tril(jnp.ones((t, t), bool))[None, None]
    enc_out = enc_out.astype(dtype)
    n_heads = config.decoder_heads

    def body(carry, layer_p):
        hh = carry
        res = hh
        x = layer_norm(hh, layer_p["self_attn_ln"])
        x, _ = mha(x, layer_p["self_attn"], n_heads, mask=causal)
        hh = res + x
        res = hh
        x = layer_norm(hh, layer_p["cross_attn_ln"])
        # explicit attention to capture probs
        q = _split_heads(linear(x, layer_p["cross_attn"]["q"]), n_heads)
        k = _split_heads(linear(enc_out, layer_p["cross_attn"]["k"]), n_heads)
        v = _split_heads(linear(enc_out, layer_p["cross_attn"]["v"]), n_heads)
        dh = q.shape[-1]
        # q/k/v are BTHD ([B, T, H, Dh]) — see models/whisper._split_heads
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        probs = jax.nn.softmax(scores * dh**-0.5, axis=-1)
        att = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
        x = linear(_merge_heads(att), layer_p["cross_attn"]["out"])
        hh = res + x
        res = hh
        x = layer_norm(hh, layer_p["final_ln"])
        hh = res + mlp(x, layer_p)
        return hh, probs

    _, maps = jax.lax.scan(body, h, dec["layers"])
    return maps  # [L, B, H, T_tok, T_enc]


def word_timestamps(
    params,
    features,
    token_ids: List[int],
    config: WhisperConfig,
    stem: StemConfig,
    tokenizer=None,  # reserved for word-level grouping of text tokens
    time_per_frame: float = 0.02,
    medfilt_width: int = 7,
    lora=None,
) -> List[dict]:
    """Token-level start/end times for one decoded sequence via DTW over
    cross-attention (reference `utils/load_model.py:1362-1401`).

    features: [1, ch, T_sig]; token_ids: full sequence incl. specials.
    Returns [{"token": id, "start": s, "end": s}] for text tokens.
    """
    from neuspeech1_tpu.models.whisper import encoder_apply

    enc = encoder_apply(params, features, config, stem, lora=lora)
    toks = jnp.asarray([token_ids], jnp.int32)
    maps = np.asarray(
        cross_attention_maps(params, toks, enc, config, lora=lora),
        dtype=np.float32,
    )  # [L, 1, H, T_tok, T_enc]
    w = maps[:, 0].mean(axis=(0, 1))  # [T_tok, T_enc] averaged layers+heads
    # normalize each token row, median-filter along frames
    w = (w - w.mean(axis=-1, keepdims=True)) / (w.std(axis=-1, keepdims=True) + 1e-9)
    w = median_filter(w, medfilt_width)
    ti, fi = dtw_path(-w)  # maximize attention == minimize negative
    starts = np.zeros(len(token_ids))
    ends = np.zeros(len(token_ids))
    for tok_idx in range(len(token_ids)):
        frames = fi[ti == tok_idx]
        if len(frames):
            starts[tok_idx] = frames.min() * time_per_frame
            ends[tok_idx] = (frames.max() + 1) * time_per_frame
    out = []
    for i, tok in enumerate(token_ids):
        if tok < config.eot_id:  # text tokens only
            out.append({"token": int(tok), "start": float(starts[i]),
                        "end": float(ends[i])})
    return out
