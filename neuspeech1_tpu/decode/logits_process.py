"""Logits processors — jnp, fixed-shape, jit-friendly.

Functional equivalents of the HF processors the reference relies on at decode
time (`evaluation.py:369-386`: repetition_penalty=5.0,
no_repeat_ngram_size=2, sequence_bias from YAKE keywords, forced
language/task prefixes; `utils/load_model.py:1210-1294` assembles the forced
ids). Each processor takes logits [B, V] plus the fixed-size token buffer
`tokens` [B, L] and the current length `cur_len` (scalar), and returns new
logits. Positions >= cur_len in `tokens` are garbage and must be masked via
`cur_len`, never dynamic shapes.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# MUST be a host (numpy) scalar, not an eager jnp array: a module-level
# jnp.float32 is created ON THE DEFAULT DEVICE at import and closed over by
# every decode program — embedding it as an MLIR constant then fetches it
# back from the device at lowering time, which on the tunneled TPU runtime
# measured 228 s of the beam program's 232 s trace+lower cold-start
# (round-5 eval-CLI investigation; numpy constants embed without any
# device round-trip and trace identically).
NEG_INF = np.float32(-1e9)


def _ban_mask(ids: Sequence[int], vocab: int):
    """Static id tuple -> dense [V] bool ban mask (host-built constant).

    The scatter form (`logits.at[..., ids].set(NEG_INF)`) serializes on
    TPU: measured 155 ms/step (!) inside the flagship greedy decode loop
    with the byte tokenizer's 30 derived suppress ids vs ~3.6 ms/step
    with the dense-mask where (round 4; every eval-CLI decode with
    suppress_tokens='default' paid it)."""
    import numpy as np

    mask = np.zeros((vocab,), bool)
    mask[np.asarray(list(ids), np.int64)] = True
    return jnp.asarray(mask)


def suppress_tokens(logits, ids: Sequence[int]):
    """Always-banned ids (HF SuppressTokensLogitsProcessor)."""
    if not len(ids):
        return logits
    return jnp.where(_ban_mask(ids, logits.shape[-1]), NEG_INF, logits)


def suppress_tokens_at_begin(logits, cur_len, begin_index: int, ids: Sequence[int]):
    """Ban ids only at the first free position (HF SuppressTokensAtBegin —
    whisper bans eot right after the forced prefix)."""
    if not len(ids):
        return logits
    hit = _ban_mask(ids, logits.shape[-1]) & (cur_len == begin_index)
    return jnp.where(hit, NEG_INF, logits)


def force_tokens(logits, cur_len, forced_positions, forced_ids):
    """At positions listed in `forced_positions` force the paired id
    (HF ForceTokensLogitsProcessor; whisper's <|lang|><|task|><|nots|>).

    forced_positions/forced_ids: static int tuples of equal length.
    """
    if not len(forced_positions):
        return logits
    pos = jnp.asarray(list(forced_positions), jnp.int32)
    ids = jnp.asarray(list(forced_ids), jnp.int32)
    match = pos == cur_len  # [F]
    any_match = jnp.any(match)
    forced_id = jnp.sum(jnp.where(match, ids, 0))
    is_forced = jnp.arange(logits.shape[-1]) == forced_id  # no scatter
    forced_row = jnp.where(is_forced, 0.0, NEG_INF).astype(logits.dtype)
    return jnp.where(any_match, forced_row, logits)


def repetition_penalty(logits, tokens, cur_len, penalty: float):
    """HF RepetitionPenaltyLogitsProcessor over the whole buffer (prompt +
    generated): seen tokens get score/p if positive else score*p."""
    if penalty == 1.0:
        return logits
    b, v = logits.shape
    l = tokens.shape[-1]
    valid = jnp.arange(l)[None, :] < cur_len  # [B, L]
    onehot = jax.nn.one_hot(tokens, v, dtype=jnp.bool_)  # [B, L, V]
    seen = jnp.any(onehot & valid[..., None], axis=1)  # [B, V]
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, penalized, logits)


def seen_from_tokens(tokens, cur_len, vocab: int):
    """Dense seen-token set [B, V] from a buffer prefix (positions <
    cur_len). Used once at loop start; the decode loops then maintain it
    incrementally via `update_seen` (O(V)/step instead of the O(L*V)
    buffer rescan `repetition_penalty` does)."""
    valid = jnp.arange(tokens.shape[-1])[None, :] < cur_len
    onehot = jax.nn.one_hot(tokens, vocab, dtype=jnp.bool_)
    return jnp.any(onehot & valid[..., None], axis=1)


def update_seen(seen, new_tokens):
    """seen [B, V] |= onehot(new_tokens [B]) — exact incremental step:
    the appended token is precisely what the next iteration's buffer
    rescan would newly pick up."""
    v = seen.shape[-1]
    return seen | (jnp.arange(v, dtype=new_tokens.dtype)[None, :]
                   == new_tokens[:, None])


def repetition_penalty_from_seen(logits, seen, penalty: float):
    """`repetition_penalty` with the seen set precomputed ([B, V] bool)."""
    if penalty == 1.0:
        return logits
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, penalized, logits)


def no_repeat_ngram(logits, tokens, cur_len, n: int):
    """Ban tokens completing an n-gram already present in the buffer
    (HF NoRepeatNGramLogitsProcessor).

    For every position t with window tokens[t:t+n-1] equal to the trailing
    (n-1)-gram, ban tokens[t+n-1]. Fixed shapes: compares all windows and
    masks those extending past cur_len.
    """
    if n <= 0:
        return logits
    b, l = tokens.shape
    if l < n:
        return logits
    v = logits.shape[-1]
    # trailing (n-1)-gram: tokens[cur_len-(n-1) : cur_len]
    def tail_at(off):
        return jnp.take_along_axis(
            tokens, (cur_len - (n - 1) + off)[None, None].astype(jnp.int32), axis=1
        )[:, 0]

    offs = jnp.arange(n - 1)
    tail = jnp.stack([tail_at(o) for o in range(n - 1)], axis=1) if n > 1 else None

    # windows: for start t in [0, l-n]: tokens[t:t+n-1] and next tokens[t+n-1]
    num_w = l - n + 1
    idx = jnp.arange(num_w)[:, None] + jnp.arange(n - 1)[None, :]  # [W, n-1]
    windows = tokens[:, idx]  # [B, W, n-1]
    nexts = tokens[:, jnp.arange(num_w) + (n - 1)]  # [B, W]
    if n > 1:
        match = jnp.all(windows == tail[:, None, :], axis=-1)  # [B, W]
    else:
        match = jnp.ones((b, num_w), bool)
    # window fully inside generated region: t + n - 1 <= cur_len - 1
    in_range = (jnp.arange(num_w)[None, :] + (n - 1)) <= (cur_len - 1)
    # HF also requires the ngram to start anywhere in [0, cur_len-n]
    match = match & in_range
    # dense one-hot compare + reduce over windows: XLA fuses this into a
    # streaming reduction (like `repetition_penalty`'s `seen`), while the
    # equivalent `.at[nexts].max(match)` scatter serializes on TPU (the
    # inner while loop in the round-3 beam device trace)
    onehot = nexts[:, :, None] == jnp.arange(v, dtype=tokens.dtype)[None, None]
    ban = jnp.any(onehot & match[:, :, None], axis=1)  # [B, V]
    # only active once we have a full (n-1) tail
    active = cur_len >= (n - 1)
    ban = ban & active
    return jnp.where(ban, NEG_INF, logits)


class SequenceBiasSpec(NamedTuple):
    """Padded sequence-bias table (HF SequenceBiasLogitsProcessor /
    reference `utils/generation_helper.py`).

    seqs: [S, Lmax] int32, left-padded with -1
    lengths: [S] int32
    biases: [S] float32 — added to the last token's logit when the preceding
    part of the sequence matches the trailing generated tokens.
    """

    seqs: jnp.ndarray
    lengths: jnp.ndarray
    biases: jnp.ndarray

    @staticmethod
    def build(bias_map):
        """bias_map: {tuple(token_ids): bias}."""
        if not bias_map:
            return None
        lmax = max(len(k) for k in bias_map)
        seqs, lens, biases = [], [], []
        for k, v in bias_map.items():
            seqs.append([-1] * (lmax - len(k)) + list(k))
            lens.append(len(k))
            biases.append(float(v))
        return SequenceBiasSpec(
            jnp.asarray(seqs, jnp.int32),
            jnp.asarray(lens, jnp.int32),
            jnp.asarray(biases, jnp.float32),
        )


def sequence_bias(logits, tokens, cur_len, spec: Optional[SequenceBiasSpec]):
    if spec is None:
        return logits
    b, v = logits.shape
    l = tokens.shape[-1]
    s, lmax = spec.seqs.shape

    # trailing window of length lmax-1 before the next position
    def gather_tail(off):
        pos = jnp.clip(cur_len - off, 0, l - 1)
        val = jnp.take_along_axis(tokens, pos[None, None].astype(jnp.int32), axis=1)[:, 0]
        return jnp.where(cur_len - off >= 0, val, -2)

    # tail[j] = token at distance j+1 back from the next position
    tail = jnp.stack([gather_tail(j + 1) for j in range(max(lmax - 1, 1))], axis=1)

    def one_seq(seq, length, bias):
        last = seq[-1]
        plen = length - 1
        # prefix tokens (those before last), right-aligned in seq[:-1]
        prefix = seq[:-1][::-1]  # reversed: distance 1 back first
        if lmax == 1:
            matched = jnp.ones((b,), bool)
        else:
            dist_idx = jnp.arange(lmax - 1)
            need = dist_idx < plen
            cmp = tail[:, : lmax - 1] == prefix[None, :]
            matched = jnp.all(cmp | ~need[None, :], axis=1)
        matched = matched & (cur_len >= plen)
        delta = jnp.zeros((b, v), logits.dtype).at[:, last].add(
            jnp.where(matched, bias, 0.0)
        )
        return delta

    deltas = jax.vmap(one_seq)(spec.seqs, spec.lengths, spec.biases)  # [S, B, V]
    return logits + jnp.sum(deltas, axis=0)


def apply_min_new_tokens(logits, cur_len, begin_index, min_new_tokens, eos_id):
    if not min_new_tokens:
        return logits
    hit = (jnp.arange(logits.shape[-1]) == eos_id) \
        & (cur_len < begin_index + min_new_tokens)
    return jnp.where(hit, NEG_INF, logits)


def temperature_warp(logits, temperature: float):
    """HF TemperatureLogitsWarper: scores / temperature."""
    if temperature == 1.0:
        return logits
    return logits / jnp.float32(temperature)


def top_k_warp(logits, k: int, min_tokens_to_keep: int = 1):
    """HF TopKLogitsWarper: keep the k highest-scoring tokens, set the rest
    to the filter value. k <= 0 disables. ``min_tokens_to_keep`` floors k
    (HF: ``top_k = max(top_k, min_tokens_to_keep)`` — beam-sample passes
    n_eos_tokens + 1 so a non-eos continuation always survives)."""
    if k <= 0:
        return logits
    k = max(k, min_tokens_to_keep)
    if k >= logits.shape[-1]:
        return logits
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def top_p_warp(logits, p: float, min_tokens_to_keep: int = 1):
    """HF TopPLogitsWarper semantics: sort ascending, drop tokens whose
    ascending cumulative softmax mass is <= 1-p (i.e. keep the smallest
    head set with mass > p), always keeping the ``min_tokens_to_keep``
    largest."""
    if p >= 1.0:
        return logits
    v = logits.shape[-1]
    sorted_logits = jnp.sort(logits, axis=-1)  # ascending
    cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
    remove_sorted = cum <= (1.0 - p)
    keep_idx = jnp.arange(v) >= (v - min_tokens_to_keep)
    remove_sorted = remove_sorted & ~keep_idx[None, :]
    # threshold = largest sorted logit that is removed; everything at or
    # below it (by value) is removed. Ties share a fate, matching the sort
    # scatter only when values are distinct — HF resolves ties by sort
    # order, which is not meaningful for float logits.
    thresh = jnp.max(
        jnp.where(remove_sorted, sorted_logits, -jnp.inf), axis=-1, keepdims=True
    )
    return jnp.where(logits <= thresh, NEG_INF, logits)
