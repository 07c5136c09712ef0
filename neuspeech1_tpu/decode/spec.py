"""Self-speculative (multi-token draft-and-verify) greedy decode.

Greedy serving sits at the per-token HBM floor: each step re-streams the
int8 cross K/V cache (~the whole decode budget at whisper-base bs64,
BASELINE.md round 3). A gamma-token verify step reads that stream ONCE
for gamma positions, so accepted draft tokens are nearly free
(perf/spec_probe.py measures the cost ratio). Drafts come from an
n-gram (prompt-lookup) drafter over the row's own decoded prefix —
no second model, no training change (self-speculative; cf. the
prompt-lookup / "assisted generation by n-gram" family).

Output exactness: a draft token is accepted only when it equals the
model's own greedy argmax given the identical accepted history, so the
emitted sequence is token-for-token the plain `greedy_decode` output
(modulo f32 reduction-order ulps on exact logit ties — the same class
of caveat as the bucketed decode, and equally unobserved in tests).

Mechanics under fixed shapes (jit): per-row acceptance counts differ, so
accepted tokens live at NON-CONTIGUOUS physical cache positions — every
iteration writes its gamma fed tokens at a batch-uniform physical offset
and a per-row validity mask marks which of those hold true-sequence
tokens; rejected drafts leave permanent holes that the attention mask
never reads again. Logical positions (for the learned pos-embed and the
output buffer) stay dense per row. The physical self-cache is sized
prompt + gamma * max_new (worst case: one accepted token per
iteration) — self-cache HBM is small next to the cross stream, so the
oversize costs little.

Reference axis: the reference has no speculative decode (pure HF
`generate`, `/root/reference/evaluation.py:369-386`); this is a
beyond-reference serving optimization (VERDICT round-3 item 8).

Supported generation options: plain greedy (suppress lists included —
position-independent), no repetition penalty / ngram ban / bias /
timestamps / min_new_tokens (those are per-position-stateful across the
gamma block; `spec_greedy_decode` raises on them). Buckets are ignored
(single physical buffer).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from neuspeech1_tpu.config import StemConfig, WhisperConfig
from neuspeech1_tpu.decode import logits_process as lp
from neuspeech1_tpu.decode.generate import GenerationConfig, _process_logits
from neuspeech1_tpu.models import whisper as jw

Params = dict


def _check_supported(gen: GenerationConfig):
    bad = []
    if gen.repetition_penalty != 1.0:
        bad.append("repetition_penalty")
    if gen.no_repeat_ngram_size:
        bad.append("no_repeat_ngram_size")
    if gen.min_new_tokens:
        bad.append("min_new_tokens")
    if gen.timestamps:
        bad.append("timestamps")
    if gen.do_sample:
        bad.append("do_sample")
    if gen.num_beams != 1:
        bad.append("num_beams")
    if bad:
        raise NotImplementedError(
            "spec_greedy_decode supports plain greedy (+suppress lists); "
            f"unsupported options set: {bad}")


def build_draft_table(texts, tokenizer, vocab_size: int):
    """Host-side corpus n-gram drafter table (the reference's serving
    scenario decodes text whose words come from the TRAIN distribution —
    the same train-jsonl text the sequence-bias builder already mines,
    `/root/reference/utils/generation_helper.py:18-73`).

    Returns {"keys": sorted uint32 [K] of prev2*V+prev1 pair codes,
             "vals": int32 [K] most-frequent follower per pair,
             "uni":  int32 [V] most-frequent follower per single token
                     (-1 = unseen)} — all jit-traversable arrays; lookup
    is a searchsorted + gather (decode/spec.py::_table_draft).

    Codes are uint32, NOT int64: with jax_enable_x64 off (the default
    everywhere in this repo) int64 arrays silently truncate to int32 at
    `jnp.asarray`, and at the real whisper vocab (V=51865, V^2 ~= 2.7e9
    > INT32_MAX) the truncated keys are no longer sorted — searchsorted
    then returns garbage and the drafter quietly accepts ~nothing.
    uint32 holds V^2-1 for any V <= 65535."""
    import collections

    import numpy as np

    if vocab_size > 0xFFFF:
        raise ValueError(
            f"vocab_size {vocab_size} overflows the uint32 pair-code "
            "space (max 65535)")
    pair = collections.Counter()
    uni = collections.Counter()
    for text in texts:
        ids = tokenizer.encode(text)
        for a, b in zip(ids, ids[1:]):
            uni[(a, b)] += 1
        for a, b, c in zip(ids, ids[1:], ids[2:]):
            pair[(a, b, c)] += 1
    best_pair = {}
    for (a, b, c), n in pair.items():
        k = a * vocab_size + b
        if k not in best_pair or n > best_pair[k][1]:
            best_pair[k] = (c, n)
    if not best_pair:
        # sentinel no-match entry: keeps the jitted searchsorted/gather
        # lookup well-formed when the corpus has no trigrams (real codes
        # are <= V^2-1 < NO_PAIR_CODE, and queries never produce it —
        # see _table_draft)
        best_pair[0xFFFFFFFF] = (0, 0)
    keys = np.sort(np.asarray(list(best_pair.keys()), np.uint32))
    vals = np.asarray([best_pair[int(k)][0] for k in keys], np.int32)
    best_uni = np.full((vocab_size,), -1, np.int32)
    score = {}
    for (a, b), n in uni.items():
        if a not in score or n > score[a][1]:
            score[a] = (b, n)
    for a, (b, _) in score.items():
        best_uni[a] = b
    return {"keys": keys, "vals": vals, "uni": best_uni}


def _table_draft(out, out_len, t_last, gamma: int, table):
    """Corpus-table drafter: order-2 lookup (searchsorted over the sorted
    uint32 pair codes — int64 would silently truncate under the default
    x64-off config, see build_draft_table), order-1 dense fallback, then
    repeat. [B] -> [B, gamma-1]."""
    L = out.shape[1]
    V = table["uni"].shape[0]
    keys, vals, uni = table["keys"], table["vals"], table["uni"]
    # distinct from the empty-table sentinel key 0xFFFFFFFF and above any
    # real code (<= V^2-1 with V <= 65535): a query with no pair context
    # (prev2 < 0) must match NOTHING, including the sentinel row
    no_pair = jnp.uint32(0xFFFFFFFE)

    def follower(prev2, prev1):
        code = jnp.where(
            prev2 < 0, no_pair,
            prev2.astype(jnp.uint32) * jnp.uint32(V)
            + prev1.astype(jnp.uint32))
        i = jnp.clip(jnp.searchsorted(keys, code), 0, keys.shape[0] - 1)
        hit2 = keys[i] == code
        d2 = vals[i]
        d1 = uni[jnp.clip(prev1, 0, V - 1)]
        d = jnp.where(hit2, d2, jnp.where(d1 >= 0, d1, prev1))
        return d.astype(jnp.int32)

    prev2 = jnp.where(
        out_len >= 2,
        jnp.take_along_axis(
            out, jnp.clip(out_len - 2, 0, L - 1)[:, None], axis=1)[:, 0],
        -1).astype(jnp.int32)
    drafts = []
    prev1 = t_last
    for _ in range(gamma - 1):
        nxt = follower(prev2, prev1)
        drafts.append(nxt)
        prev2, prev1 = prev1, nxt
    return jnp.stack(drafts, axis=1)


def _ngram_draft(out, out_len, t_last, gamma: int):
    """Prompt-lookup drafter, longest-suffix order-2 with order-1
    fallback: the next draft is the token that followed the most recent
    prior occurrence of the current (prev2, prev1) suffix PAIR in the
    row's own decoded prefix; if the pair never occurred, fall back to
    the most recent follower of prev1 alone; else repeat prev1. Order-2
    matters on byte-level text — order-1 (one-token context) measured
    ~zero acceptance on the trained flagship checkpoint.
    [B, L] x [B] -> [B, gamma-1] int32."""
    B, L = out.shape
    idxs = jnp.arange(L)[None]
    # out_m1[b, j] = out[b, j-1] (j>=1)
    out_m1 = jnp.pad(out[:, :-1], ((0, 0), (1, 0)), constant_values=-1)

    def follower(prev2, prev1):
        # candidate j: out[j-1]==prev2 and out[j]==prev1, follower at j+1
        # must be a real token (j+1 <= out_len-2 is not required — j+1 ==
        # out_len-1 means the follower is the current last token: valid
        # history). Search j in [1, out_len-2].
        lim = (out_len - 1)[:, None]
        hit2 = (idxs >= 1) & (idxs < lim) & (out == prev1[:, None]) \
            & (out_m1 == prev2[:, None])
        j2 = jnp.max(jnp.where(hit2, idxs, -1), axis=1)
        hit1 = (idxs < lim) & (out == prev1[:, None])
        j1 = jnp.max(jnp.where(hit1, idxs, -1), axis=1)
        j = jnp.where(j2 >= 0, j2, j1)
        nxt = jnp.take_along_axis(
            out, jnp.clip(j + 1, 0, L - 1)[:, None], axis=1)[:, 0]
        return jnp.where(j >= 0, nxt, prev1).astype(jnp.int32)

    # prev2 = token before t_last (pad -1 when t_last is the first token)
    prev2 = jnp.where(
        out_len >= 2,
        jnp.take_along_axis(
            out, jnp.clip(out_len - 2, 0, L - 1)[:, None], axis=1)[:, 0],
        -1).astype(jnp.int32)
    drafts = []
    prev1 = t_last
    for _ in range(gamma - 1):
        nxt = follower(prev2, prev1)
        drafts.append(nxt)
        prev2, prev1 = prev1, nxt
    return jnp.stack(drafts, axis=1)


@partial(jax.jit, static_argnames=("config", "stem", "gen", "gamma"))
def spec_greedy_decode(
    params: Params,
    features,
    prompt_ids,
    config: WhisperConfig,
    stem: StemConfig,
    gen: GenerationConfig,
    gamma: int = 2,
    lora: Optional[Params] = None,
    draft_table=None,
):
    """Greedy decode with gamma-token draft-verify steps.

    Returns tokens [B, max_length] (prompt + generated, pad-filled) —
    the same contract (and, by acceptance construction, the same tokens)
    as `greedy_decode`.

    ``draft_table``: optional `build_draft_table` output — drafts then
    come from the train-corpus n-gram tables instead of the row's own
    decoded prefix (much higher acceptance on short utterances, where
    the self-prefix carries too little history).
    """
    _check_supported(gen)
    if gamma < 2:
        raise ValueError("gamma must be >= 2 (1 is plain greedy_decode)")

    enc = jw.encoder_apply(params, features, config, stem, lora=lora)
    B = features.shape[0]
    P = prompt_ids.shape[1]
    L = gen.max_length
    max_iters = L - P  # every iteration accepts >= 1 token per live row
    L_phys = P + gamma * max_iters
    n_pos = params["decoder"]["pos_embed"].shape[0]

    # T-major self cache: the gamma-position DUS at a dynamic T offset
    # must write contiguous slabs (see _self_decode_tm) — with T on the
    # lane axis it cost 4.3 ms/iteration at gamma=4
    cache = jw.init_cache(params, enc, config, max_len=L_phys,
                          int8_cross=gen.int8_kv_cache, self_t_major=True)

    out = jnp.full((B, L), gen.pad_id, jnp.int32)
    out = lax.dynamic_update_slice(out, prompt_ids.astype(jnp.int32), (0, 0))

    # prefill: physical == logical for the prompt
    logits, cache = jw.decoder_apply(
        params, out[:, :P], enc, config, lora=lora, cache=cache,
        cache_index=0)
    scores = _process_logits(logits[:, -1], out, jnp.asarray(P, jnp.int32),
                             gen, None, P)
    g0 = jnp.argmax(scores, axis=-1).astype(jnp.int32)
    out = out.at[:, P].set(g0)
    out_len = jnp.full((B,), P + 1, jnp.int32)
    finished = (g0 == gen.eos_id) | (out_len >= L)

    valid = jnp.zeros((B, L_phys), bool).at[:, :P].set(True)
    arange_g = jnp.arange(gamma)
    arange_phys = jnp.arange(L_phys)
    arange_L = jnp.arange(L)

    def cond(st):
        out, cache, valid, out_len, finished, phys, it = st
        return ~jnp.all(finished) & (it < max_iters)

    def body(st):
        out, cache, valid, out_len, finished, phys, it = st
        t_last = jnp.take_along_axis(
            out, (out_len - 1)[:, None], axis=1)[:, 0]
        if draft_table is not None:
            drafts = _table_draft(out, out_len, t_last, gamma, draft_table)
        else:
            drafts = _ngram_draft(out, out_len, t_last, gamma)
        toks = jnp.concatenate([t_last[:, None], drafts], axis=1)  # [B, g]

        pos_ids = jnp.clip((out_len - 1)[:, None] + arange_g[None],
                           0, n_pos - 1)
        # prior accepted positions + in-block causal (query i sees fed
        # tokens 0..i of this block)
        off = arange_phys[None, None, None, :] - phys  # in-block offset
        inblock = (off >= 0) & (off <= arange_g[None, None, :, None])
        mask = valid[:, None, None, :] | inblock  # [B, 1, g, L_phys]

        logits, cache = jw.decoder_apply(
            params, toks, enc, config, lora=lora, cache=cache,
            cache_index=phys, pos_ids=pos_ids, self_attn_mask=mask)
        # (argmax on native bf16 logits — a monotonic-cast shortcut — was
        # measured NEUTRAL at gamma=2: 445.6 vs 474.5 utt/s run pair,
        # within noise; keep greedy's exact f32 pipeline)
        scores = lp.suppress_tokens(logits.astype(jnp.float32),
                                    gen.suppress_ids)
        g = jnp.argmax(scores, axis=-1).astype(jnp.int32)  # [B, gamma]

        # accepted run: 1 (the true next token) + leading draft matches
        match = (toks[:, 1:] == g[:, :-1])
        m = 1 + jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)
        # clip at the first accepted eos, the output buffer, and finished
        is_eos = g == gen.eos_id
        pe = jnp.min(jnp.where(is_eos, arange_g[None], gamma), axis=1)
        m_eff = jnp.minimum(jnp.minimum(m, pe + 1), L - out_len)
        m_eff = jnp.where(finished, 0, m_eff)

        # append g[:, :m_eff] at out[:, out_len + i] (one-hot scatter)
        tgt = out_len[:, None] + arange_g[None]  # [B, gamma]
        upd = arange_g[None] < m_eff[:, None]  # [B, gamma]
        onehot = (arange_L[None, None, :] == tgt[:, :, None]) & \
            upd[:, :, None]  # [B, gamma, L]
        val = jnp.sum(onehot * g[:, :, None], axis=1).astype(jnp.int32)
        out = jnp.where(jnp.any(onehot, axis=1), val, out)

        # fed position i holds a true-sequence token iff i < m_eff
        fed_valid = (arange_g[None] < m_eff[:, None]) & ~finished[:, None]
        valid = lax.dynamic_update_slice(valid, fed_valid, (0, phys))

        out_len = out_len + m_eff
        finished = finished | jnp.any(is_eos & upd, axis=1) | (out_len >= L)
        return (out, cache, valid, out_len, finished, phys + gamma, it + 1)

    st = (out, cache, valid, out_len, finished,
          jnp.asarray(P, jnp.int32), jnp.asarray(0, jnp.int32))
    out, _, _, _, _, _, n_iters = lax.while_loop(cond, body, st)
    return out, n_iters
