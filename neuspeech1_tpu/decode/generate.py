"""Jitted generation: greedy and beam search with fixed-shape KV caches.

Functional replacement for the HF `GenerationMixin.generate` path the
reference uses (`evaluation.py:369-386`: num_beams=5,
repetition_penalty=5.0, no_repeat_ngram_size=2; non-English decoding feeds
`labels[:, :4]` as the prompt, `evaluation.py:357-359`; the vendored
generate override assembling forced ids is `utils/load_model.py:1072-1330`).

Everything runs inside one `jax.jit` per (batch, prompt-length) shape:
`lax.while_loop` over decode steps, fixed [B(,K), max_length] token buffers,
beam reordering by gather, early exit when all sequences finish.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from neuspeech1_tpu.config import StemConfig, WhisperConfig
from neuspeech1_tpu.models import whisper as jw
from neuspeech1_tpu.decode import logits_process as lp

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class GenerationConfig:
    """Static decode configuration (hashable -> usable as jit static arg)."""

    max_length: int = 448            # total: prompt + generated
    num_beams: int = 1
    length_penalty: float = 1.0
    early_stopping: bool = False
    repetition_penalty: float = 1.0
    no_repeat_ngram_size: int = 0
    suppress_ids: Tuple[int, ...] = ()
    begin_suppress_ids: Tuple[int, ...] = ()
    min_new_tokens: int = 0
    eos_id: int = 50257
    pad_id: int = 50257
    # store the decode cross K/V cache int8 (halves decode's dominant
    # HBM stream; ~0.5% score quantization error) — serving opt-in
    int8_kv_cache: bool = False
    # multinomial sampling (reference `utils/process_str.py:57-63`
    # strategies: do_sample with optional top_k / top_p warpers; HF order
    # processors -> temperature -> top_k -> top_p -> categorical draw).
    # With num_beams > 1 this selects HF BEAM-SAMPLE (the reference runs
    # its sampling strategies at num_beams=20): warped per-row scores,
    # 2K candidates drawn without replacement per step (see beam_search)
    do_sample: bool = False
    temperature: float = 1.0
    top_k: int = 0
    top_p: float = 1.0
    # contrastive search (reference `utils/process_str.py:64-65`:
    # penalty_alpha=1, top_k=5). Active — HF mode-selection semantics —
    # when penalty_alpha > 0 and top_k > 1 and not do_sample.
    penalty_alpha: float = 0.0
    # beam search exact top-C prefilter: every live processor
    # (suppress/begin-suppress/min-new/rp>=1/ngram) only LOWERS scores, so
    # the post-processor top-2K is a subset of the raw-logprob top-C for
    # C >= 2K + (#tokens any processor can touch); processors then run on
    # [B*K, C] instead of [B*K, V]. Measured REJECT on v5e at whisper-base
    # bs32 (beam 215 -> 315 ms/batch): the wide-k lax.top_k prefilter costs
    # far more than the full-vocab processor passes it removes. 'on'
    # enables where exactness holds (no bias spec, no timestamps, rp >= 1);
    # default 'off'.
    beam_prefilter: str = "off"
    # length-bucketed decode (greedy/sampling/beam; contrastive search
    # runs single-bucket — its [B, max_length, d] context-hidden buffer
    # would have to grow at segment boundaries and its typical budgets are
    # short): ascending buffer
    # lengths (each capped at max_length, the always-present final bucket).
    # Every
    # per-step tensor op in the fixed-shape decode loop scales with the
    # BUFFER length, not the current position (measured 1.73 ms/token at
    # Tmax~52 vs 2.34 at Tmax~300, whisper-base bs64) — bucketing runs
    # early tokens against small buffers and chains the per-bucket loops
    # inside ONE jit (a segment entered with all rows finished exits after
    # 0 iterations), so typical short utterances decoded under a large
    # max_length never pay the big-buffer rate. () = single bucket.
    decode_buckets: Tuple[int, ...] = ()
    # self-speculative multi-token greedy decode (decode/spec.py):
    # gamma-token draft-verify steps amortize the per-token cross-cache
    # HBM read (verify cost ratio 1.01 at gamma=2 — perf/spec_probe.py);
    # token-exact vs greedy_decode. 0/1 = off. Plain greedy only
    # (suppress lists ok; spec raises on stateful processors).
    spec_gamma: int = 0
    # timestamp decoding (whisper grammar; decode/timestamps.py)
    timestamps: bool = False
    timestamp_begin: int = 50364
    notimestamps_id: int = 50363
    eot_id: int = 50257
    max_initial_timestamp_index: int = 50

    @staticmethod
    def for_model(config: WhisperConfig, tokenizer=None,
                  **kw) -> "GenerationConfig":
        """``tokenizer``: when given, suppress/begin-suppress defaults are
        DERIVED from its vocab (`Tokenizer.default_suppress_ids`, the HF
        generation_config content with no downloaded file — reference
        `utils/load_model.py:1210-1294` inherits the same lists from HF);
        explicit kwargs still win. Without a tokenizer both lists default
        empty — callers opt in."""
        kw.setdefault("eos_id", config.eot_id)
        kw.setdefault("pad_id", config.eot_id)
        kw.setdefault("eot_id", config.eot_id)
        kw.setdefault("max_length", config.max_target_positions)
        kw.setdefault("timestamp_begin", config.timestamp_begin)
        kw.setdefault("notimestamps_id", config.notimestamps_id)
        if tokenizer is not None:
            kw.setdefault("suppress_ids",
                          tuple(tokenizer.default_suppress_ids()))
            kw.setdefault("begin_suppress_ids",
                          tuple(tokenizer.default_begin_suppress_ids()))
        return GenerationConfig(**kw)


def load_hf_generation_defaults(path: str) -> dict:
    """Read suppress/begin-suppress token lists from a local HF
    generation_config.json (real whisper checkpoints ship a fixed list of
    non-speech ids there; zero-egress images cannot hardcode it reliably)."""
    import json

    with open(path) as f:
        cfg = json.load(f)
    out = {}
    if cfg.get("suppress_tokens"):
        out["suppress_ids"] = tuple(cfg["suppress_tokens"])
    if cfg.get("begin_suppress_tokens"):
        out["begin_suppress_ids"] = tuple(cfg["begin_suppress_tokens"])
    return out


def build_prompt(tokenizer, language="english", task="transcribe",
                 timestamps=False):
    """Decoder prompt = <|sot|><|lang|><|task|>[<|nots|>] as a [1, P] array;
    the per-sample non-English path passes labels[:, :4] instead."""
    import numpy as np

    return np.asarray([tokenizer.prefix_tokens(language, task, timestamps)],
                      dtype=np.int32)


def _process_logits_subset(vals, ids, tokens, cur_len,
                           gen: GenerationConfig, prompt_len: int,
                           seen=None):
    """Processor chain evaluated ONLY at candidate tokens ``ids`` [R, C]
    with scores ``vals`` [R, C] (same semantics as `_process_logits` on the
    full vocab, restricted to processors that can only lower scores —
    `beam_prefilter` gates usage to exactly that case). ``seen`` is the
    loop-maintained [R, V] seen-token set (see `lp.update_seen`); when
    given, the repetition penalty is a C-wide gather instead of an
    O(C*L) buffer compare."""
    vals = vals.astype(jnp.float32)
    NEG = jnp.float32(-1e9)
    if gen.suppress_ids:
        sup = jnp.asarray(gen.suppress_ids, jnp.int32)
        vals = jnp.where(
            jnp.any(ids[:, :, None] == sup[None, None, :], axis=-1), NEG, vals
        )
    if gen.begin_suppress_ids:
        beg = jnp.asarray(gen.begin_suppress_ids, jnp.int32)
        hit = jnp.any(ids[:, :, None] == beg[None, None, :], axis=-1)
        vals = jnp.where(hit & (cur_len == prompt_len), NEG, vals)
    if gen.min_new_tokens:
        vals = jnp.where(
            (ids == gen.eos_id)
            & (cur_len < prompt_len + gen.min_new_tokens), NEG, vals)
    l = tokens.shape[-1]
    if gen.repetition_penalty != 1.0:
        p = jnp.float32(gen.repetition_penalty)
        if seen is not None:
            seen_c = jnp.take_along_axis(seen, ids, axis=1)  # [R, C]
        else:
            valid = (jnp.arange(l)[None, None, :] < cur_len)
            seen_c = jnp.any(
                (tokens[:, None, :] == ids[:, :, None]) & valid, axis=-1)
        pen = jnp.where(vals > 0, vals / p, vals * p)
        vals = jnp.where(seen_c, pen, vals)
    n = gen.no_repeat_ngram_size
    if n > 0 and l >= n:
        num_w = l - n + 1
        if n > 1:
            tails = [
                jnp.take_along_axis(
                    tokens,
                    (cur_len - (n - 1) + o)[None, None].astype(jnp.int32),
                    axis=1)[:, 0]
                for o in range(n - 1)
            ]
            tail = jnp.stack(tails, axis=1)  # [R, n-1]
            widx = jnp.arange(num_w)[:, None] + jnp.arange(n - 1)[None, :]
            windows = tokens[:, widx]
            match = jnp.all(windows == tail[:, None, :], axis=-1)  # [R, W]
        else:
            match = jnp.ones((tokens.shape[0], num_w), bool)
        nexts = tokens[:, jnp.arange(num_w) + (n - 1)]  # [R, W]
        in_range = (jnp.arange(num_w)[None, :] + (n - 1)) <= (cur_len - 1)
        match = match & in_range & (cur_len >= (n - 1))
        banned = jnp.any(
            (nexts[:, None, :] == ids[:, :, None]) & match[:, None, :],
            axis=-1)
        vals = jnp.where(banned, NEG, vals)
    return vals


def _beam_prefilter_count(gen: GenerationConfig, vocab: int,
                          buf_len: int) -> int:
    """Static candidate count C: 2K survivors + every token a (lowering)
    processor could demote, rounded up to a lane multiple."""
    n = gen.no_repeat_ngram_size
    c = (2 * gen.num_beams
         + len(gen.suppress_ids) + len(gen.begin_suppress_ids)
         + (1 if gen.min_new_tokens else 0)
         + (buf_len if gen.repetition_penalty != 1.0 else 0)
         + (max(buf_len - n + 1, 0) if n > 0 else 0))
    return min(vocab, -(-c // 128) * 128)


def _process_logits(logits, tokens, cur_len, gen: GenerationConfig,
                    bias_spec, prompt_len: int, seen=None):
    """``seen`` is the loop-maintained seen-token set [B, V] (exactly the
    tokens the dense buffer rescan would find — see `lp.update_seen`);
    when given, the repetition penalty skips the O(L*V) rescan."""
    logits = logits.astype(jnp.float32)
    logits = lp.suppress_tokens(logits, gen.suppress_ids)
    logits = lp.suppress_tokens_at_begin(
        logits, cur_len, prompt_len, gen.begin_suppress_ids
    )
    logits = lp.apply_min_new_tokens(
        logits, cur_len, prompt_len, gen.min_new_tokens, gen.eos_id
    )
    if seen is not None:
        logits = lp.repetition_penalty_from_seen(
            logits, seen, gen.repetition_penalty)
    else:
        logits = lp.repetition_penalty(
            logits, tokens, cur_len, gen.repetition_penalty)
    logits = lp.no_repeat_ngram(logits, tokens, cur_len, gen.no_repeat_ngram_size)
    logits = lp.sequence_bias(logits, tokens, cur_len, bias_spec)
    if gen.timestamps:
        from neuspeech1_tpu.decode.timestamps import timestamp_rules

        logits = timestamp_rules(
            logits, tokens, cur_len, gen, prompt_len,
            gen.max_initial_timestamp_index,
        )
    return logits


# ======================================================================
# greedy
# ======================================================================

@partial(jax.jit, static_argnames=("config", "stem", "gen"))
def greedy_decode(
    params: Params,
    features,
    prompt_ids,
    config: WhisperConfig,
    stem: StemConfig,
    gen: GenerationConfig,
    lora: Optional[Params] = None,
    bias_spec=None,
):
    """Returns tokens [B, max_length] (prompt + generated, pad-filled)."""
    enc = jw.encoder_apply(params, features, config, stem, lora=lora)
    b = features.shape[0]
    p = prompt_ids.shape[1]
    L = gen.max_length
    buckets = _resolve_buckets(gen, p)
    cache = jw.init_cache(params, enc, config, max_len=buckets[0],
                          int8_cross=gen.int8_kv_cache)

    tokens = jnp.full((b, buckets[0]), gen.pad_id, jnp.int32)
    tokens = lax.dynamic_update_slice(tokens, prompt_ids.astype(jnp.int32), (0, 0))

    logits, cache = jw.decoder_apply(
        params, tokens[:, :p], enc, config, lora=lora, cache=cache, cache_index=0
    )
    last = logits[:, -1]

    # NEUSPEECH_DECODE_FIXED_TRIPS=1: drop the all-finished early exit so
    # the loop condition is pure scalar work (no per-iteration [B] vector
    # reduce feeding the sequencer) — an A/B for the launch-gap overhead
    # that dominates tiny-M decode steps; outputs are identical because
    # finished rows keep emitting pad.
    import os as _os

    fixed_trips = _os.environ.get("NEUSPEECH_DECODE_FIXED_TRIPS") == "1"

    # seen-token set maintained incrementally (exact: each appended token is
    # precisely what the dense rescan would newly pick up next iteration)
    use_seen = gen.repetition_penalty != 1.0
    V = last.shape[-1]
    seen0 = (lp.seen_from_tokens(tokens[:, :p], jnp.asarray(p), V)
             if use_seen else jnp.zeros((b, 1), bool))

    def segment(st, Lb: int):
        """One while_loop over a [*, Lb]-shaped state (decode-bucket
        segment): identical math to the single-bucket loop, halted at
        cur_len == Lb. Every per-step tensor op scales with the BUFFER
        length (fixed shapes), so early tokens run against small buffers;
        a segment entered with everything finished exits after 0
        iterations — the segments chain inside one jit with no host
        syncs."""

        def cond(st):
            tokens, cache, last, cur_len, finished, seen = st
            if fixed_trips:
                return cur_len < Lb
            return (cur_len < Lb) & ~jnp.all(finished)

        def body(st):
            tokens, cache, last, cur_len, finished, seen = st
            scores = _process_logits(last, tokens, cur_len, gen, bias_spec,
                                     p, seen=seen if use_seen else None)
            nxt = jnp.argmax(scores, axis=-1).astype(jnp.int32)
            nxt = jnp.where(finished, gen.pad_id, nxt)
            tokens = jax.vmap(
                lambda row, t, i: lax.dynamic_update_slice(row, t[None], (i,))
            )(tokens, nxt, jnp.full((b,), cur_len))
            finished = finished | (nxt == gen.eos_id)
            if use_seen:
                seen = lp.update_seen(seen, nxt)
            logits, cache2 = jw.decoder_apply(
                params, nxt[:, None], enc, config, lora=lora,
                cache=cache, cache_index=cur_len,
            )
            return (tokens, cache2, logits[:, -1], cur_len + 1, finished,
                    seen)

        return lax.while_loop(cond, body, st)

    st = (tokens, cache, last, jnp.asarray(p, jnp.int32),
          jnp.zeros((b,), bool), seen0)
    st = segment(st, buckets[0])
    for lb_prev, lb in zip(buckets, buckets[1:]):
        st = _pad_decode_state(st, lb - lb_prev, gen.pad_id)
        st = segment(st, lb)
    tokens, *_ = st
    return tokens


def _resolve_buckets(gen: GenerationConfig, prompt_len: int):
    """Ascending buffer lengths ending at max_length; each must exceed the
    prompt. () = single bucket (the plain fixed-shape loop)."""
    L = gen.max_length
    bs = [min(x, L) for x in gen.decode_buckets if x > prompt_len]
    bs = sorted(set(bs))
    if not bs or bs[-1] != L:
        bs.append(L)
    return tuple(bs)


def _pad_beam_state(st, extra: int, pad_id: int):
    """Beam-search analog of `_pad_decode_state`: grows tokens and fin_seq
    [B, K, L] plus the per-layer self K/V caches; scores/flags/seen and the
    cross caches are length-invariant."""
    (tokens, cache, last, cur_len, alive_logp,
     fin_seq, fin_scores, fin_exists, seen, improve_unsat, valid_cont) = st
    tokens = jnp.pad(tokens, ((0, 0), (0, 0), (0, extra)),
                     constant_values=pad_id)
    fin_seq = jnp.pad(fin_seq, ((0, 0), (0, 0), (0, extra)),
                      constant_values=pad_id)
    grown = tuple(
        {k: jnp.pad(v, ((0, 0),) * (v.ndim - 1) + ((0, extra),))
         for k, v in layer.items()}
        for layer in cache["self"]
    )
    cache = dict(cache)
    cache["self"] = grown
    return (tokens, cache, last, cur_len, alive_logp,
            fin_seq, fin_scores, fin_exists, seen, improve_unsat, valid_cont)


def _pad_decode_state(st, extra: int, pad_id: int):
    """Grow the bucketed decode state's length-carrying buffers by
    ``extra``: the token buffer (pad-filled) and the per-layer self K/V
    [B, H, Dh, Tmax] caches (zero columns). Cross caches, logits, lengths
    and the seen set are length-invariant."""
    tokens, cache, last, cur_len, finished, seen = st
    tokens = jnp.pad(tokens, ((0, 0), (0, extra)),
                     constant_values=pad_id)
    grown = tuple(
        {k: jnp.pad(v, ((0, 0),) * (v.ndim - 1) + ((0, extra),))
         for k, v in layer.items()}
        for layer in cache["self"]
    )
    cache = dict(cache)
    cache["self"] = grown
    return (tokens, cache, last, cur_len, finished, seen)


@partial(jax.jit, static_argnames=("config", "stem", "gen"))
def sample_decode(
    params: Params,
    features,
    prompt_ids,
    rng,
    config: WhisperConfig,
    stem: StemConfig,
    gen: GenerationConfig,
    lora: Optional[Params] = None,
    bias_spec=None,
):
    """Multinomial sampling (HF ``do_sample=True`` with single-beam
    semantics): processors, then temperature / top-k / top-p warpers, then
    one categorical draw per step. Covers the reference's
    multinomial/topk/topp strategies (`utils/process_str.py:57-63`; dead in
    its live eval path, which only calls beam search).

    Returns tokens [B, max_length]. ``rng`` is a jax PRNG key; per-step
    keys are folded in from the write position, so a fixed key gives a
    deterministic trace-stable draw sequence.
    """
    enc = jw.encoder_apply(params, features, config, stem, lora=lora)
    b = features.shape[0]
    p = prompt_ids.shape[1]
    buckets = _resolve_buckets(gen, p)
    cache = jw.init_cache(params, enc, config, max_len=buckets[0],
                          int8_cross=gen.int8_kv_cache)

    tokens = jnp.full((b, buckets[0]), gen.pad_id, jnp.int32)
    tokens = lax.dynamic_update_slice(tokens, prompt_ids.astype(jnp.int32), (0, 0))

    logits, cache = jw.decoder_apply(
        params, tokens[:, :p], enc, config, lora=lora, cache=cache, cache_index=0
    )
    last = logits[:, -1]

    use_seen = gen.repetition_penalty != 1.0
    V = last.shape[-1]
    seen0 = (lp.seen_from_tokens(tokens[:, :p], jnp.asarray(p), V)
             if use_seen else jnp.zeros((b, 1), bool))

    def segment(st, Lb: int):
        def cond(st):
            tokens, cache, last, cur_len, finished, seen = st
            return (cur_len < Lb) & ~jnp.all(finished)

        def body(st):
            tokens, cache, last, cur_len, finished, seen = st
            scores = _process_logits(last, tokens, cur_len, gen, bias_spec,
                                     p, seen=seen if use_seen else None)
            scores = lp.temperature_warp(scores, gen.temperature)
            scores = lp.top_k_warp(scores, gen.top_k)
            scores = lp.top_p_warp(scores, gen.top_p)
            step_key = jax.random.fold_in(rng, cur_len)
            nxt = jax.random.categorical(
                step_key, scores, axis=-1).astype(jnp.int32)
            nxt = jnp.where(finished, gen.pad_id, nxt)
            tokens = jax.vmap(
                lambda row, t, i: lax.dynamic_update_slice(row, t[None], (i,))
            )(tokens, nxt, jnp.full((b,), cur_len))
            finished = finished | (nxt == gen.eos_id)
            if use_seen:
                seen = lp.update_seen(seen, nxt)
            logits, cache2 = jw.decoder_apply(
                params, nxt[:, None], enc, config, lora=lora,
                cache=cache, cache_index=cur_len,
            )
            return (tokens, cache2, logits[:, -1], cur_len + 1, finished,
                    seen)

        return lax.while_loop(cond, body, st)

    st = (tokens, cache, last, jnp.asarray(p, jnp.int32),
          jnp.zeros((b,), bool), seen0)
    st = segment(st, buckets[0])
    for lb_prev, lb in zip(buckets, buckets[1:]):
        st = _pad_decode_state(st, lb - lb_prev, gen.pad_id)
        st = segment(st, lb)
    tokens, *_ = st
    return tokens


@partial(jax.jit, static_argnames=("config", "stem", "gen"))
def contrastive_search(
    params: Params,
    features,
    prompt_ids,
    config: WhisperConfig,
    stem: StemConfig,
    gen: GenerationConfig,
    lora: Optional[Params] = None,
    bias_spec=None,
):
    """HF-semantics contrastive search (reference `utils/process_str.py:64-65`
    calls ``model.generate(penalty_alpha=1, top_k=5)``).

    Per step (HF ``_contrastive_search`` / ``_ranking_fast``): process the
    selected hypothesis' logits, softmax, take the top-``top_k`` candidate
    tokens, run ONE batched decoder step on all B*k candidates (the cross
    cache stays at B — candidates share their utterance's encoder states,
    same folding beam search uses), score each candidate
    ``(1-alpha)*p - alpha*max_cos(hidden, context_hiddens)`` and keep the
    argmax; the winner's self-cache row is broadcast back to all k slots
    (same gather machinery as the beam reorder). Fixed shapes throughout:
    the context-hidden buffer is [B, max_length, d] with positions
    >= cur_len masked out of the cosine max.

    ``gen.decode_buckets`` is intentionally ignored here (single-bucket):
    bucketing would have to grow the [B, max_length, d] hidden buffer at
    every segment boundary, and contrastive budgets are short in practice.

    Returns tokens [B, max_length].
    """
    B = features.shape[0]
    k = gen.top_k
    P = prompt_ids.shape[1]
    L = gen.max_length
    alpha = jnp.float32(gen.penalty_alpha)

    enc = jw.encoder_apply(params, features, config, stem, lora=lora)
    cache = jw.init_cache(params, enc, config, max_len=L,
                          int8_cross=gen.int8_kv_cache, self_batch=B * k)

    tokens = jnp.full((B, L), gen.pad_id, jnp.int32)
    tokens = lax.dynamic_update_slice(
        tokens, prompt_ids.astype(jnp.int32), (0, 0))

    # prompt pass at B*k rows (all k slots identical, like beam's warmup)
    prompt_bk = jnp.repeat(prompt_ids.astype(jnp.int32), k, axis=0)
    logits, cache, hid = jw.decoder_apply(
        params, prompt_bk, enc, config, lora=lora, cache=cache,
        cache_index=0, return_hidden=True,
    )
    V = logits.shape[-1]
    D = hid.shape[-1]
    last = logits.reshape(B, k, P, V)[:, 0, -1]          # [B, V]
    hbuf = jnp.zeros((B, L, D), hid.dtype)
    hbuf = lax.dynamic_update_slice(
        hbuf, hid.reshape(B, k, P, D)[:, 0], (0, 0, 0))

    use_seen = gen.repetition_penalty != 1.0
    seen0 = (lp.seen_from_tokens(tokens[:, :P], jnp.asarray(P), V)
             if use_seen else jnp.zeros((B, 1), bool))

    def cond(st):
        _, _, _, _, cur_len, finished, _ = st
        return (cur_len < L) & ~jnp.all(finished)

    def body(st):
        tokens, cache, last, hbuf, cur_len, finished, seen = st
        scores = _process_logits(last, tokens, cur_len, gen, bias_spec,
                                 P, seen=seen if use_seen else None)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        top_probs, top_ids = lax.top_k(probs, k)          # [B, k]

        cand = top_ids.reshape(B * k, 1).astype(jnp.int32)
        logits_k, cache2, hid_k = jw.decoder_apply(
            params, cand, enc, config, lora=lora, cache=cache,
            cache_index=cur_len, return_hidden=True,
        )
        nh = hid_k.reshape(B, k, D).astype(jnp.float32)
        ctx = hbuf.astype(jnp.float32)                    # [B, L, D]
        nh = nh / jnp.linalg.norm(nh, axis=-1, keepdims=True)
        ctx = ctx / jnp.linalg.norm(ctx, axis=-1, keepdims=True)
        cos = jnp.einsum("bld,bkd->bkl", ctx, nh)         # [B, k, L]
        valid = (jnp.arange(L) < cur_len)[None, None, :]
        degen = jnp.max(jnp.where(valid, cos, -jnp.inf), axis=-1)  # [B, k]
        cscore = (1.0 - alpha) * top_probs - alpha * degen
        sel = jnp.argmax(cscore, axis=-1)                 # [B]

        rows = jnp.arange(B)
        nxt = top_ids[rows, sel].astype(jnp.int32)
        nxt = jnp.where(finished, gen.pad_id, nxt)
        last = logits_k.reshape(B, k, 1, V)[rows, sel, 0]
        hid_sel = hid_k.reshape(B, k, D)[rows, sel]
        tokens = jax.vmap(
            lambda row, t, i: lax.dynamic_update_slice(row, t[None], (i,))
        )(tokens, nxt, jnp.full((B,), cur_len))
        hbuf = jax.vmap(
            lambda row, v, i: lax.dynamic_update_slice(row, v[None], (i, 0))
        )(hbuf, hid_sel.astype(hbuf.dtype), jnp.full((B,), cur_len))
        finished = finished | (nxt == gen.eos_id)
        if use_seen:
            seen = lp.update_seen(seen, nxt)
        # winner's self-cache row -> all k slots (beam-gather with a
        # constant per-batch index)
        cache2["self"] = _gather_beams(
            cache2["self"], jnp.tile(sel[:, None], (1, k)), B, k)
        return (tokens, cache2, last, hbuf, cur_len + 1, finished, seen)

    st = (tokens, cache, last, hbuf, jnp.asarray(P, jnp.int32),
          jnp.zeros((B,), bool), seen0)
    st = lax.while_loop(cond, body, st)
    return st[0]


def teacher_forcing_predict(params, features, decoder_input_ids, config, stem,
                            lora=None):
    """Argmax under a gold prefix (reference `evaluation.py:387-404`)."""
    logits = jw.forward(params, features, decoder_input_ids, config, stem,
                        lora=lora)
    return jnp.argmax(logits, axis=-1)


# ======================================================================
# beam search
# ======================================================================

def _gather_beams(tree, beam_idx, batch: int, k: int):
    """Reorder a cache pytree with per-layer [B*K, ...] leaves by per-batch
    beam indices beam_idx [B, K] (values in [0, K))."""
    flat = beam_idx + (jnp.arange(batch) * k)[:, None]  # [B, K] absolute
    flat = flat.reshape(-1)

    def g(x):
        # leaves: per-layer [B*K, ...] — gather along the row axis
        return jnp.take(x, flat, axis=0)

    return jax.tree_util.tree_map(g, tree)


@partial(jax.jit, static_argnames=("config", "stem", "gen"))
def beam_search(
    params: Params,
    features,
    prompt_ids,
    config: WhisperConfig,
    stem: StemConfig,
    gen: GenerationConfig,
    lora: Optional[Params] = None,
    bias_spec=None,
    rng=None,
    sample_noise=None,
):
    """HF-semantics beam search (transformers 4.57 `_beam_search`).
    Returns (tokens [B, max_length], scores [B]) for the best hypothesis
    per batch element.

    Exact 4.57 rules implemented: per step, 2K candidates are taken
    (deterministic top-k, or drawn without replacement when do_sample); a
    candidate "hits" when it emits eos OR reaches max_length; the K alive
    beams are the top-K of the 2K by score with hits demoted ADDITIVELY by
    -1e9 (relative order among hits preserved — `_get_running_beams_for_
    next_iteration`); only the first K candidate POSITIONS may finalize
    (`top_num_beam_mask`) and the finalized sequence INCLUDES its hitting
    token; finished score = sum_logprobs / (generated_len ** length_penalty)
    with generated_len EXCLUDING the prompt (`_update_finished_beams`);
    the loop stops when the sticky per-batch improvement heuristic fails
    everywhere, all candidates hit, or (early_stopping) every slot
    finished (`_check_early_stop_heuristic` /
    `_beam_search_has_unfinished_sequences`). There is no post-loop alive
    fold: still-running beams finalize through the max-length hit of the
    last step, exactly as HF's.

    ``gen.do_sample=True`` runs HF BEAM-SAMPLE (the reference's
    multinomial/top-k/top-p strategies at num_beams=20,
    `utils/process_str.py:56-63`; transformers 4.57 `_beam_search` with
    do_sample + `_get_top_k_continuations`): the temperature/top-k/top-p
    warpers run per beam row AFTER the processors and BEFORE the
    running-score addition (min_tokens_to_keep = n_eos_tokens + 1 = 2),
    and the 2K continuation candidates are drawn WITHOUT replacement from
    softmax of the flat [B, K*V] accumulated scores instead of taken
    deterministically. The draw uses the Gumbel-top-k identity
    (argtop_{2K}(scores + Gumbel) ~ sequential multinomial without
    replacement on softmax(scores)); alive/finished selection among the 2K
    stays score-based top-k exactly as HF's. ``rng`` seeds the per-step
    Gumbel noise (folded with cur_len); ``sample_noise`` ([max_length, B,
    K*V]) overrides the noise source for deterministic parity tests.
    """
    B = features.shape[0]
    K = gen.num_beams
    P = prompt_ids.shape[1]
    L = gen.max_length
    NEG = jnp.float32(-1e9)
    if L <= P:
        # degenerate budget (max_new_tokens=0, or a prompt consuming the
        # whole max_length): the decode loop never runs and no beam ever
        # finalizes — return the prompt itself (truncated) instead of the
        # all-pad finished buffer
        out = jnp.broadcast_to(
            prompt_ids[:, :L].astype(jnp.int32), (B, L))
        return out, jnp.zeros((B,), jnp.float32)
    V_stat = params["decoder"]["token_embed"].shape[0]
    C = _beam_prefilter_count(gen, V_stat, L)
    # exactness holds only for score-LOWERING processors (see the config
    # field doc); 'auto' gates on that
    use_prefilter = (
        gen.beam_prefilter == "on"
        and bias_spec is None
        and not gen.timestamps
        and gen.repetition_penalty >= 1.0
        and not gen.do_sample  # warping/drawing needs the full vocab row
        and C < V_stat
    )
    if gen.do_sample and rng is None:
        rng = jax.random.key(0)

    enc = jw.encoder_apply(params, features, config, stem, lora=lora)
    # cross K/V is beam-invariant: keep ONE cross cache per utterance
    # (mha folds the beam dim into the query rows) and allocate only the
    # self cache at B*K — K x fewer cross HBM reads per step and the
    # per-step beam reorder no longer gathers gigabytes of cross cache
    buckets = _resolve_buckets(gen, P)
    L0 = buckets[0]
    cache = jw.init_cache(params, enc, config, max_len=L0,
                          int8_cross=gen.int8_kv_cache, self_batch=B * K)

    tokens = jnp.full((B, K, L0), gen.pad_id, jnp.int32)
    tokens = tokens.at[:, :, :P].set(prompt_ids.astype(jnp.int32)[:, None, :])

    logits, cache = jw.decoder_apply(
        params, tokens.reshape(B * K, L0)[:, :P], enc, config, lora=lora,
        cache=cache, cache_index=0,
    )
    last = logits[:, -1]  # [B*K, V]

    alive_logp = jnp.tile(jnp.asarray([0.0] + [-1e9] * (K - 1)), (B, 1))  # [B,K]
    fin_seq = jnp.full((B, K, L0), gen.pad_id, jnp.int32)
    fin_scores = jnp.full((B, K), NEG)
    fin_exists = jnp.zeros((B, K), bool)
    # sticky per-batch "running beams could still improve the finished set"
    # bit (HF is_early_stop_heuristic_unsatisfied) and the global "not all
    # candidates hit a stopping criterion last step" bit
    improve_unsat = jnp.ones((B,), bool)
    valid_cont = jnp.asarray(True)

    # incremental seen-token set per beam row [B*K, V] (reordered with the
    # self cache each step); exact vs the dense buffer rescan by construction
    use_seen = gen.repetition_penalty != 1.0
    V_dim = last.shape[-1]
    seen0 = (lp.seen_from_tokens(
        tokens.reshape(B * K, L0)[:, :P], jnp.asarray(P), V_dim)
        if use_seen else jnp.zeros((B * K, 1), bool))

    def segment(st, Lb: int):
        """Decode-bucket segment (see greedy_decode.segment): the beam
        state's length-carrying buffers (tokens, fin_seq, self caches) are
        [*, Lb]-shaped; chained segments grow them between while_loops
        inside the same jit."""

        def cond(st):
            (tokens, cache, last, cur_len, alive_logp,
             fin_seq, fin_scores, fin_exists, seen,
             improve_unsat, valid_cont) = st
            # HF _beam_search_has_unfinished_sequences: improvement
            # possible anywhere & (early_stopping: some slot open) &
            # valid continuations remain
            go = (cur_len < Lb) & jnp.any(improve_unsat) & valid_cont
            if gen.early_stopping:
                go = go & ~jnp.all(fin_exists)
            return go

        def body(st):
            (tokens, cache, last, cur_len, alive_logp,
             fin_seq, fin_scores, fin_exists, seen,
             improve_unsat, valid_cont) = st
            V = last.shape[-1]

            # HF beam search order: log_softmax FIRST, then the processor chain
            # on the log-probs (contrast greedy, which processes raw logits).
            logp = jax.nn.log_softmax(last.astype(jnp.float32), axis=-1)
            if use_prefilter:
                # exact top-C prefilter: processors can only lower scores, so
                # the post-processor top-2K lives inside the raw top-C; the
                # chain then runs on [B*K, C] instead of [B*K, V] (tie order
                # preserved — top_k is index-stable, so equal-score candidates
                # keep vocab-id order within a beam and beam-major across)
                cand_vals, cand_ids = lax.top_k(logp, C)      # [B*K, C]
                cand_vals = _process_logits_subset(
                    cand_vals, cand_ids, tokens.reshape(B * K, Lb), cur_len,
                    gen, P, seen=seen if use_seen else None)
                total = alive_logp.reshape(B * K, 1) + cand_vals
                flat = total.reshape(B, K * C)
                top_vals, top_idx = lax.top_k(flat, 2 * K)    # [B, 2K]
                top_beam = top_idx // C
                top_tok = jnp.take_along_axis(
                    cand_ids.reshape(B, K * C), top_idx, axis=1
                ).astype(jnp.int32)
            else:
                logp = _process_logits(
                    logp, tokens.reshape(B * K, Lb), cur_len, gen, bias_spec, P,
                    seen=seen if use_seen else None,
                )
                if gen.do_sample:
                    # HF 4.57 appends the warpers to the processor chain:
                    # per beam row, before the running-score addition,
                    # min_tokens_to_keep = n_eos + 1 = 2
                    logp = lp.temperature_warp(logp, gen.temperature)
                    logp = lp.top_k_warp(logp, gen.top_k,
                                         min_tokens_to_keep=2)
                    logp = lp.top_p_warp(logp, gen.top_p,
                                         min_tokens_to_keep=2)
                logp = logp.reshape(B, K, V)
                total = alive_logp[..., None] + logp  # [B, K, V]

                # ---- flat top-2K over [B, K*V] via per-row top-2K + merge.
                # Each beam row contributes at most 2K of the flat winners,
                # so the beam-major pool of per-row top-2K contains them
                # all; re-top_k over the [B, K*2K] pool reproduces the flat
                # selection INCLUDING tie order (flat index = beam-major
                # then vocab id; the pool is beam-major, and per-row
                # lax.top_k is vocab-id-stable on ties). The single wide
                # top_k over K*V=259k lanes was the most expensive op in
                # the round-4 beam device trace (0.60 ms/token, 22% of the
                # step); the per-row form measures ~4x cheaper on v5e and
                # lifts beam serving 204->215 utt/s bs32 int8 (253 vs 238
                # pipelined — BASELINE.md round 4).
                # NEUSPEECH_BEAM_FLAT_TOPK=1 restores the wide form for
                # A/Bs.
                flat_topk = os.environ.get("NEUSPEECH_BEAM_FLAT_TOPK") == "1"
                if gen.do_sample:
                    # Gumbel-top-k == multinomial without replacement on
                    # softmax(flat); banned (-1e9) entries cannot win — the
                    # warpers keep >= 2 finite entries per beam row, so
                    # each flat row has >= 2K finite candidates
                    if sample_noise is not None:
                        noise = lax.dynamic_index_in_dim(
                            sample_noise, cur_len, axis=0, keepdims=False)
                    else:
                        noise = jax.random.gumbel(
                            jax.random.fold_in(rng, cur_len),
                            (B, K * V), jnp.float32)
                    if flat_topk:
                        flat = total.reshape(B, K * V)
                        _, top_idx = lax.top_k(flat + noise, 2 * K)  # [B, 2K]
                        top_vals = jnp.take_along_axis(flat, top_idx, axis=1)
                        top_beam = top_idx // V
                        top_tok = (top_idx % V).astype(jnp.int32)
                    else:
                        # rank-2 rows: XLA's fast TopK rewrite only fires
                        # on 2-D operands; the rank-3 [B, K, V] form
                        # lowers to a sort and measured 3.8x slower than
                        # even the flat form in serve_bench (BASELINE.md
                        # round 4)
                        noised = (total.reshape(B * K, V)
                                  + noise.reshape(B * K, V))
                        row_nvals, row_ids = lax.top_k(noised, 2 * K)
                        # clean (un-noised) scores of the same candidates
                        row_vals = jnp.take_along_axis(
                            total.reshape(B * K, V), row_ids, axis=1)
                        pool_n = row_nvals.reshape(B, K * 2 * K)
                        _, pool_idx = lax.top_k(pool_n, 2 * K)  # [B, 2K]
                        top_vals = jnp.take_along_axis(
                            row_vals.reshape(B, K * 2 * K), pool_idx, axis=1)
                        top_beam = pool_idx // (2 * K)
                        top_tok = jnp.take_along_axis(
                            row_ids.reshape(B, K * 2 * K), pool_idx, axis=1
                        ).astype(jnp.int32)
                else:
                    if flat_topk:
                        flat = total.reshape(B, K * V)
                        top_vals, top_idx = lax.top_k(flat, 2 * K)  # [B, 2K]
                        top_beam = top_idx // V
                        top_tok = (top_idx % V).astype(jnp.int32)
                    else:
                        # rank-2 rows (see sampling branch note)
                        row_vals, row_ids = lax.top_k(
                            total.reshape(B * K, V), 2 * K)  # [B*K, 2K]
                        pool = row_vals.reshape(B, K * 2 * K)
                        top_vals, pool_idx = lax.top_k(pool, 2 * K)  # [B, 2K]
                        top_beam = pool_idx // (2 * K)
                        top_tok = jnp.take_along_axis(
                            row_ids.reshape(B, K * 2 * K), pool_idx, axis=1
                        ).astype(jnp.int32)

            # a candidate "hits" a stopping criterion when it emits eos or
            # its sequence (cur_len + 1 tokens) reaches max_length
            hits = (top_tok == gen.eos_id) | (cur_len + 1 >= L)  # [B, 2K]

            # ---- finished update (HF _update_finished_beams): only the
            # first K candidate POSITIONS may finalize (top_num_beam_mask;
            # deterministic candidates are score-sorted so these are the K
            # best, sampled candidates are in draw order); the finalized
            # sequence INCLUDES the hitting token; score normalized by the
            # GENERATED length (prompt excluded); adds blocked once the
            # improvement heuristic failed (and, under early_stopping,
            # once every slot is finished)
            parent_tokens = jnp.take_along_axis(
                tokens, top_beam[..., None], axis=1
            )  # [B, 2K, L]
            cand_seq = jax.vmap(
                jax.vmap(lambda row, t: lax.dynamic_update_slice(
                    row, t[None], (cur_len,)), in_axes=(0, 0)),
                in_axes=(0, 0),
            )(parent_tokens, top_tok)
            gen_len1 = (cur_len + 1 - P).astype(jnp.float32)
            cand_norm = top_vals / (gen_len1 ** gen.length_penalty)
            pos_ok = jnp.arange(2 * K)[None, :] < K
            eligible = hits & pos_ok & improve_unsat[:, None]
            if gen.early_stopping:
                eligible = eligible & ~jnp.all(fin_exists, axis=1,
                                               keepdims=True)
            cand_scores = jnp.where(eligible, cand_norm, NEG)
            all_scores = jnp.concatenate([fin_scores, cand_scores], axis=1)  # [B, 3K]
            all_exists = jnp.concatenate([fin_exists, eligible], axis=1)
            all_seqs = jnp.concatenate([fin_seq, cand_seq], axis=1)  # [B, 3K, L]
            keep_vals, keep_idx = lax.top_k(
                jnp.where(all_exists, all_scores, NEG), K
            )
            fin_scores = keep_vals
            fin_exists = jnp.take_along_axis(all_exists, keep_idx, axis=1)
            fin_seq = jnp.take_along_axis(all_seqs, keep_idx[..., None], axis=1)

            # ---- alive update: top K of the 2K with hits demoted
            # ADDITIVELY (relative order among hit candidates preserved,
            # and a hit forced into the alive set carries the -1e9 — HF
            # _get_running_beams_for_next_iteration)
            alive_rank = top_vals + hits.astype(jnp.float32) * NEG
            alive_vals, alive_pick = lax.top_k(alive_rank, K)  # [B, K]
            new_beam = jnp.take_along_axis(top_beam, alive_pick, axis=1)  # [B,K]
            new_tok = jnp.take_along_axis(top_tok, alive_pick, axis=1)
            alive_logp = alive_vals

            tokens = jnp.take_along_axis(tokens, new_beam[..., None], axis=1)
            tokens = jax.vmap(
                jax.vmap(lambda row, t: lax.dynamic_update_slice(row, t[None], (cur_len,)),
                         in_axes=(0, 0)),
                in_axes=(0, 0),
            )(tokens, new_tok)

            # ---- stopping state (HF _check_early_stop_heuristic, computed
            # on the post-update finished set and the incremented length;
            # the bool-early_stopping config never takes HF's "never"
            # branch, so best_hypothetical_length == the current one)
            best_possible = jnp.max(alive_logp, axis=1) / (
                gen_len1 ** gen.length_penalty)
            all_fin = jnp.all(fin_exists, axis=1)
            worst_fin = jnp.min(fin_scores, axis=1)  # NEG placeholders kept
            improve_unsat = improve_unsat & jnp.where(
                all_fin, best_possible > worst_fin, True)
            valid_cont = ~jnp.all(hits)

            if use_seen:
                flat = (new_beam + jnp.arange(B)[:, None] * K).reshape(-1)
                seen = lp.update_seen(jnp.take(seen, flat, axis=0),
                                      new_tok.reshape(-1))

            cache = dict(cache)
            cache["self"] = _gather_beams(cache["self"], new_beam, B, K)
            logits, cache = jw.decoder_apply(
                params, new_tok.reshape(B * K, 1), enc, config, lora=lora,
                cache=cache, cache_index=cur_len,
            )
            return (tokens, cache, logits[:, -1], cur_len + 1, alive_logp,
                    fin_seq, fin_scores, fin_exists, seen,
                    improve_unsat, valid_cont)

        return lax.while_loop(cond, body, st)

    st = (tokens, cache, last, jnp.asarray(P, jnp.int32), alive_logp,
          fin_seq, fin_scores, fin_exists, seen0, improve_unsat, valid_cont)
    st = segment(st, buckets[0])
    for lb_prev, lb in zip(buckets, buckets[1:]):
        st = _pad_beam_state(st, lb - lb_prev, gen.pad_id)
        st = segment(st, lb)
    (tokens, cache, last, cur_len, alive_logp,
     fin_seq, fin_scores, fin_exists, _seen, improve_unsat, valid_cont) = st

    # the finished set is kept sorted descending by lax.top_k, and running
    # beams finalize through the max-length hit of the last step — HF takes
    # sequences[:, 0] with no post-loop alive fold
    return fin_seq[:, 0], fin_scores[:, 0]


def generate(
    params: Params,
    features,
    prompt_ids,
    config: WhisperConfig,
    stem: StemConfig,
    gen: GenerationConfig,
    lora: Optional[Params] = None,
    bias_spec=None,
    rng=None,
    draft_table=None,
):
    """Dispatch contrastive/sampling/beam-sample/greedy/beam; returns
    tokens [B, max_length]. Mode selection follows HF: contrastive when
    ``penalty_alpha > 0 and top_k > 1`` without sampling; beam-sample when
    ``do_sample and num_beams > 1`` (the reference's multinomial/top-k/
    top-p strategies run at num_beams=20, `utils/process_str.py:56-63`)."""
    if gen.spec_gamma >= 2 and (
            gen.do_sample or gen.num_beams > 1
            or (gen.penalty_alpha > 0 and gen.top_k > 1)):
        # fail loudly instead of silently decoding without speculation —
        # a user benchmarking --spec_gamma with the eval CLI's default
        # --num_beams=5 would otherwise measure plain beam search
        raise NotImplementedError(
            "spec_gamma only applies to plain greedy decode; unset "
            "do_sample/num_beams/penalty_alpha or spec_gamma")
    if gen.penalty_alpha > 0 and gen.top_k > 1 and not gen.do_sample:
        return contrastive_search(
            params, features, prompt_ids, config, stem, gen, lora=lora,
            bias_spec=bias_spec,
        )
    if gen.do_sample:
        if rng is None:
            rng = jax.random.key(0)
        if gen.num_beams > 1:
            seq, _ = beam_search(
                params, features, prompt_ids, config, stem, gen, lora=lora,
                bias_spec=bias_spec, rng=rng,
            )
            return seq
        return sample_decode(
            params, features, prompt_ids, rng, config, stem, gen, lora=lora,
            bias_spec=bias_spec,
        )
    if gen.num_beams <= 1:
        if gen.spec_gamma >= 2:
            if bias_spec is not None:
                raise NotImplementedError(
                    "spec_gamma does not compose with sequence bias")
            from neuspeech1_tpu.decode.spec import spec_greedy_decode

            seq, _ = spec_greedy_decode(
                params, features, prompt_ids, config, stem, gen,
                gamma=gen.spec_gamma, lora=lora, draft_table=draft_table,
            )
            return seq
        return greedy_decode(
            params, features, prompt_ids, config, stem, gen, lora=lora,
            bias_spec=bias_spec,
        )
    seq, _ = beam_search(
        params, features, prompt_ids, config, stem, gen, lora=lora,
        bias_spec=bias_spec,
    )
    return seq
