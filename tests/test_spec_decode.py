"""Self-speculative greedy decode: token-exactness vs plain greedy_decode.

Exactness is structural (drafts are only accepted when they equal the
model's own argmax under the identical accepted history), so the test is
full-buffer equality on a real (random-weight) tiny model — any masking,
position-id, cache-hole, eos, or acceptance-count bug shows up as a token
mismatch somewhere in the fuzz matrix.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from neuspeech1_tpu.config import StemConfig
from neuspeech1_tpu.decode.generate import GenerationConfig, greedy_decode
from neuspeech1_tpu.decode.spec import _ngram_draft, spec_greedy_decode
from neuspeech1_tpu.models.convert import params_from_hf_state_dict

from tests.test_model_parity import hf_model, small_cfg


@pytest.fixture(scope="module")
def spec_pair():
    cfg = small_cfg()
    m = hf_model(cfg)
    params = params_from_hf_state_dict(m.state_dict(), cfg,
                                       StemConfig("speech"))
    rng = np.random.default_rng(7)
    feats = rng.standard_normal(
        (3, cfg.num_mel_bins, cfg.max_source_positions * 2)
    ).astype(np.float32)
    prompt = np.asarray([[cfg.sot_id, cfg.first_language_id,
                          cfg.transcribe_id, cfg.notimestamps_id]] * 3,
                        np.int32)
    return cfg, params, feats, prompt


@pytest.mark.parametrize("gamma", [2, 3, 4])
@pytest.mark.parametrize("max_len", [10, 20])
def test_spec_greedy_exact(spec_pair, gamma, max_len):
    cfg, params, feats, prompt = spec_pair
    gen = GenerationConfig.for_model(cfg, max_length=max_len)
    gold = np.asarray(greedy_decode(params, feats, prompt, cfg,
                                    StemConfig("speech"), gen))
    ours, n_iters = spec_greedy_decode(params, feats, prompt, cfg,
                                       StemConfig("speech"), gen,
                                       gamma=gamma)
    np.testing.assert_array_equal(np.asarray(ours), gold)
    P = prompt.shape[1]
    assert int(n_iters) <= max_len - P


def test_spec_greedy_int8_cross_exact(spec_pair):
    """int8 cross cache: spec must match greedy under the SAME quantized
    cache (both paths quantize identically)."""
    cfg, params, feats, prompt = spec_pair
    gen = GenerationConfig.for_model(cfg, max_length=14, int8_kv_cache=True)
    gold = np.asarray(greedy_decode(params, feats, prompt, cfg,
                                    StemConfig("speech"), gen))
    ours, _ = spec_greedy_decode(params, feats, prompt, cfg,
                                 StemConfig("speech"), gen, gamma=2)
    np.testing.assert_array_equal(np.asarray(ours), gold)


def test_generate_dispatches_spec(spec_pair):
    from neuspeech1_tpu.decode.generate import generate

    cfg, params, feats, prompt = spec_pair
    gen0 = GenerationConfig.for_model(cfg, max_length=12)
    gen2 = GenerationConfig.for_model(cfg, max_length=12, spec_gamma=2)
    gold = np.asarray(generate(params, feats, prompt, cfg,
                               StemConfig("speech"), gen0))
    ours = np.asarray(generate(params, feats, prompt, cfg,
                               StemConfig("speech"), gen2))
    np.testing.assert_array_equal(ours, gold)


def test_spec_rejects_stateful_processors(spec_pair):
    cfg, params, feats, prompt = spec_pair
    gen = GenerationConfig.for_model(cfg, max_length=10,
                                     repetition_penalty=5.0)
    with pytest.raises(NotImplementedError):
        spec_greedy_decode(params, feats, prompt, cfg,
                           StemConfig("speech"), gen, gamma=2)


def test_ngram_draft_follows_history():
    # row 0: ... 9 4 | last=9 -> most recent prior 9 is at idx 1 -> draft 4,
    #   then follower(4) -> idx 2 -> 7
    # row 1: last token 3 never seen before -> fallback repeats 3
    out = np.asarray([[9, 4, 7, 9, 0, 0],
                      [1, 2, 9, 3, 0, 0]], np.int32)
    out_len = jnp.asarray([4, 4], jnp.int32)
    t_last = jnp.asarray([9, 3], jnp.int32)
    d = np.asarray(_ngram_draft(jnp.asarray(out), out_len, t_last, gamma=3))
    np.testing.assert_array_equal(d[0], [4, 7])
    np.testing.assert_array_equal(d[1], [3, 3])


def test_draft_table_lookup():
    from neuspeech1_tpu.decode.spec import _table_draft, build_draft_table

    class Tok:
        def encode(self, s):
            return [ord(c) for c in s]

    V = 300
    # "abc" repeated: pair (a,b)->c dominates; (b,c)->a; unigram a->b
    table = build_draft_table(["abcabcabc", "abx"], Tok(), V)
    out = jnp.asarray([[ord("a"), ord("b"), 0, 0]], jnp.int32)
    d = np.asarray(_table_draft(
        out, jnp.asarray([2], jnp.int32),
        jnp.asarray([ord("b")], jnp.int32), gamma=3,
        table={k: jnp.asarray(v) for k, v in table.items()}))
    # context (a,b) -> 'c' (2 occurrences beat 'x' at 1); then (b,c) -> 'a'
    np.testing.assert_array_equal(d[0], [ord("c"), ord("a")])


def test_draft_table_lookup_whisper_vocab_scale():
    """Regression: pair codes at the REAL whisper vocab (V=51865, codes up
    to V^2 ~= 2.7e9 > INT32_MAX) must survive jnp conversion — the int64
    form silently truncated to int32 under the default x64-off config,
    un-sorting the keys and breaking searchsorted."""
    from neuspeech1_tpu.decode.spec import _table_draft, build_draft_table

    V = 51865

    class Tok:
        def encode(self, s):
            # high token ids so codes exceed INT32_MAX
            return [V - 10 + (ord(c) % 10) for c in s]

    table = build_draft_table(["abcabcabc"], Tok(), V)
    jt = {k: jnp.asarray(v) for k, v in table.items()}
    assert jt["keys"].dtype == jnp.uint32
    assert bool(jnp.all(jt["keys"][1:] >= jt["keys"][:-1])), "keys unsorted"
    a, b, c = Tok().encode("abc")
    out = jnp.asarray([[a, b, 0, 0]], jnp.int32)
    d = np.asarray(_table_draft(
        out, jnp.asarray([2], jnp.int32), jnp.asarray([b], jnp.int32),
        gamma=3, table=jt))
    np.testing.assert_array_equal(d[0], [c, a])
    # no pair context (out_len < 2): must match nothing, including the
    # sentinel row of an empty-trigram table
    empty = {k: jnp.asarray(v)
             for k, v in build_draft_table(["ab"], Tok(), V).items()}
    d = np.asarray(_table_draft(
        out, jnp.asarray([1], jnp.int32), jnp.asarray([a], jnp.int32),
        gamma=2, table=empty))
    assert d[0, 0] == b  # unigram fallback a->b, not the sentinel's val 0


def test_spec_exact_with_draft_table(spec_pair):
    """Exactness must hold for ANY table contents (verify governs)."""
    from neuspeech1_tpu.decode.spec import build_draft_table

    class Tok:
        def encode(self, s):
            return [ord(c) % 97 for c in s]

    cfg, params, feats, prompt = spec_pair
    table = build_draft_table(
        ["hello world", "the quick brown fox", "zzzyyy"], Tok(), 97)
    table = {k: jnp.asarray(v) for k, v in table.items()}
    gen = GenerationConfig.for_model(cfg, max_length=14)
    gold = np.asarray(greedy_decode(params, feats, prompt, cfg,
                                    StemConfig("speech"), gen))
    ours, _ = spec_greedy_decode(params, feats, prompt, cfg,
                                 StemConfig("speech"), gen, gamma=3,
                                 draft_table=table)
    np.testing.assert_array_equal(np.asarray(ours), gold)


def test_spec_accepts_on_repetitive_history():
    """On a looping sequence the prompt-lookup drafter should accept often:
    n_iters must come in well under the worst case (1 token/iter)."""
    cfg = small_cfg()
    m = hf_model(cfg)
    params = params_from_hf_state_dict(m.state_dict(), cfg,
                                       StemConfig("speech"))
    rng = np.random.default_rng(3)
    feats = rng.standard_normal(
        (2, cfg.num_mel_bins, cfg.max_source_positions * 2)
    ).astype(np.float32)
    # long prompt that already loops: the first generated tokens of a
    # random-weight model tend to continue a cycle, and even if they
    # don't, exactness (checked above) is what matters — this test only
    # asserts the accounting: n_iters <= new tokens.
    prompt = np.asarray([[cfg.sot_id, 5, 6, 5, 6, 5, 6]] * 2, np.int32)
    gen = GenerationConfig.for_model(cfg, max_length=19)
    gold = np.asarray(greedy_decode(params, feats, prompt, cfg,
                                    StemConfig("speech"), gen))
    ours, n_iters = spec_greedy_decode(params, feats, prompt, cfg,
                                       StemConfig("speech"), gen, gamma=4)
    np.testing.assert_array_equal(np.asarray(ours), gold)
    assert int(n_iters) <= 19 - prompt.shape[1]
