"""Decode parity: processors vs HF implementations, greedy/beam vs HF generate."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from neuspeech1_tpu.config import StemConfig
from neuspeech1_tpu.decode import logits_process as lp
from neuspeech1_tpu.decode.generate import (
    GenerationConfig,
    beam_search,
    greedy_decode,
    teacher_forcing_predict,
)
from neuspeech1_tpu.models.convert import params_from_hf_state_dict

from tests.test_model_parity import VOCAB, hf_model, small_cfg


# ----------------------------------------------------------------------
# processor-level parity with HF torch implementations
# ----------------------------------------------------------------------

def _rand_logits(b=3, v=50, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((b, v)).astype(np.float32)


def test_repetition_penalty_matches_hf():
    from transformers import RepetitionPenaltyLogitsProcessor

    logits = _rand_logits()
    toks = np.array([[1, 5, 7, 0], [2, 2, 3, 0], [9, 9, 9, 0]], np.int32)
    cur_len = 3  # last column is garbage
    ref = RepetitionPenaltyLogitsProcessor(5.0)(
        torch.tensor(toks[:, :cur_len], dtype=torch.long), torch.tensor(logits)
    ).numpy()
    ours = np.asarray(
        lp.repetition_penalty(jnp.asarray(logits), jnp.asarray(toks),
                              jnp.asarray(cur_len), 5.0)
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_no_repeat_ngram_matches_hf():
    from transformers import NoRepeatNGramLogitsProcessor

    logits = _rand_logits(b=2)
    # beam 0: bigram (5, 7) appeared; current tail ends with 5 -> ban 7
    toks = np.array([[3, 5, 7, 4, 5, 0], [1, 2, 3, 4, 5, 0]], np.int32)
    cur_len = 5
    ref = NoRepeatNGramLogitsProcessor(2)(
        torch.tensor(toks[:, :cur_len], dtype=torch.long), torch.tensor(logits)
    ).numpy()
    ours = np.asarray(
        lp.no_repeat_ngram(jnp.asarray(logits), jnp.asarray(toks),
                           jnp.asarray(cur_len), 2)
    )
    banned_ref = ref < -1e8
    banned_ours = ours < -1e8
    np.testing.assert_array_equal(banned_ours, banned_ref)
    np.testing.assert_allclose(
        np.where(banned_ours, 0, ours), np.where(banned_ref, 0, ref), rtol=1e-6
    )


def test_no_repeat_ngram_trigram():
    from transformers import NoRepeatNGramLogitsProcessor

    logits = _rand_logits(b=1)
    toks = np.array([[3, 5, 7, 9, 3, 5, 0, 0]], np.int32)
    cur_len = 6  # tail (3,5); trigram (3,5,7) seen -> ban 7
    ref = NoRepeatNGramLogitsProcessor(3)(
        torch.tensor(toks[:, :cur_len], dtype=torch.long), torch.tensor(logits)
    ).numpy()
    ours = np.asarray(
        lp.no_repeat_ngram(jnp.asarray(logits), jnp.asarray(toks),
                           jnp.asarray(cur_len), 3)
    )
    np.testing.assert_array_equal(ours < -1e8, ref < -1e8)


def test_sequence_bias_matches_hf():
    from transformers import SequenceBiasLogitsProcessor

    logits = _rand_logits(b=2)
    toks = np.array([[1, 5, 7, 0], [2, 6, 8, 0]], np.int32)
    cur_len = 3
    bias_map = {(7,): -1.0, (5, 7, 9): 2.0, (8, 4): 0.5, (3, 2): 1.0}
    ref = SequenceBiasLogitsProcessor(sequence_bias=dict(bias_map))(
        torch.tensor(toks[:, :cur_len], dtype=torch.long), torch.tensor(logits)
    ).numpy()
    spec = lp.SequenceBiasSpec.build(bias_map)
    ours = np.asarray(
        lp.sequence_bias(jnp.asarray(logits), jnp.asarray(toks),
                         jnp.asarray(cur_len), spec)
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_suppress_and_force():
    logits = jnp.asarray(_rand_logits(b=1))
    out = lp.suppress_tokens(logits, (3, 4))
    assert float(out[0, 3]) < -1e8 and float(out[0, 4]) < -1e8
    forced = lp.force_tokens(logits, jnp.asarray(2), (2, 3), (11, 12))
    assert int(np.argmax(np.asarray(forced)[0])) == 11
    not_forced = lp.force_tokens(logits, jnp.asarray(5), (2, 3), (11, 12))
    np.testing.assert_array_equal(np.asarray(not_forced), np.asarray(logits))


def test_logit_ban_forms_lower_scatter_free():
    """Perf-regression guard: the ban/force processors must lower without
    scatter ops — the `.at[..., ids].set(NEG_INF)` form serialized on TPU
    (measured 155 ms/step inside the flagship greedy loop with the byte
    tokenizer's 30 derived suppress ids vs ~3.6 ms with the dense-mask
    `where` forms; BASELINE.md round 4)."""
    import jax

    ids = tuple(range(2, 32))

    def all_processors(logits, cur_len):
        x = lp.suppress_tokens(logits, ids)
        x = lp.suppress_tokens_at_begin(x, cur_len, 4, ids[:3])
        x = lp.force_tokens(x, cur_len, (2, 3), (11, 12))
        x = lp.apply_min_new_tokens(x, cur_len, 4, 2, eos_id=5)
        return x

    hlo = jax.jit(all_processors).lower(
        jnp.zeros((3, 64), jnp.float32), jnp.asarray(2, jnp.int32)
    ).as_text()
    assert "scatter" not in hlo, "logit ban/force processors reintroduced a scatter"


def test_transcriber_commits_params_to_device(tmp_path):
    """The Transcriber must hold a device-committed parameter tree —
    numpy leaves re-upload host->device on EVERY jitted batch call
    (measured 5.2 s/batch of pure weight upload on the tunneled runtime;
    cli/common.py::commit_params). Constructs a real Transcriber from a
    saved full-model dir (the load path yields numpy leaves) so a revert
    of the serve.py commit is caught."""
    import jax

    from neuspeech1_tpu.cli import common
    from neuspeech1_tpu.config import WhisperConfig
    from neuspeech1_tpu.models.init import init_params
    from neuspeech1_tpu.serve import Transcriber

    cfg = WhisperConfig(
        d_model=32, encoder_layers=1, decoder_layers=1, encoder_heads=2,
        decoder_heads=2, encoder_ffn=64, decoder_ffn=64,
        max_source_positions=32, max_target_positions=40,
        **WhisperConfig.layout_for_vocab(256),  # byte-tokenizer layout
    )
    stem = StemConfig("base", in_channels=4)
    params = jax.device_get(init_params(jax.random.key(0), cfg, stem))
    mdir = common.save_full_model(str(tmp_path / "full_model"), params,
                                  cfg, stem)
    loaded, _, _ = common.load_full_model(mdir)
    assert isinstance(jax.tree_util.tree_leaves(loaded)[0], np.ndarray), \
        "precondition: the load path must yield numpy leaves"
    t = Transcriber(mdir, max_new_tokens=4, batch_size=2)
    assert all(isinstance(l, jax.Array)
               for l in jax.tree_util.tree_leaves(t.params))
    # spec_gamma composes only with plain greedy — misconfig must raise
    with pytest.raises(ValueError):
        Transcriber(mdir, num_beams=2, spec_gamma=2)


# ----------------------------------------------------------------------
# end-to-end generate parity vs HF on a tiny random whisper
# ----------------------------------------------------------------------

@pytest.fixture(scope="module")
def gen_pair():
    cfg = small_cfg()
    m = hf_model(cfg)
    # neutralize whisper-specific generation defaults that assume the real
    # 51865 vocab (begin_suppress etc.)
    m.generation_config.begin_suppress_tokens = None
    m.generation_config.suppress_tokens = None
    m.generation_config.forced_decoder_ids = None
    m.generation_config.no_timestamps_token_id = cfg.notimestamps_id
    m.generation_config.return_timestamps = False
    params = params_from_hf_state_dict(m.state_dict(), cfg, StemConfig("speech"))
    rng = np.random.default_rng(11)
    feats = rng.standard_normal((2, cfg.num_mel_bins, cfg.max_source_positions * 2)
                                ).astype(np.float32)
    prompt = np.asarray([[cfg.sot_id, cfg.first_language_id, cfg.transcribe_id,
                          cfg.notimestamps_id]] * 2, np.int32)
    return cfg, m, params, feats, prompt


def _hf_generate(m, feats, prompt, **kw):
    with torch.no_grad():
        out = m.generate(
            input_features=torch.tensor(feats),
            decoder_input_ids=torch.tensor(prompt, dtype=torch.long),
            **kw,
        )
    return out.numpy()


def test_greedy_parity(gen_pair):
    cfg, m, params, feats, prompt = gen_pair
    L = 16
    ref = _hf_generate(m, feats, prompt, max_length=L, num_beams=1,
                       do_sample=False)
    gen = GenerationConfig.for_model(cfg, max_length=L)
    ours = np.asarray(greedy_decode(params, feats, prompt, cfg,
                                    StemConfig("speech"), gen))
    # HF strips the decoder_input_ids prompt from its output; ours keeps it
    P = prompt.shape[1]
    for i in range(feats.shape[0]):
        r = ref[i]
        o = ours[i][P:]
        np.testing.assert_array_equal(o[: len(r)], r, err_msg=f"row {i}")


def test_greedy_with_penalties_parity(gen_pair):
    cfg, m, params, feats, prompt = gen_pair
    L = 16
    ref = _hf_generate(m, feats, prompt, max_length=L, num_beams=1,
                       do_sample=False, repetition_penalty=5.0,
                       no_repeat_ngram_size=2)
    gen = GenerationConfig.for_model(cfg, max_length=L, repetition_penalty=5.0,
                                     no_repeat_ngram_size=2)
    ours = np.asarray(greedy_decode(params, feats, prompt, cfg,
                                    StemConfig("speech"), gen))
    P = prompt.shape[1]
    for i in range(feats.shape[0]):
        np.testing.assert_array_equal(
            ours[i][P : P + ref.shape[1]], ref[i], err_msg=f"row {i}")


def test_beam_search_parity(gen_pair):
    """Reference decode config: beam 5, rep-penalty 5.0, ngram-ban 2
    (`evaluation.py:369-386`)."""
    cfg, m, params, feats, prompt = gen_pair
    L = 16
    ref = _hf_generate(m, feats, prompt, max_length=L, num_beams=5,
                       do_sample=False, repetition_penalty=5.0,
                       no_repeat_ngram_size=2, length_penalty=1.0,
                       early_stopping=False)
    gen = GenerationConfig.for_model(cfg, max_length=L, num_beams=5,
                                     repetition_penalty=5.0,
                                     no_repeat_ngram_size=2)
    seq, score = beam_search(params, feats, prompt, cfg, StemConfig("speech"), gen)
    ours = np.asarray(seq)
    P = prompt.shape[1]
    for i in range(feats.shape[0]):
        np.testing.assert_array_equal(
            ours[i][P : P + ref.shape[1]], ref[i], err_msg=f"row {i}")


def test_beam_search_plain_parity(gen_pair):
    cfg, m, params, feats, prompt = gen_pair
    L = 14
    ref = _hf_generate(m, feats, prompt, max_length=L, num_beams=3,
                       do_sample=False, length_penalty=1.0, early_stopping=False)
    gen = GenerationConfig.for_model(cfg, max_length=L, num_beams=3)
    seq, _ = beam_search(params, feats, prompt, cfg, StemConfig("speech"), gen)
    ours = np.asarray(seq)
    P = prompt.shape[1]
    for i in range(feats.shape[0]):
        np.testing.assert_array_equal(
            ours[i][P : P + ref.shape[1]], ref[i], err_msg=f"row {i}")


def test_teacher_forcing_matches_hf(gen_pair):
    cfg, m, params, feats, prompt = gen_pair
    rng = np.random.default_rng(3)
    dec_in = rng.integers(0, VOCAB, (2, 6)).astype(np.int32)
    with torch.no_grad():
        ref = m(input_features=torch.tensor(feats),
                decoder_input_ids=torch.tensor(dec_in, dtype=torch.long)
                ).logits.argmax(-1).numpy()
    ours = np.asarray(teacher_forcing_predict(
        params, feats, dec_in, cfg, StemConfig("speech")))
    np.testing.assert_array_equal(ours, ref)


def test_generate_with_sequence_bias_e2e(gen_pair):
    """A large positive bias on a chosen token must steer greedy decode to
    it (the reference biases train-set keywords, evaluation.py:362-367)."""
    from neuspeech1_tpu.decode.logits_process import SequenceBiasSpec

    cfg, m, params, feats, prompt = gen_pair
    gen = GenerationConfig.for_model(cfg, max_length=12)
    base = np.asarray(greedy_decode(params, feats, prompt, cfg,
                                    StemConfig("speech"), gen))
    target = 33
    assert target not in base[0][prompt.shape[1]:]
    spec = SequenceBiasSpec.build({(target,): 50.0})
    steered = np.asarray(greedy_decode(params, feats, prompt, cfg,
                                       StemConfig("speech"), gen,
                                       bias_spec=spec))
    assert (steered[:, prompt.shape[1]] == target).all()


def test_beam_degenerate_budget_returns_prompt(gen_pair):
    """max_length <= prompt length: the loop never runs and nothing
    finalizes — beam_search must return the (truncated) prompt, not the
    all-pad finished buffer (regression, round 4)."""
    cfg, m, params, feats, prompt = gen_pair
    P = prompt.shape[1]
    gen = GenerationConfig.for_model(cfg, max_length=P, num_beams=3)
    seq, scores = beam_search(params, feats, prompt, cfg,
                              StemConfig("speech"), gen)
    np.testing.assert_array_equal(np.asarray(seq), np.asarray(prompt))
    gen2 = GenerationConfig.for_model(cfg, max_length=P - 1, num_beams=3)
    seq2, _ = beam_search(params, feats, prompt, cfg,
                          StemConfig("speech"), gen2)
    np.testing.assert_array_equal(np.asarray(seq2),
                                  np.asarray(prompt[:, :P - 1]))


def test_beam1_equals_greedy(gen_pair):
    """With no penalties, beam width 1 must reproduce greedy's sequence."""
    cfg, m, params, feats, prompt = gen_pair
    gen1 = GenerationConfig.for_model(cfg, max_length=14, num_beams=1)
    greedy = np.asarray(greedy_decode(params, feats, prompt, cfg,
                                      StemConfig("speech"), gen1))
    genb = GenerationConfig.for_model(cfg, max_length=14, num_beams=1)
    import dataclasses

    seq, _ = beam_search(params, feats, prompt, cfg, StemConfig("speech"),
                         dataclasses.replace(genb, num_beams=1))
    beam = np.asarray(seq)
    P = prompt.shape[1]
    for i in range(feats.shape[0]):
        g = greedy[i]
        b = beam[i]
        # compare THROUGH greedy's first eos: under the HF-4.57 semantics
        # the finalized beam hypothesis includes the hitting eos token
        n = P
        while n < len(g) and g[n] != gen1.eos_id:
            n += 1
        end = min(n + 1, len(g))  # include the eos position when present
        np.testing.assert_array_equal(b[:end], g[:end], err_msg=f"row {i}")


def test_generate_with_sharded_params(gen_pair):
    """Greedy decode with params/features sharded over an 8-device data mesh
    must match the replicated result (multi-chip inference path)."""
    import jax

    from neuspeech1_tpu.parallel.mesh import batch_sharding, make_mesh
    from neuspeech1_tpu.parallel.sharding import shard_params

    cfg, m, params, feats, prompt = gen_pair
    gen = GenerationConfig.for_model(cfg, max_length=14)
    ref = np.asarray(greedy_decode(params, feats, prompt, cfg,
                                   StemConfig("speech"), gen))
    mesh = make_mesh(data=2)
    p_sh = shard_params(mesh, params)
    f_sh = jax.device_put(feats, batch_sharding(mesh))
    out = np.asarray(greedy_decode(p_sh, f_sh, prompt, cfg,
                                   StemConfig("speech"), gen))
    np.testing.assert_array_equal(out, ref)


def test_beam_early_stopping_parity(gen_pair):
    cfg, m, params, feats, prompt = gen_pair
    L = 14
    ref = _hf_generate(m, feats, prompt, max_length=L, num_beams=3,
                       do_sample=False, length_penalty=1.0,
                       early_stopping=True)
    gen = GenerationConfig.for_model(cfg, max_length=L, num_beams=3,
                                     early_stopping=True)
    seq, _ = beam_search(params, feats, prompt, cfg, StemConfig("speech"), gen)
    ours = np.asarray(seq)
    P = prompt.shape[1]
    for i in range(feats.shape[0]):
        np.testing.assert_array_equal(
            ours[i][P : P + ref.shape[1]], ref[i], err_msg=f"row {i}")


def test_beam_length_penalty_parity(gen_pair):
    cfg, m, params, feats, prompt = gen_pair
    L = 14
    for lp in (0.6, 2.0):
        ref = _hf_generate(m, feats, prompt, max_length=L, num_beams=3,
                           do_sample=False, length_penalty=lp,
                           early_stopping=False)
        gen = GenerationConfig.for_model(cfg, max_length=L, num_beams=3,
                                         length_penalty=lp)
        seq, _ = beam_search(params, feats, prompt, cfg,
                             StemConfig("speech"), gen)
        ours = np.asarray(seq)
        P = prompt.shape[1]
        for i in range(feats.shape[0]):
            np.testing.assert_array_equal(
                ours[i][P : P + ref.shape[1]], ref[i],
                err_msg=f"lp={lp} row {i}")


def test_min_new_tokens_parity(gen_pair):
    cfg, m, params, feats, prompt = gen_pair
    L = 16
    ref = _hf_generate(m, feats, prompt, max_length=L, num_beams=1,
                       do_sample=False, min_new_tokens=6)
    gen = GenerationConfig.for_model(cfg, max_length=L, min_new_tokens=6)
    ours = np.asarray(greedy_decode(params, feats, prompt, cfg,
                                    StemConfig("speech"), gen))
    P = prompt.shape[1]
    for i in range(feats.shape[0]):
        np.testing.assert_array_equal(
            ours[i][P : P + ref.shape[1]], ref[i], err_msg=f"row {i}")


def test_int8_kv_cache_cross_attention():
    """int8 cross-cache decode: (a) EXACT for K/V already on the int8 grid
    (scales fold losslessly into q / the output), (b) close + token-stable
    for a trained-like random model end to end."""
    import numpy as np

    import jax

    from neuspeech1_tpu.config import StemConfig, tiny_config
    from neuspeech1_tpu.decode.generate import GenerationConfig, greedy_decode
    from neuspeech1_tpu.models import whisper as jw
    from neuspeech1_tpu.models.init import init_params

    cfg = tiny_config()
    stem = StemConfig("base", in_channels=4)
    params = init_params(jax.random.key(0), cfg, stem)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal(
        (2, 4, cfg.max_source_positions * 4)).astype(np.float32))

    # (a) quantization-exactness of the cache transform itself
    xi = rng.integers(-127, 128, (2, cfg.decoder_heads, 7,
                                  cfg.d_model // cfg.decoder_heads))
    xi[:, :, 0, :] = 127  # every (b,h,d) column spans the full grid so the
    # derived scale is exactly the grid step
    x = jnp.asarray(xi.astype(np.float32)) * 0.03125
    q8, s8 = jw._quantize_kv_int8(x)
    np.testing.assert_allclose(
        np.asarray(q8, np.float32) * np.asarray(s8), np.asarray(x),
        rtol=0, atol=1e-6)

    # (b) end-to-end greedy decode with and without the int8 cache
    tok_prompt = np.asarray([[cfg.sot_id, cfg.first_language_id,
                              cfg.transcribe_id, cfg.notimestamps_id]] * 2,
                            np.int32)
    gen = GenerationConfig.for_model(cfg, max_length=4 + 8)
    gen8 = GenerationConfig.for_model(cfg, max_length=4 + 8,
                                      int8_kv_cache=True)
    out = np.asarray(greedy_decode(params, feats, tok_prompt, cfg, stem, gen))
    out8 = np.asarray(greedy_decode(params, feats, tok_prompt, cfg, stem,
                                    gen8))
    assert out.shape == out8.shape
    # random-init logits are near-uniform, so demand agreement on most
    # GENERATED positions (the prompt is identical by construction and
    # must not pad the statistic)
    gen_out, gen_out8 = out[:, 4:], out8[:, 4:]
    agree = (gen_out == gen_out8).mean()
    assert agree >= 0.75, f"int8 KV cache diverged: agreement {agree:.2f}"


@pytest.mark.parametrize("seed", [5, 23])
def test_beam_parity_fuzz_seeds(seed):
    """Token-exact beam parity vs HF on freshly seeded random models —
    guards against single-lucky-seed parity (fixture uses one seed)."""
    import torch as _t

    cfg = small_cfg()
    _t.manual_seed(seed)
    m = hf_model(cfg)
    m.generation_config.begin_suppress_tokens = None
    m.generation_config.suppress_tokens = None
    m.generation_config.forced_decoder_ids = None
    m.generation_config.no_timestamps_token_id = cfg.notimestamps_id
    m.generation_config.return_timestamps = False
    params = params_from_hf_state_dict(m.state_dict(), cfg,
                                       StemConfig("speech"))
    rng = np.random.default_rng(seed)
    feats = rng.standard_normal(
        (2, cfg.num_mel_bins, cfg.max_source_positions * 2)
    ).astype(np.float32)
    prompt = np.asarray([[cfg.sot_id, cfg.first_language_id,
                          cfg.transcribe_id, cfg.notimestamps_id]] * 2,
                        np.int32)
    L = 14
    ref = _hf_generate(m, feats, prompt, max_length=L, num_beams=3,
                       do_sample=False, repetition_penalty=2.0,
                       length_penalty=1.0, early_stopping=False)
    gen = GenerationConfig.for_model(cfg, max_length=L, num_beams=3,
                                     repetition_penalty=2.0)
    seq, _ = beam_search(params, feats, prompt, cfg, StemConfig("speech"),
                         gen)
    ours = np.asarray(seq)
    P = prompt.shape[1]
    for i in range(feats.shape[0]):
        np.testing.assert_array_equal(
            ours[i][P: P + ref.shape[1]], ref[i],
            err_msg=f"seed {seed} row {i}")


# ----------------------------------------------------------------------
# default suppress-token derivation (HF generation_config content, derived
# natively from the vocab — reference utils/load_model.py:1210-1294 consumes
# the same lists from a downloaded file)
# ----------------------------------------------------------------------

from neuspeech1_tpu.utils.tokenizer import Tokenizer


class MockBPE(Tokenizer):
    """Controlled merge table: ONLY table entries encode to the shown ids;
    everything else falls back to len(text)+1 tokens (never single)."""

    TABLE = {
        '"': [10], ' "': [11], '(': [12], ';': [13],
        '<<': [14], '--': [15],            # multi-char symbols w/ merges
        '♪': [30, 31], ' ♪': [32, 33],     # misc notes: first token kept
        '♩': [30, 40],                     # shares the note prefix token
        ' -': [41, 5], " '": [42, 6],      # word-initial hyphen/apostrophe
        ' ': [43],
    }

    def encode(self, text):
        if text in self.TABLE:
            return list(self.TABLE[text])
        return [20 + i for i in range(len(text))] + [99]


def test_non_speech_derivation_gold(gen_pair):
    """Hand-computed gold for the OpenAI non-speech rule on a controlled
    vocab: single-token symbols (bare or space-prefixed), first token of
    each musical-note encoding, first token of " -" and " '"."""
    cfg = gen_pair[0]
    tok = MockBPE(cfg)
    # 20 = fallback first-token of the misc notes absent from the table:
    # musical-note symbols contribute their first token even when they
    # encode to multiple tokens (the shared-prefix rule)
    gold = [10, 11, 12, 13, 14, 15, 20, 30, 32, 41, 42]
    assert tok.non_speech_token_ids() == gold
    # + the task/special bans OpenAI's decoder always applies
    specials = [cfg.sot_id, cfg.translate_id, cfg.transcribe_id,
                cfg.startoflm_id, cfg.startofprev_id, cfg.nocaptions_id]
    assert tok.default_suppress_ids() == sorted(gold + specials)
    # begin-suppress: space token + <|endoftext|>
    assert tok.default_begin_suppress_ids() == [43, cfg.eot_id]


def test_byte_tokenizer_default_suppress():
    """ByteTokenizer: the derivation must NOT ban the space byte (the
    " -"/" '" seeds degenerate to it without BPE merges) but keeps the
    single-byte annotation symbols and the whisper special ids."""
    from neuspeech1_tpu.config import tiny_config
    from neuspeech1_tpu.utils.tokenizer import ByteTokenizer

    cfg = tiny_config()
    tok = ByteTokenizer(cfg)
    ids = tok.default_suppress_ids()
    assert ord(" ") not in ids
    assert ord('"') in ids and ord("(") in ids and ord("#") in ids
    for sid in (cfg.sot_id, cfg.translate_id, cfg.transcribe_id,
                cfg.startoflm_id, cfg.startofprev_id, cfg.nocaptions_id):
        assert sid in ids
    assert tok.default_begin_suppress_ids() == [ord(" "), cfg.eot_id]


def test_default_suppress_generate_parity(gen_pair):
    """for_model(tokenizer=...) must reproduce HF generate configured with
    the same derived suppress/begin-suppress lists, token-exactly."""
    cfg, m, params, feats, prompt = gen_pair
    tok = MockBPE(cfg)
    sup = [int(x) for x in tok.default_suppress_ids()]
    beg = [int(x) for x in tok.default_begin_suppress_ids()]
    L = 16
    m.generation_config.suppress_tokens = sup
    m.generation_config.begin_suppress_tokens = beg
    try:
        ref = _hf_generate(m, feats, prompt, max_length=L, num_beams=1,
                           do_sample=False)
    finally:
        m.generation_config.suppress_tokens = None
        m.generation_config.begin_suppress_tokens = None
    gen = GenerationConfig.for_model(cfg, tokenizer=tok, max_length=L)
    assert gen.suppress_ids == tuple(sup)
    assert gen.begin_suppress_ids == tuple(beg)
    ours = np.asarray(greedy_decode(params, feats, prompt, cfg,
                                    StemConfig("speech"), gen))
    P = prompt.shape[1]
    for i in range(feats.shape[0]):
        r = ref[i]
        o = ours[i][P:]
        np.testing.assert_array_equal(o[: len(r)], r, err_msg=f"row {i}")
        assert not set(int(t) for t in o[: len(r)]) & set(sup)


# ----------------------------------------------------------------------
# sampling (reference `utils/process_str.py:57-63` strategies)
# ----------------------------------------------------------------------

def test_top_k_warper_matches_hf():
    from transformers import TopKLogitsWarper

    logits = _rand_logits(b=3, v=50, seed=4)
    ref = TopKLogitsWarper(top_k=5)(None, torch.tensor(logits)).numpy()
    ours = np.asarray(lp.top_k_warp(jnp.asarray(logits), 5))
    np.testing.assert_array_equal(ours < -1e8, ref < -1e9)
    np.testing.assert_allclose(np.where(ref < -1e9, 0, ours),
                               np.where(ref < -1e9, 0, ref), rtol=1e-6)


def test_top_p_warper_matches_hf():
    from transformers import TopPLogitsWarper

    logits = _rand_logits(b=4, v=60, seed=5)
    for p in (0.3, 0.5, 0.9):
        ref = TopPLogitsWarper(top_p=p)(None, torch.tensor(logits)).numpy()
        ours = np.asarray(lp.top_p_warp(jnp.asarray(logits), p))
        np.testing.assert_array_equal(ours < -1e8, ref < -1e9,
                                      err_msg=f"top_p={p}")


def test_sample_decode_properties(gen_pair):
    """Sampling: (a) temperature -> 0 reproduces greedy token-exactly;
    (b) top-k draws stay within the top-k support of the processed logits
    step by step (checked via determinism across two identical runs and
    agreement of the k=1 case with greedy); (c) a fixed key is
    deterministic, different keys may differ."""
    import jax

    from neuspeech1_tpu.decode.generate import sample_decode

    cfg, m, params, feats, prompt = gen_pair
    L = 16
    stem = StemConfig("speech")
    greedy = np.asarray(greedy_decode(
        params, feats, prompt, cfg, stem,
        GenerationConfig.for_model(cfg, max_length=L)))
    # (a) tiny temperature: categorical over a near-delta distribution
    gen_cold = GenerationConfig.for_model(cfg, max_length=L, do_sample=True,
                                          temperature=1e-4)
    cold = np.asarray(sample_decode(params, feats, prompt, jax.random.key(0),
                                    cfg, stem, gen_cold))
    np.testing.assert_array_equal(cold, greedy)
    # (b) top_k=1 is argmax regardless of key
    gen_k1 = GenerationConfig.for_model(cfg, max_length=L, do_sample=True,
                                        top_k=1)
    k1 = np.asarray(sample_decode(params, feats, prompt, jax.random.key(7),
                                  cfg, stem, gen_k1))
    np.testing.assert_array_equal(k1, greedy)
    # (c) fixed key deterministic
    gen_s = GenerationConfig.for_model(cfg, max_length=L, do_sample=True,
                                       top_k=5, temperature=1.3, top_p=0.95)
    a = np.asarray(sample_decode(params, feats, prompt, jax.random.key(3),
                                 cfg, stem, gen_s))
    b = np.asarray(sample_decode(params, feats, prompt, jax.random.key(3),
                                 cfg, stem, gen_s))
    np.testing.assert_array_equal(a, b)


def test_top_k_warper_min_tokens_to_keep_matches_hf():
    """Beam-sample constructs TopK with min_tokens_to_keep = n_eos+1 = 2
    (HF `_get_logits_processor` under num_beams>1 + do_sample)."""
    from transformers import TopKLogitsWarper

    logits = _rand_logits(b=3, v=50, seed=6)
    ref = TopKLogitsWarper(top_k=1, min_tokens_to_keep=2)(
        None, torch.tensor(logits)).numpy()
    ours = np.asarray(lp.top_k_warp(jnp.asarray(logits), 1,
                                    min_tokens_to_keep=2))
    np.testing.assert_array_equal(ours < -1e8, ref < -1e9)


def test_beam_sample_zero_noise_equals_beam_search(gen_pair):
    """With zero injected noise and neutral warpers, the beam-sample path
    (argtop of flat + noise) degenerates to deterministic beam search
    token- and score-exactly."""
    cfg, m, params, feats, prompt = gen_pair
    L = 16
    stem = StemConfig("speech")
    base = dict(max_length=L, num_beams=4, repetition_penalty=5.0,
                no_repeat_ngram_size=2)
    g_det = GenerationConfig.for_model(cfg, **base)
    g_smp = GenerationConfig.for_model(cfg, do_sample=True, **base)
    B, K, V = feats.shape[0], 4, VOCAB
    zero_noise = jnp.zeros((L, B, K * V), jnp.float32)
    s_det, v_det = beam_search(params, feats, prompt, cfg, stem, g_det)
    s_smp, v_smp = beam_search(params, feats, prompt, cfg, stem, g_smp,
                               sample_noise=zero_noise)
    np.testing.assert_array_equal(np.asarray(s_smp), np.asarray(s_det))
    np.testing.assert_allclose(np.asarray(v_smp), np.asarray(v_det),
                               rtol=1e-5)


def test_beam_sample_parity_injected_draws(gen_pair):
    """Token-exact beam-sample parity vs REAL HF generate (the reference's
    multinomial/top-k/top-p strategies at num_beams>1,
    `utils/process_str.py:56-63`) with the one non-deterministic piece —
    the multinomial draw — unified: torch.multinomial is patched to
    argtop-2K of (log(probs) + noise) with a shared per-step Gumbel noise
    buffer, exactly the Gumbel-top-k draw our beam_search uses
    (adding noise to log(probs) vs to the accumulated scores differs by a
    per-row constant, which argtop ignores). Everything else — processors,
    warper order/min_tokens_to_keep, score addition, eos folding,
    finalization — is HF's real 4.57 code vs ours.

    NOTE: transformers 4.57's WhisperGenerationMixin.generate forces
    num_beams=1 whenever do_sample is set (its temperature-fallback loop),
    making beam-sample unreachable through the whisper wrapper — the
    reference's vendored fork of an older transformers passed through to
    GenerationMixin, where BEAM_SAMPLE is live. We therefore call
    GenerationMixin.generate directly (the mode table still selects
    BEAM_SAMPLE there)."""
    cfg, m, params, feats, prompt = gen_pair
    L, K = 16, 3
    B, V = feats.shape[0], VOCAB
    P = prompt.shape[1]
    stem = StemConfig("speech")
    rng = np.random.default_rng(42)
    noise = rng.gumbel(size=(L, B, K * V)).astype(np.float32)
    noise_t = torch.tensor(noise)

    for kw in (
        dict(temperature=1.3, top_k=5),
        dict(top_p=0.9),
        dict(repetition_penalty=5.0, no_repeat_ngram_size=2, top_k=8),
    ):
        calls = {"i": 0}
        orig = torch.multinomial

        def fake_multinomial(probs, num_samples, **_kw):
            step_noise = noise_t[P + calls["i"]]
            calls["i"] += 1
            assert probs.shape == (B, K * V) and num_samples == 2 * K
            scores = torch.log(probs) + step_noise
            return torch.topk(scores, num_samples, dim=-1).indices

        from transformers.generation import GenerationMixin

        torch.multinomial = fake_multinomial
        try:
            with torch.no_grad():
                ref = GenerationMixin.generate(
                    m,
                    input_features=torch.tensor(feats),
                    decoder_input_ids=torch.tensor(prompt, dtype=torch.long),
                    max_length=L, num_beams=K, do_sample=True,
                    length_penalty=1.0, early_stopping=False,
                    pad_token_id=cfg.eot_id,
                    # HF GenerationConfig defaults top_k=50 under
                    # do_sample; disable unless the case sets it so both
                    # sides warp identically
                    **{"top_k": 0, **kw},
                ).numpy()
        finally:
            torch.multinomial = orig
        assert calls["i"] >= 1

        gen = GenerationConfig.for_model(cfg, max_length=L, num_beams=K,
                                         do_sample=True, **kw)
        seq, _ = beam_search(params, feats, prompt, cfg, stem, gen,
                             sample_noise=jnp.asarray(noise))
        ours = np.asarray(seq)
        # generic GenerationMixin.generate keeps the decoder prompt in its
        # output (the whisper wrapper would strip it); pad == eos, so tails
        # compare exactly too
        for i in range(B):
            np.testing.assert_array_equal(
                ours[i][: ref.shape[1]], ref[i],
                err_msg=f"kw={kw} row {i}")


def test_beam_sample_gumbel_draw_distribution():
    """The Gumbel-top-k draw IS multinomial-without-replacement: (a) first
    pick frequencies match softmax(scores) over many keys; (b) the 2K
    picks per draw are distinct."""
    import jax

    scores = jnp.asarray([[0.5, 2.0, -1.0, 1.0, 0.0, -0.5]], jnp.float32)
    probs = np.asarray(jax.nn.softmax(scores, axis=-1))[0]
    n, k = 4000, 3
    counts = np.zeros(6)
    base = jax.random.key(123)

    @jax.jit
    def draw(key):
        g = jax.random.gumbel(key, scores.shape, jnp.float32)
        return jax.lax.top_k(scores + g, k)[1][0]

    keys = jax.random.split(base, n)
    picks = np.asarray(jax.vmap(draw)(keys))  # [n, k]
    for row in picks:
        assert len(set(row.tolist())) == k  # without replacement
    for t in picks[:, 0]:
        counts[t] += 1
    freq = counts / n
    # 4000 draws: std per bucket <= 0.008; allow 5 sigma
    np.testing.assert_allclose(freq, probs, atol=0.04)


def test_beam_sample_via_generate_deterministic(gen_pair):
    """Dispatcher: do_sample + num_beams>1 routes to beam-sample; a fixed
    rng key is reproducible and the output differs from deterministic beam
    under hot temperature (sanity that sampling is actually live)."""
    import jax

    from neuspeech1_tpu.decode.generate import generate

    cfg, m, params, feats, prompt = gen_pair
    L = 16
    stem = StemConfig("speech")
    gen = GenerationConfig.for_model(cfg, max_length=L, num_beams=3,
                                     do_sample=True, temperature=2.0)
    a = np.asarray(generate(params, feats, prompt, cfg, stem, gen,
                            rng=jax.random.key(5)))
    b = np.asarray(generate(params, feats, prompt, cfg, stem, gen,
                            rng=jax.random.key(5)))
    np.testing.assert_array_equal(a, b)
    det = GenerationConfig.for_model(cfg, max_length=L, num_beams=3)
    d, _ = beam_search(params, feats, prompt, cfg, stem, det)
    assert not np.array_equal(a, np.asarray(d))


def test_beam_prefilter_parity(gen_pair):
    """beam_prefilter='on' (exact top-C subset processors) reproduces the
    full-vocab path token-exactly under the reference penalties."""
    cfg, m, params, feats, prompt = gen_pair
    L = 16
    base = dict(max_length=L, num_beams=4, repetition_penalty=5.0,
                no_repeat_ngram_size=2, min_new_tokens=2)
    g_off = GenerationConfig.for_model(cfg, **base)
    g_on = GenerationConfig.for_model(cfg, beam_prefilter="on", **base)
    s_off, v_off = beam_search(params, feats, prompt, cfg,
                               StemConfig("speech"), g_off)
    s_on, v_on = beam_search(params, feats, prompt, cfg,
                             StemConfig("speech"), g_on)
    np.testing.assert_array_equal(np.asarray(s_on), np.asarray(s_off))
    np.testing.assert_allclose(np.asarray(v_on), np.asarray(v_off),
                               rtol=1e-5)


def test_bucketed_greedy_matches_single_bucket():
    """decode_buckets: chained small-buffer loop segments produce EXACTLY
    the single-bucket tokens (the bucket boundary carries tokens, KV cache,
    seen set, and lengths losslessly)."""
    import numpy as np

    import jax

    from neuspeech1_tpu.config import StemConfig, tiny_config
    from neuspeech1_tpu.decode.generate import GenerationConfig, greedy_decode
    from neuspeech1_tpu.models.init import init_params

    cfg = tiny_config()
    stem = StemConfig("base", in_channels=4)
    params = init_params(jax.random.key(3), cfg, stem)
    rng = np.random.default_rng(11)
    feats = jnp.asarray(rng.standard_normal(
        (2, 4, cfg.max_source_positions * 4)).astype(np.float32))
    prompt = np.asarray([[cfg.sot_id, cfg.first_language_id,
                          cfg.transcribe_id, cfg.notimestamps_id]] * 2,
                        np.int32)
    kw = dict(max_length=4 + 14, repetition_penalty=2.0,
              min_new_tokens=10)  # force generation across the boundary
    plain = GenerationConfig.for_model(cfg, **kw)
    bucketed = GenerationConfig.for_model(cfg, decode_buckets=(8, 12), **kw)
    out_p = np.asarray(greedy_decode(params, feats, prompt, cfg, stem, plain))
    out_b = np.asarray(greedy_decode(params, feats, prompt, cfg, stem,
                                     bucketed))
    np.testing.assert_array_equal(out_p, out_b)


def test_bucketed_beam_matches_single_bucket():
    """Bucketed beam search (reference eval config) is token- and
    score-exact vs the single-bucket loop across a bucket boundary."""
    import numpy as np

    import jax

    from neuspeech1_tpu.config import StemConfig, tiny_config
    from neuspeech1_tpu.decode.generate import GenerationConfig, beam_search
    from neuspeech1_tpu.models.init import init_params

    cfg = tiny_config()
    stem = StemConfig("base", in_channels=4)
    params = init_params(jax.random.key(5), cfg, stem)
    rng = np.random.default_rng(17)
    feats = jnp.asarray(rng.standard_normal(
        (2, 4, cfg.max_source_positions * 4)).astype(np.float32))
    prompt = np.asarray([[cfg.sot_id, cfg.first_language_id,
                          cfg.transcribe_id, cfg.notimestamps_id]] * 2,
                        np.int32)
    kw = dict(max_length=4 + 14, num_beams=3, repetition_penalty=5.0,
              no_repeat_ngram_size=2, min_new_tokens=10)
    plain = GenerationConfig.for_model(cfg, **kw)
    bucketed = GenerationConfig.for_model(cfg, decode_buckets=(8, 12), **kw)
    seq_p, sc_p = beam_search(params, feats, prompt, cfg, stem, plain)
    seq_b, sc_b = beam_search(params, feats, prompt, cfg, stem, bucketed)
    np.testing.assert_array_equal(np.asarray(seq_p), np.asarray(seq_b))
    np.testing.assert_allclose(np.asarray(sc_p), np.asarray(sc_b), rtol=1e-6)


def _torch_contrastive_gold(m, feats, prompt, L, alpha, k,
                            eos_id, pad_id):
    """Independent torch reimplementation of HF contrastive search
    (`GenerationMixin._contrastive_search` / `_ranking_fast` as published;
    transformers 4.57 moved the torch path to an unreachable hub repo —
    the same algorithm survives in-package at tf_utils.py:2684).

    Full-prefix recompute per step (exact for a causal decoder) instead of
    KV caches, so no Cache-format coupling: per step, process the selected
    hypothesis' logits, softmax, top-k candidates, run the decoder on every
    candidate-extended prefix, score (1-alpha)*p - alpha*max_cos(candidate
    hidden, context hiddens), keep the argmax."""
    B = feats.shape[0]
    with torch.no_grad():
        enc = m.model.encoder(torch.tensor(feats)).last_hidden_state
        tokens = torch.tensor(prompt, dtype=torch.long)
        out = m.model.decoder(input_ids=tokens, encoder_hidden_states=enc)
        last = m.proj_out(out.last_hidden_state[:, -1])
        finished = torch.zeros(B, dtype=torch.bool)
        enc_k = enc.repeat_interleave(k, dim=0)
        while tokens.shape[1] < L and not bool(finished.all()):
            probs = last.float().softmax(-1)
            top_p, top_i = probs.topk(k)                       # [B, k]
            full = torch.cat(
                [tokens.repeat_interleave(k, dim=0),
                 top_i.reshape(B * k, 1)], dim=1)
            h = m.model.decoder(
                input_ids=full, encoder_hidden_states=enc_k
            ).last_hidden_state                                # [B*k, t+1, D]
            D = h.shape[-1]
            nh = h[:, -1].view(B, k, D).float()
            ctx = h[:, :-1].view(B, k, -1, D)[:, 0].float()    # [B, t, D]
            nh_n = nh / nh.norm(dim=-1, keepdim=True)
            ctx_n = ctx / ctx.norm(dim=-1, keepdim=True)
            degen = torch.einsum("btd,bkd->bkt", ctx_n, nh_n).max(-1).values
            score = (1.0 - alpha) * top_p - alpha * degen
            sel = score.argmax(-1)                             # [B]
            rows = torch.arange(B)
            nxt = top_i[rows, sel]
            nxt = torch.where(finished, torch.full_like(nxt, pad_id), nxt)
            tokens = torch.cat([tokens, nxt[:, None]], dim=1)
            last = m.proj_out(
                h[:, -1].view(B, k, D)[rows, sel])
            finished = finished | (nxt == eos_id)
    return tokens.numpy()


def test_contrastive_search_parity(gen_pair):
    """Contrastive search vs an independent torch gold of HF's algorithm —
    the reference's contrastiveSearch strategy (`utils/process_str.py:64-65`
    uses penalty_alpha=1, top_k=5). Token-exact at the reference setting
    and at the classic alpha=0.6 (both score terms live)."""
    from neuspeech1_tpu.decode.generate import contrastive_search, generate

    cfg, m, params, feats, prompt = gen_pair
    L = 16
    stem = StemConfig("speech")
    for alpha, k in ((1.0, 5), (0.6, 4)):
        ref = _torch_contrastive_gold(m, feats, prompt, L, alpha, k,
                                      cfg.eot_id, cfg.eot_id)
        gen = GenerationConfig.for_model(cfg, max_length=L,
                                         penalty_alpha=alpha, top_k=k)
        ours = np.asarray(contrastive_search(params, feats, prompt, cfg,
                                             stem, gen))
        via_dispatch = np.asarray(generate(params, feats, prompt, cfg,
                                           stem, gen))
        np.testing.assert_array_equal(ours, via_dispatch)
        for i in range(feats.shape[0]):
            r = ref[i]
            np.testing.assert_array_equal(
                ours[i][: len(r)], r, err_msg=f"alpha={alpha} k={k} row {i}")
            # past the gold's early-finish length everything must be pad —
            # a bug emitting garbage after EOS must not pass
            np.testing.assert_array_equal(
                ours[i][len(r):],
                np.full(ours.shape[1] - len(r), cfg.eot_id, ours.dtype),
                err_msg=f"alpha={alpha} k={k} row {i} post-EOS tail")
