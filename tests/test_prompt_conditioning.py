"""<|startofprev|> text-prompt conditioning (reference
`utils/load_model.py:1258-1294`): prefix construction rules + HF generate
parity for decoding under a prompt prefix."""

import numpy as np
import pytest
import torch

from neuspeech1_tpu.config import StemConfig, tiny_config
from neuspeech1_tpu.decode.generate import GenerationConfig, greedy_decode
from neuspeech1_tpu.models.convert import params_from_hf_state_dict
from neuspeech1_tpu.utils.tokenizer import ByteTokenizer

from tests.test_model_parity import hf_model, small_cfg


def test_get_prompt_ids_structure():
    cfg = tiny_config()
    tok = ByteTokenizer(cfg)
    ids = tok.get_prompt_ids("hello")
    assert ids[0] == cfg.startofprev_id
    # HF WhisperTokenizer.get_prompt_ids prepends a space to the stripped text
    assert ids[1:] == tok.encode(" hello")


def test_prompt_prefix_order_and_slice():
    cfg = tiny_config()
    tok = ByteTokenizer(cfg)
    pre = tok.prefix_tokens_with_prompt("hi", "english", "transcribe")
    base = tok.prefix_tokens("english", "transcribe")
    assert pre[0] == cfg.startofprev_id
    assert pre[1:] == tok.encode(" hi") + base

    # the OpenAI/HF context rule: keep only the LAST
    # max_target_positions//2 - 1 prompt tokens
    long_text = "x" * 1000
    pre_long = tok.prefix_tokens_with_prompt(long_text)
    keep = cfg.max_target_positions // 2 - 1
    assert len(pre_long) == 1 + keep + len(base)
    # kept tokens are the TAIL of the encoded prompt
    assert pre_long[1: 1 + keep] == tok.encode(" " + long_text)[-keep:]


def test_generate_parity_with_prompt_prefix():
    """Decoding under [sop, prompt..., sot, lang, task, nots] must match HF
    generate given the identical decoder prefix (the reference's
    forced_decoder_ids construction is token-for-token equivalent to
    supplying the prefix as decoder_input_ids for greedy search)."""
    cfg = small_cfg()
    m = hf_model(cfg)
    m.generation_config.begin_suppress_tokens = None
    m.generation_config.suppress_tokens = None
    m.generation_config.forced_decoder_ids = None
    m.generation_config.no_timestamps_token_id = cfg.notimestamps_id
    m.generation_config.return_timestamps = False
    params = params_from_hf_state_dict(m.state_dict(), cfg, StemConfig("speech"))

    rng = np.random.default_rng(3)
    feats = rng.standard_normal(
        (2, cfg.num_mel_bins, cfg.max_source_positions * 2)).astype(np.float32)
    text_prompt = [10, 11, 12, 13]  # arbitrary in-vocab "words"
    prefix = np.asarray(
        [[cfg.startofprev_id, *text_prompt, cfg.sot_id, cfg.first_language_id,
          cfg.transcribe_id, cfg.notimestamps_id]] * 2, np.int32)

    L = prefix.shape[1] + 8
    with torch.no_grad():
        ref = m.generate(
            input_features=torch.tensor(feats),
            decoder_input_ids=torch.tensor(prefix, dtype=torch.long),
            max_length=L, num_beams=1, do_sample=False,
        ).numpy()
    gen = GenerationConfig.for_model(cfg, max_length=L)
    ours = np.asarray(greedy_decode(params, feats, prefix, cfg,
                                    StemConfig("speech"), gen))
    P = prefix.shape[1]
    for i in range(2):
        r = ref[i]
        np.testing.assert_array_equal(ours[i][P:][: len(r)], r,
                                      err_msg=f"row {i}")
