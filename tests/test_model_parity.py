"""Logit-level parity of the JAX model vs HF transformers Whisper (torch).

The reference runs on HF's modeling_whisper (vendored at
`utils/load_model.py`); matching its logits on fixed random weights is the
ground-truth gate for weight-porting fidelity (SURVEY §7 hard-part 3).
Models are instantiated locally with random weights — no downloads.
"""

import numpy as np
import pytest
import torch

from neuspeech1_tpu.config import StemConfig, WhisperConfig
from neuspeech1_tpu.models import whisper as jw
from neuspeech1_tpu.models.convert import (
    load_npz,
    params_from_hf_state_dict,
    params_to_hf_state_dict,
    save_npz,
)
from neuspeech1_tpu.models.init import init_params, param_count, sinusoids

VOCAB = 120
D = 64


def small_cfg(max_src=8):
    return WhisperConfig(
        vocab_size=VOCAB,
        num_mel_bins=16,
        d_model=D,
        encoder_layers=2,
        decoder_layers=2,
        encoder_heads=2,
        decoder_heads=2,
        encoder_ffn=128,
        decoder_ffn=128,
        max_source_positions=max_src,
        max_target_positions=24,
        eot_id=90,
        sot_id=91,
        first_language_id=92,
        num_languages=2,
        translate_id=94,
        transcribe_id=95,
        startoflm_id=96,
        startofprev_id=97,
        nocaptions_id=98,
        notimestamps_id=99,
        dtype="float32",
    )


def hf_model(cfg: WhisperConfig):
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration

    hf_cfg = HFConfig(
        vocab_size=cfg.vocab_size,
        num_mel_bins=cfg.num_mel_bins,
        d_model=cfg.d_model,
        encoder_layers=cfg.encoder_layers,
        decoder_layers=cfg.decoder_layers,
        encoder_attention_heads=cfg.encoder_heads,
        decoder_attention_heads=cfg.decoder_heads,
        encoder_ffn_dim=cfg.encoder_ffn,
        decoder_ffn_dim=cfg.decoder_ffn,
        max_source_positions=cfg.max_source_positions,
        max_target_positions=cfg.max_target_positions,
        pad_token_id=cfg.eot_id,
        bos_token_id=cfg.eot_id,
        eos_token_id=cfg.eot_id,
        decoder_start_token_id=cfg.sot_id,
        dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
    )
    torch.manual_seed(0)
    m = WhisperForConditionalGeneration(hf_cfg)
    m.eval()
    return m


@pytest.fixture(scope="module")
def speech_pair():
    cfg = small_cfg()
    m = hf_model(cfg)
    params = params_from_hf_state_dict(m.state_dict(), cfg, StemConfig("speech"))
    return cfg, m, params


def test_speech_logit_parity(speech_pair):
    cfg, m, params = speech_pair
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((2, cfg.num_mel_bins, cfg.max_source_positions * 2)).astype(
        np.float32
    )
    dec_in = rng.integers(0, VOCAB, (2, 7)).astype(np.int32)
    with torch.no_grad():
        ref = m(
            input_features=torch.tensor(feats),
            decoder_input_ids=torch.tensor(dec_in, dtype=torch.long),
        ).logits.numpy()
    ours = np.asarray(
        jw.forward(params, feats, dec_in, cfg, StemConfig("speech"))
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=2e-4)


def test_eeg_base_stem_logit_parity():
    """Parity with the reference's stem-swap: HF whisper whose conv1 is the
    'base' Sequential (`finetune.py:143-148`, `utils/model_utils.py:10-17`)."""
    cfg = small_cfg()
    stem = StemConfig("base", in_channels=12)
    m = hf_model(cfg)
    torch.manual_seed(1)
    conv1 = torch.nn.Sequential(
        torch.nn.Conv1d(stem.in_channels, cfg.d_model, kernel_size=3, padding=1),
        torch.nn.GELU(),
        torch.nn.Conv1d(cfg.d_model, cfg.d_model, kernel_size=3, stride=2, padding=1),
    )
    conv1.stride = (2,)  # reference `utils/model_utils.py:17` (HF length check)
    m.model.encoder.set_input_embeddings(conv1)
    m.eval()
    params = params_from_hf_state_dict(m.state_dict(), cfg, stem)

    rng = np.random.default_rng(2)
    feats = rng.standard_normal(
        (2, stem.in_channels, cfg.max_source_positions * 4)
    ).astype(np.float32)
    dec_in = rng.integers(0, VOCAB, (2, 5)).astype(np.int32)
    with torch.no_grad():
        ref = m(
            input_features=torch.tensor(feats),
            decoder_input_ids=torch.tensor(dec_in, dtype=torch.long),
        ).logits.numpy()
    ours = np.asarray(jw.forward(params, feats, dec_in, cfg, stem))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=2e-4)


def test_encoder_parity_and_geometry(speech_pair):
    cfg, m, params = speech_pair
    rng = np.random.default_rng(3)
    feats = rng.standard_normal((1, cfg.num_mel_bins, cfg.max_source_positions * 2)).astype(
        np.float32
    )
    with torch.no_grad():
        ref = m.model.encoder(torch.tensor(feats)).last_hidden_state.numpy()
    ours = np.asarray(jw.encoder_apply(params, feats, cfg, StemConfig("speech")))
    assert ours.shape == (1, cfg.max_source_positions, cfg.d_model)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=2e-4)
    # wrong input length -> clear error
    bad = rng.standard_normal((1, cfg.num_mel_bins, 10)).astype(np.float32)
    with pytest.raises(ValueError, match="frames"):
        jw.encoder_apply(params, bad, cfg, StemConfig("speech"))


def test_incremental_decode_matches_full(speech_pair):
    """KV-cached step-by-step logits == full teacher-forcing logits."""
    import jax.numpy as jnp

    cfg, m, params = speech_pair
    rng = np.random.default_rng(4)
    feats = rng.standard_normal((2, cfg.num_mel_bins, cfg.max_source_positions * 2)).astype(
        np.float32
    )
    tokens = rng.integers(0, VOCAB, (2, 6)).astype(np.int32)
    enc = jw.encoder_apply(params, feats, cfg, StemConfig("speech"))
    full = np.asarray(jw.decoder_apply(params, tokens, enc, cfg))

    cache = jw.init_cache(params, enc, cfg, max_len=8)
    outs = []
    for t in range(tokens.shape[1]):
        logits, cache = jw.decoder_apply(
            params, tokens[:, t : t + 1], enc, cfg, cache=cache, cache_index=t
        )
        outs.append(np.asarray(logits)[:, 0])
    step = np.stack(outs, axis=1)
    np.testing.assert_allclose(step, full, rtol=1e-4, atol=2e-4)


def test_prefill_then_step_decode(speech_pair):
    """Multi-token prefill at cache_index=0 then single steps — the beam
    search usage pattern."""
    cfg, m, params = speech_pair
    rng = np.random.default_rng(5)
    feats = rng.standard_normal((1, cfg.num_mel_bins, cfg.max_source_positions * 2)).astype(
        np.float32
    )
    tokens = rng.integers(0, VOCAB, (1, 6)).astype(np.int32)
    enc = jw.encoder_apply(params, feats, cfg, StemConfig("speech"))
    full = np.asarray(jw.decoder_apply(params, tokens, enc, cfg))

    cache = jw.init_cache(params, enc, cfg, max_len=8)
    prefill, cache = jw.decoder_apply(
        params, tokens[:, :4], enc, cfg, cache=cache, cache_index=0
    )
    np.testing.assert_allclose(np.asarray(prefill), full[:, :4], rtol=1e-4, atol=2e-4)
    step, cache = jw.decoder_apply(
        params, tokens[:, 4:5], enc, cfg, cache=cache, cache_index=4
    )
    np.testing.assert_allclose(np.asarray(step)[:, 0], full[:, 4], rtol=1e-4, atol=2e-4)


def test_hf_roundtrip_export(speech_pair):
    cfg, m, params = speech_pair
    sd = params_to_hf_state_dict(params, cfg, StemConfig("speech"))
    ref_sd = {k: v.numpy() for k, v in m.state_dict().items()}
    for k, v in ref_sd.items():
        assert k in sd, f"missing {k} in export"
        np.testing.assert_allclose(sd[k], v, rtol=1e-6, atol=1e-6, err_msg=k)


def test_npz_roundtrip(tmp_path, speech_pair):
    cfg, _, params = speech_pair
    p = str(tmp_path / "params.npz")
    save_npz(p, params)
    loaded = load_npz(p)
    import jax

    ref_leaves = jax.tree_util.tree_leaves(params)
    new_leaves = jax.tree_util.tree_leaves(loaded)
    assert len(ref_leaves) == len(new_leaves)
    for a, b in zip(ref_leaves, new_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_init_params_shapes_match_converted(speech_pair):
    import jax

    cfg, _, params = speech_pair
    rnd = init_params(jax.random.key(0), cfg, StemConfig("speech"))
    ref_paths = {
        "/".join(map(str, [getattr(k, "key", k) for k in kp])): leaf.shape
        for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    new_paths = {
        "/".join(map(str, [getattr(k, "key", k) for k in kp])): leaf.shape
        for kp, leaf in jax.tree_util.tree_flatten_with_path(rnd)[0]
    }
    assert ref_paths == new_paths


def test_sinusoids_match_hf(speech_pair):
    cfg, m, _ = speech_pair
    hf_pos = m.model.encoder.embed_positions.weight.detach().numpy()
    np.testing.assert_allclose(
        sinusoids(cfg.max_source_positions, cfg.d_model), hf_pos, rtol=1e-5, atol=1e-5
    )


def test_ce_loss_masking():
    import jax.numpy as jnp

    logits = np.zeros((1, 3, 5), np.float32)
    logits[0, 0, 2] = 10.0
    labels = np.array([[2, -100, -100]], np.int32)
    loss = float(jw.ce_loss(jnp.asarray(logits), jnp.asarray(labels)))
    assert loss < 0.01  # only the unmasked position counts


def test_premel_stem_geometry_and_grad():
    """'premel' stem (reference MyWhisperForConditionalGeneration,
    utils/load_model.py:1408-1521): ch -> mel pre-conv (k5,s2) feeding
    whisper's own conv1; total stride budget still 4x."""
    import jax
    import jax.numpy as jnp

    from neuspeech1_tpu.models.init import init_params

    cfg = small_cfg()
    stem = StemConfig("premel", in_channels=10)
    params = init_params(jax.random.key(0), cfg, stem)
    assert set(params["encoder"]["stem"]) == {"pre_conv", "conv1"}
    assert params["encoder"]["stem"]["pre_conv"]["w"].shape == (
        cfg.num_mel_bins, 10, 5)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 10, cfg.max_source_positions * 4)).astype(np.float32))
    out = jw.encoder_apply(params, x, cfg, stem)
    assert out.shape == (2, cfg.max_source_positions, cfg.d_model)
    # gradient flows to the pre-conv
    g = jax.grad(lambda p: jnp.sum(
        jw.encoder_apply(p, x, cfg, stem).astype(jnp.float32) ** 2
    ))(params)
    assert float(jnp.abs(g["encoder"]["stem"]["pre_conv"]["w"]).sum()) > 0
    # hf roundtrip naming
    from neuspeech1_tpu.models.convert import (
        params_from_hf_state_dict, params_to_hf_state_dict,
    )
    sd = params_to_hf_state_dict(params, cfg, stem)
    assert "pre_conv1.weight" in sd
    back = params_from_hf_state_dict(sd, cfg, stem)
    np.testing.assert_allclose(
        np.asarray(back["encoder"]["stem"]["pre_conv"]["w"]),
        np.asarray(params["encoder"]["stem"]["pre_conv"]["w"]), rtol=1e-6)
