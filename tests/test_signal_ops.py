"""Numerical-op tests: robust scaling vs sklearn, mel vs transformers, augs."""

import numpy as np
import pytest

from neuspeech1_tpu.ops import audio as audio_ops
from neuspeech1_tpu.ops import augment as aug
from neuspeech1_tpu.ops import signal as sig_ops


def test_robust_scale_matches_sklearn(rng):
    from sklearn.preprocessing import RobustScaler

    x = rng.standard_normal((8, 400)) * 3 + 1.5
    ours = sig_ops.robust_scale(x, axis=-1)
    theirs = RobustScaler().fit_transform(x.T).T
    np.testing.assert_allclose(ours, theirs, rtol=1e-10, atol=1e-10)


def test_preprocess_eeg_parity(rng):
    """End-to-end parity with reference utils/utils.py:12-30 semantics."""
    from sklearn.preprocessing import RobustScaler

    x = rng.standard_normal((6, 1200)) * 5
    ours, ratio = sig_ops.preprocess_eeg_data(x, threshold=10)
    ref = x - x[:, :500].mean(axis=1, keepdims=True)
    ref = RobustScaler().fit_transform(ref.T).T
    clipped = np.abs(ref) > 10
    ref_ratio = clipped.sum() / ref.size
    ref = np.clip(ref, -10, 10) / 10
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)
    assert ratio == pytest.approx(ref_ratio)
    assert np.abs(ours).max() <= 1.0


def test_gaussian_noise_snr(rng):
    x = np.sin(np.linspace(0, 100, 4000))[None, :].repeat(4, 0).astype(np.float32)
    noisy = sig_ops.add_gaussian_noise(x, (20.0, 20.0), rng=rng)
    noise = noisy - x  # correct single-addition (reference adds signal twice)
    snr_db = 10 * np.log10(np.mean(x**2) / np.mean(noise**2))
    assert 18.0 < snr_db < 22.0


def test_filters_basic(rng):
    t = np.arange(2000) / 200.0
    x = np.sin(2 * np.pi * 5 * t) + np.sin(2 * np.pi * 80 * t)
    y = sig_ops.bandpass_filter(x[None, :], 1.0, 30.0, 200.0)[0]
    # 80 Hz component removed, 5 Hz kept
    spec = np.abs(np.fft.rfft(y))
    freqs = np.fft.rfftfreq(len(y), 1 / 200.0)
    assert spec[np.argmin(abs(freqs - 80))] < 0.05 * spec[np.argmin(abs(freqs - 5))]
    z = sig_ops.notch_filter(x[None, :], 50.0, 200.0)[0]
    assert np.isfinite(z).all()
    r = sig_ops.resample(x, 200, 100)
    assert r.shape[0] == 1000


def test_mel_parity_with_transformers():
    """Our log-mel must match WhisperFeatureExtractor (which is what the
    reference's processor computes, `utils/reader.py:466`)."""
    from transformers import WhisperFeatureExtractor

    fe = WhisperFeatureExtractor()  # offline default = whisper mel frontend
    rng = np.random.default_rng(0)
    audio = (0.1 * rng.standard_normal(16000 * 2)).astype(np.float32)
    theirs = fe(audio, sampling_rate=16000, return_tensors="np").input_features[0]
    ours = audio_ops.log_mel_spectrogram(audio)
    assert ours.shape == theirs.shape == (80, 3000)
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


def test_mel_jnp_matches_numpy():
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    audio = (0.1 * rng.standard_normal(16000)).astype(np.float32)
    ours_np = audio_ops.log_mel_spectrogram(audio)
    padded = audio_ops.pad_or_trim(audio)[None, :]
    ours_jnp = np.asarray(audio_ops.log_mel_spectrogram_jnp(jnp.asarray(padded))[0])
    np.testing.assert_allclose(ours_np, ours_jnp, rtol=1e-3, atol=1e-4)


def test_block_mask_grid(rng):
    m = aug.block_mask((8, 120), unit=(2, 40), keep_prob_threshold=0.5, rng=rng)
    assert m.shape == (8, 120)
    assert set(np.unique(m)) <= {0.0, 1.0}
    # constant within each (2, 40) block
    blocks = m.reshape(4, 2, 3, 40)
    assert (blocks.min(axis=(1, 3)) == blocks.max(axis=(1, 3))).all()


def test_channel_and_length_masks(rng):
    cm = aug.channel_mask((16, 50), low=3, high=3, rng=rng)
    assert (cm.sum(axis=1) == 0).sum() == 3
    lm = aug.length_mask((4, 100), unit_length=20, prob_range=(0.5, 0.5), rng=rng)
    assert lm.shape == (4, 100)
    assert (lm[0] == lm[3]).all()  # same mask across channels


def test_random_shape_masker_types(rng):
    shape = (8, 80)
    m2 = aug.RandomShapeMasker(unit=(1, 20), mask_prob=0.5, random_type=2)(shape, rng)
    # time masking: whole channel columns share mask
    assert (m2.min(axis=0) == m2.max(axis=0)).all()
    m3 = aug.RandomShapeMasker(unit=(2, 20), mask_prob=0.5, random_type=3)(shape, rng)
    assert (m3.min(axis=1) == m3.max(axis=1)).all()


def test_shift_and_taylor(rng):
    x = np.ones((3, 10), np.float32)
    s = aug.shift_data(x, 4)
    assert s.shape == (3, 14)
    assert (s[:, :4] == 0).all()
    t = aug.taylor_trim(np.ones((2, 50)), rng=rng)
    assert (t[:, 0] == 0).all() and (t[:, -1] == 0).all()


def test_augment_batch_jnp(rng):
    import jax
    import jax.numpy as jnp

    cfg = {
        "noise": {"prob": 1.0, "min_snr_dB": 20, "max_snr_dB": 40},
        "mask": {"prob": 1.0, "kwargs": {"unit": [1, 40], "mask_prob": 0.25}},
        "taylor": {"prob": 1.0},
    }
    batch = jnp.asarray(rng.standard_normal((2, 8, 200)).astype(np.float32))
    fn = jax.jit(lambda k, b: aug.augment_batch_jnp(k, b, cfg))
    out = fn(jax.random.key(0), batch)
    assert out.shape == batch.shape
    assert not np.allclose(out, batch)
    # taylor trims ends
    assert (np.asarray(out)[:, :, 0] == 0).all()


def test_augment_batch_jnp_per_sample_probability(rng):
    """prob=0.5 must apply noise per-sample (≈half the batch changes)."""
    import jax
    import jax.numpy as jnp

    cfg = {"noise": {"prob": 0.5, "min_snr_dB": 5, "max_snr_dB": 10}}
    batch = jnp.asarray(rng.standard_normal((64, 4, 100)).astype(np.float32))
    out = aug.augment_batch_jnp(jax.random.key(3), batch, cfg)
    changed = np.any(np.asarray(out) != np.asarray(batch), axis=(1, 2))
    assert 10 < changed.sum() < 54  # loose binomial bounds for n=64, p=.5
