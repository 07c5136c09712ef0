"""EEG/MEG augmentation ops.

Two tiers:
  * numpy per-item ops — parity with reference `utils/augment_eeg.py` and the
    dispatch in `utils/reader.py:552-594`; used by the CPU data pipeline.
  * jnp batched ops — jittable, keyed by `jax.random`, applied on-device to a
    whole [B, ch, T] batch (a TPU-side win over the reference's per-item CPU
    augmentation).

Augment config schema (reference `configs/augmentation1.json`):
    {"noise": {"prob": p, "min_snr_dB": a, "max_snr_dB": b},
     "mask":  {"prob": p, "kwargs": {"unit": [cu, tu], "mask_prob": q,
                                      "random_type": 1|2|3}},
     "shift": {"prob": p},
     "taylor": {"prob": p}}
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np

from neuspeech1_tpu.ops.signal import add_gaussian_noise


# --------------------------------------------------------------------------
# numpy tier
# --------------------------------------------------------------------------

def block_mask(
    shape: Tuple[int, int],
    unit: Tuple[int, int] = (1, 40),
    keep_prob_threshold: float = 0.5,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Random block mask on a (ch_unit, time_unit) grid.

    Parity with `random_discrete_only_mask` (`utils/augment_eeg.py:15-26`):
    a uniform sample per grid cell; cells with value >= threshold are kept
    (1), the rest zeroed, then the grid is nearest-neighbor upsampled to
    ``shape``.
    """
    rng = rng or np.random.default_rng()
    ch, t = shape
    grid_t = math.ceil(t / unit[1])
    grid_c = math.ceil(ch / unit[0])
    pre = (rng.random((grid_c, grid_t)) >= keep_prob_threshold).astype(np.float32)
    pre = np.repeat(pre, math.ceil(ch / grid_c), axis=0)
    pre = np.repeat(pre, math.ceil(t / grid_t), axis=1)
    return pre[:ch, :t]


def channel_mask(
    shape: Tuple[int, int],
    low: int = 1,
    high: int = 32,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Zero a random subset of channels (`utils/augment_eeg.py:29-39`)."""
    rng = rng or np.random.default_rng()
    n = int(rng.integers(low, high + 1))
    chans = rng.permutation(shape[0])[:n]
    mask = np.ones(shape, dtype=np.float32)
    mask[chans, :] = 0.0
    return mask


def length_mask(
    shape: Tuple[int, int],
    unit_length: int = 40,
    prob_range: Tuple[float, float] = (0.2, 0.8),
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Zero random time blocks across all channels
    (`utils/augment_eeg.py:42-51`)."""
    rng = rng or np.random.default_rng()
    prob = rng.uniform(*prob_range)
    grid_t = math.ceil(shape[1] / unit_length)
    pre = (rng.random((1, grid_t)) >= prob).astype(np.float32)
    pre = np.repeat(pre, shape[0], axis=0)
    pre = np.repeat(pre, unit_length, axis=1)
    return pre[:, : shape[1]]


class RandomShapeMasker:
    """Parity with reference `utils/augment_eeg.py:81-98`.

    random_type: 1 = block mask, 2 = time mask (unit spans all channels),
    3 = channel mask (unit spans full time).
    """

    def __init__(self, unit=(1, 40), mask_prob: float = 0.25, random_type: int = 1):
        self.unit = list(unit)
        self.mask_prob = mask_prob
        self.random_type = random_type

    def __call__(self, shape, rng: Optional[np.random.Generator] = None):
        unit = list(self.unit)
        if self.random_type == 2:
            unit[0] = shape[0]
        elif self.random_type == 3:
            unit[1] = shape[1]
        elif self.random_type != 1:
            raise NotImplementedError(self.random_type)
        return block_mask(shape, unit=tuple(unit), keep_prob_threshold=self.mask_prob, rng=rng)


def shift_data(eeg: np.ndarray, shift: int) -> np.ndarray:
    """Left zero-pad (delays the signal); `utils/augment_eeg.py:54-56`."""
    return np.pad(eeg, [[0, 0], [shift, 0]])


def taylor_trim(
    sample: np.ndarray, max_points: int = 10, rng: Optional[np.random.Generator] = None
) -> np.ndarray:
    """Zero 1..max_points-1 samples at each end (reference 'taylor' aug,
    `utils/reader.py:581-591`)."""
    rng = rng or np.random.default_rng()
    out = sample.copy()
    n0 = int(rng.integers(1, max_points))
    n1 = int(rng.integers(1, max_points))
    out[:, :n0] = 0
    out[:, -n1:] = 0
    return out


def augment_sample(
    sample: np.ndarray,
    config: Optional[dict],
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Per-item dispatch, parity with `utils/reader.py:552-594` (eeg modal)."""
    if not config:
        return sample
    rng = rng or np.random.default_rng()
    if "noise" in config and rng.random() < config["noise"]["prob"]:
        sample = add_gaussian_noise(
            sample,
            (config["noise"]["min_snr_dB"], config["noise"]["max_snr_dB"]),
            rng=rng,
        )
    if "mask" in config and rng.random() < config["mask"]["prob"]:
        masker = RandomShapeMasker(**config["mask"].get("kwargs", {}))
        sample = sample * masker(sample.shape, rng=rng)
    if "taylor" in config and rng.random() < config["taylor"]["prob"]:
        sample = taylor_trim(sample, rng=rng)
    return sample


# --------------------------------------------------------------------------
# jnp tier — batched, jittable
# --------------------------------------------------------------------------

def augment_batch_jnp(key, batch, config: Optional[dict]):
    """Apply noise/mask/taylor to a [B, ch, T] batch on-device.

    ``config`` uses the same schema as the numpy tier; probabilities are
    resolved per-sample. Static under jit as long as ``config`` is constant.
    """
    import jax
    import jax.numpy as jnp

    if not config:
        return batch

    b, ch, t = batch.shape

    if "noise" in config and config["noise"]["prob"] > 0:
        key, k_apply, k_snr, k_noise = jax.random.split(key, 4)
        apply = jax.random.uniform(k_apply, (b, 1, 1)) < config["noise"]["prob"]
        snr = jax.random.uniform(
            k_snr,
            (b, ch, 1),
            minval=config["noise"]["min_snr_dB"],
            maxval=config["noise"]["max_snr_dB"],
        )
        power = jnp.mean(batch**2, axis=-1, keepdims=True)
        noise_std = jnp.sqrt(power / (10.0 ** (snr / 10.0)))
        noise = jax.random.normal(k_noise, batch.shape) * noise_std
        batch = jnp.where(apply, batch + noise, batch)

    if "mask" in config and config["mask"]["prob"] > 0:
        kwargs = config["mask"].get("kwargs", {})
        unit = list(kwargs.get("unit", (1, 40)))
        mask_prob = kwargs.get("mask_prob", 0.25)
        rtype = kwargs.get("random_type", 1)
        if rtype == 2:
            unit[0] = ch
        elif rtype == 3:
            unit[1] = t
        grid_c = -(-ch // unit[0])
        grid_t = -(-t // unit[1])
        key, k_apply, k_grid = jax.random.split(key, 3)
        apply = jax.random.uniform(k_apply, (b, 1, 1)) < config["mask"]["prob"]
        grid = (jax.random.uniform(k_grid, (b, grid_c, grid_t)) >= mask_prob).astype(
            batch.dtype
        )
        mask = jnp.repeat(jnp.repeat(grid, -(-ch // grid_c), axis=1), -(-t // grid_t), axis=2)[
            :, :ch, :t
        ]
        batch = jnp.where(apply, batch * mask, batch)

    if "taylor" in config and config["taylor"]["prob"] > 0:
        key, k_apply, k_n0, k_n1 = jax.random.split(key, 4)
        apply = jax.random.uniform(k_apply, (b, 1, 1)) < config["taylor"]["prob"]
        n0 = jax.random.randint(k_n0, (b, 1, 1), 1, 10)
        n1 = jax.random.randint(k_n1, (b, 1, 1), 1, 10)
        idx = jnp.arange(t)[None, None, :]
        keep = (idx >= n0) & (idx < t - n1)
        batch = jnp.where(apply & ~keep, 0.0, batch)

    if "spec_augment" in config:
        key, k_spec = jax.random.split(key)
        batch = spec_augment(k_spec, batch, **config["spec_augment"])

    return batch


def _span_mask(key, b: int, length: int, mask_prob: float, mask_length: int,
               min_masks: int):
    """[b, length] bool span mask, SpecAugment-style (HF wav2vec2
    `_compute_mask_indices` semantics: expected span count
    mask_prob·L/len with probabilistic rounding, ≥ min_masks, spans of
    exactly mask_length, clipped to the sequence).

    Jit-friendly divergence from HF (documented in PARITY.md): span starts
    are sampled WITH replacement (HF samples without), so spans may overlap
    slightly more often; the expected masked fraction is unchanged.
    """
    import jax
    import jax.numpy as jnp

    if mask_length < 1 or length < mask_length:
        return jnp.zeros((b, length), bool)
    raw = mask_prob * length / mask_length
    n_full = int(raw)
    frac = raw - n_full
    n_max = max(n_full + 1, min_masks)
    # cap like HF: num_spans * mask_length <= length
    n_max = min(n_max, length // mask_length)
    if n_max == 0:
        return jnp.zeros((b, length), bool)
    k_start, k_eps = jax.random.split(key)
    starts = jax.random.randint(
        k_start, (b, n_max), 0, length - mask_length + 1
    )
    # span i active if i < num_spans, where num_spans = n_full + (U < frac),
    # floored at min_masks (HF: int(prob·L/len + eps) with one eps per call)
    eps = jax.random.uniform(k_eps, ())
    num = jnp.maximum(n_full + (eps < frac).astype(jnp.int32), min_masks)
    num = jnp.minimum(num, n_max)
    active = jnp.arange(n_max)[None, :] < num  # [1, n_max]
    idx = jnp.arange(length)[None, None, :]
    spans = (idx >= starts[..., None]) & (idx < starts[..., None] + mask_length)
    return jnp.any(spans & active[..., None], axis=1)


def spec_augment(
    key,
    batch,
    mask_time_prob: float = 0.05,
    mask_time_length: int = 10,
    mask_time_min_masks: int = 2,
    mask_feature_prob: float = 0.0,
    mask_feature_length: int = 10,
    mask_feature_min_masks: int = 0,
):
    """Feature-level SpecAugment on the [B, ch, T] input tensor — the
    operator the reference applies in `WhisperModel.forward`
    (`utils/load_model.py:801-842` → HF `_compute_mask_indices`): zero
    random time spans and/or feature(channel) spans. Defaults mirror HF
    whisper's config defaults; the reference ships it disabled
    (apply_spec_augment=False), so this is opt-in via the augment config's
    "spec_augment" section."""
    import jax
    import jax.numpy as jnp

    b, ch, t = batch.shape
    k_time, k_feat = jax.random.split(key)
    if mask_time_prob > 0:
        tm = _span_mask(k_time, b, t, mask_time_prob, mask_time_length,
                        mask_time_min_masks)
        batch = jnp.where(tm[:, None, :], 0.0, batch)
    if mask_feature_prob > 0:
        fm = _span_mask(k_feat, b, ch, mask_feature_prob, mask_feature_length,
                        mask_feature_min_masks)
        batch = jnp.where(fm[:, :, None], 0.0, batch)
    return batch
