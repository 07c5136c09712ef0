"""Feature-level SpecAugment structure tests (reference
`utils/load_model.py:801-842` / HF `_compute_mask_indices` semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from neuspeech1_tpu.ops.augment import augment_batch_jnp, spec_augment


def _runs(row):
    """Lengths of consecutive True runs."""
    runs, n = [], 0
    for v in row:
        if v:
            n += 1
        elif n:
            runs.append(n)
            n = 0
    if n:
        runs.append(n)
    return runs


def test_time_masks_are_spans_of_mask_length():
    x = jnp.ones((4, 6, 200))
    out = np.asarray(spec_augment(
        jax.random.key(0), x, mask_time_prob=0.1, mask_time_length=10,
        mask_time_min_masks=2))
    for b in range(4):
        zero_t = (out[b] == 0).all(axis=0)  # whole channels column zeroed
        runs = _runs(zero_t)
        assert runs, "at least min_masks spans"
        # overlapping spans can merge; every run is >= mask_length
        assert all(r >= 10 for r in runs)
        # min_masks=2 -> at least 2*10 masked columns when spans distinct,
        # >= 10 if they fully overlap
        assert zero_t.sum() >= 10


def test_feature_masks_zero_whole_channels():
    x = jnp.ones((3, 64, 50))
    out = np.asarray(spec_augment(
        jax.random.key(1), x, mask_time_prob=0.0, mask_feature_prob=0.2,
        mask_feature_length=8, mask_feature_min_masks=1))
    for b in range(3):
        zero_c = (out[b] == 0).all(axis=1)
        assert zero_c.sum() >= 8
        assert all(r >= 8 for r in _runs(zero_c))


def test_expected_masked_fraction_tracks_hf():
    """Mean masked fraction ~ HF's num_spans*len/L (spans may overlap)."""
    x = jnp.ones((64, 4, 1000))
    out = np.asarray(spec_augment(
        jax.random.key(2), x, mask_time_prob=0.2, mask_time_length=10,
        mask_time_min_masks=0))
    frac = float((out == 0).mean())
    # expected ~0.2 minus overlap losses; generous band
    assert 0.12 < frac < 0.22


def test_disabled_is_identity_and_config_wiring():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 4, 100)),
                    jnp.float32)
    out = spec_augment(jax.random.key(0), x, mask_time_prob=0.0,
                       mask_feature_prob=0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))

    # augment_batch_jnp dispatches the "spec_augment" config section
    cfg = {"spec_augment": {"mask_time_prob": 1.0, "mask_time_length": 5,
                            "mask_time_min_masks": 1}}
    out2 = np.asarray(augment_batch_jnp(jax.random.key(1), x, cfg))
    assert (out2 == 0).any()

    # without the section nothing changes
    out3 = augment_batch_jnp(jax.random.key(1), x, {})
    np.testing.assert_array_equal(np.asarray(out3), np.asarray(x))


def test_jit_static_shapes():
    f = jax.jit(lambda k, x: spec_augment(k, x, mask_time_prob=0.1))
    x = jnp.ones((2, 4, 120))
    a = f(jax.random.key(0), x)
    b = f(jax.random.key(1), x)
    assert a.shape == b.shape == x.shape
