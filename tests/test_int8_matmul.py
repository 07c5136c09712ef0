"""AQT-style int8 training matmuls (ops/int8_matmul) — quantization
exactness vs a numpy gold, straight-through gradient contracts, folded-LoRA
integration, and a tiny train-step convergence smoke."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neuspeech1_tpu.ops import int8_matmul as i8


def np_quant(v, axis):
    a = np.max(np.abs(v.astype(np.float32)), axis=axis, keepdims=True)
    s = np.where(a > 0, a / 127.0, 1.0)
    # jnp.round rounds half-to-even, match with np.round
    q = np.round(v.astype(np.float32) / s).astype(np.int8)
    return q, s


def np_qdot(x2, w):
    xq, xs = np_quant(x2, 1)
    wq, ws = np_quant(w, 0)
    y = xq.astype(np.int32) @ wq.astype(np.int32)
    return y.astype(np.float32) * xs * ws


def test_quantized_dot_matches_numpy_gold():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((6, 32)).astype(np.float32) * 3.0
    w = rng.standard_normal((32, 16)).astype(np.float32)
    ours = np.asarray(i8.quantized_dot(jnp.asarray(x), jnp.asarray(w),
                                       m="fwd"))
    gold = np_qdot(x, w)
    np.testing.assert_allclose(ours, gold, rtol=1e-6, atol=1e-6)
    # and the quantized result is close to the exact product (int8 noise)
    exact = x @ w
    err = np.abs(ours - exact) / (np.abs(exact).mean() + 1e-9)
    assert err.mean() < 0.02, err.mean()


def test_quantized_dot_batched_shape():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 5, 8)).astype(np.float32)
    w = rng.standard_normal((8, 12)).astype(np.float32)
    y = np.asarray(i8.quantized_dot(jnp.asarray(x), jnp.asarray(w), m="fwd"))
    assert y.shape == (2, 5, 12)
    np.testing.assert_allclose(y, np_qdot(x.reshape(10, 8), w).reshape(2, 5, 12),
                               rtol=1e-6, atol=1e-6)


def test_zero_rows_are_exact():
    x = jnp.zeros((3, 8), jnp.float32)
    w = jnp.ones((8, 4), jnp.float32)
    np.testing.assert_array_equal(np.asarray(i8.quantized_dot(x, w, m="fwd")),
                                  np.zeros((3, 4), np.float32))


def test_fwd_mode_gradients_are_exact_ste():
    """'fwd': the backward differentiates the EXACT dot (straight-through):
    dx == dy @ w^T, dw == x^T @ dy, independent of the quantized forward."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((8, 6)).astype(np.float32))
    dy = jnp.asarray(rng.standard_normal((4, 6)).astype(np.float32))

    def f(x, w):
        return jnp.vdot(i8.quantized_dot(x, w, m="fwd"), dy)

    dx, dw = jax.grad(f, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dy @ w.T),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(x.T @ dy),
                               rtol=1e-6, atol=1e-6)


def test_full_mode_gradients_match_numpy_gold():
    """'full': dx = qdot(dy, w^T), dw = qdot(x^T, dy) with the same
    per-contraction-vector quantization."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((4, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((8, 6)).astype(np.float32))
    dyn = rng.standard_normal((4, 6)).astype(np.float32)
    dy = jnp.asarray(dyn)

    def f(x, w):
        return jnp.vdot(i8.quantized_dot(x, w, m="full"), dy)

    dx, dw = jax.grad(f, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(dx),
                               np_qdot(dyn, np.asarray(w).T),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dw),
                               np_qdot(np.asarray(x).T, dyn),
                               rtol=1e-5, atol=1e-5)


def test_linear_routes_through_int8_mode():
    from neuspeech1_tpu.models import whisper as jw

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((3, 8)).astype(np.float32))
    p = {"w": jnp.asarray(rng.standard_normal((8, 5)).astype(np.float32)),
         "b": jnp.zeros((5,), jnp.float32)}
    exact = np.asarray(jw.linear(x, p))
    with i8.int8_mode("fwd"):
        q = np.asarray(jw.linear(x, p))
    assert not np.array_equal(q, exact)  # quantization visible
    np.testing.assert_allclose(q, np_qdot(np.asarray(x), np.asarray(p["w"])),
                               rtol=1e-6, atol=1e-6)
    # outside the context the exact path is restored
    np.testing.assert_array_equal(np.asarray(jw.linear(x, p)), exact)


def test_folded_linear_int8_fwd_grads_match_exact():
    """Under 'fwd', folded_linear's adapter grads are computed from the
    SAME (x, dy) as the exact path — identical for a single layer."""
    from neuspeech1_tpu.models.lora import folded_linear

    rng = np.random.default_rng(5)
    din, dout, r, n = 16, 12, 4, 8
    x = jnp.asarray(rng.standard_normal((n, din)).astype(np.float32))
    p = {"w": jnp.asarray(rng.standard_normal((din, dout)).astype(np.float32)),
         "b": jnp.zeros((dout,), jnp.float32)}
    entry = {
        "A": jnp.asarray(rng.standard_normal((din, r)).astype(np.float32) * 0.1),
        "B": jnp.asarray(rng.standard_normal((r, dout)).astype(np.float32) * 0.1),
        "alpha": jnp.asarray([[8.0]], jnp.float32),
    }

    def loss(entry, mode):
        with i8.int8_mode(mode):
            y = folded_linear(x, p, entry)
        return jnp.sum(y * y) * 0.5  # dy = y depends on the fwd — use sum
    def loss_lin(entry, mode):
        with i8.int8_mode(mode):
            y = folded_linear(x, p, entry)
        return jnp.sum(y)

    g_exact = jax.grad(loss_lin)(entry, "off")
    g_fwd = jax.grad(loss_lin)(entry, "fwd")
    # dy = ones: adapter grads use (x, dy) only -> identical in 'fwd'
    np.testing.assert_allclose(np.asarray(g_fwd["A"]),
                               np.asarray(g_exact["A"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_fwd["B"]),
                               np.asarray(g_exact["B"]), rtol=1e-6)


@pytest.mark.parametrize("mode", ["fwd", "full"])
def test_train_step_int8_converges(mode):
    """Tiny overfit: the int8 train step drives the loss down and stays
    within the same ballpark as the exact step."""
    from neuspeech1_tpu.config import StemConfig, WhisperConfig
    from neuspeech1_tpu.models.init import init_params
    from neuspeech1_tpu.models.lora import init_lora
    from neuspeech1_tpu.train import optimizer as opt
    from neuspeech1_tpu.train import trainstep as ts

    layout = WhisperConfig.layout_for_vocab(64)
    config = WhisperConfig(
        num_mel_bins=8, d_model=32, encoder_layers=1, decoder_layers=1,
        encoder_heads=2, decoder_heads=2, encoder_ffn=64, decoder_ffn=64,
        max_source_positions=16, max_target_positions=12, dtype="float32",
        **layout,
    )
    stem = StemConfig("base", in_channels=4)
    rng = np.random.default_rng(0)
    batch = {
        "input_features": jnp.asarray(
            rng.standard_normal((4, 4, 64)).astype(np.float32)),
        "labels": jnp.asarray(rng.integers(0, 50, (4, 8)).astype(np.int32)),
        "decoder_input_ids": jnp.asarray(
            rng.integers(0, 50, (4, 8)).astype(np.int32)),
    }

    def run(int8):
        params = init_params(jax.random.key(0), config, stem)
        lora = init_lora(jax.random.key(1), config, rank=4, alpha=8)
        tx = opt.make_optimizer(peak_lr=3e-3, warmup_steps=1, total_steps=60)
        state, frozen = ts.init_train_state(
            jax.random.key(2), params, lora, tx, opt.default_trainable_pred())
        step = ts.make_train_step(config, stem, tx, fold_lora=True,
                                  int8_matmul=int8)
        first = last = None
        for _ in range(30):
            state, m = step(state, frozen, batch)
            last = float(m["loss"])
            if first is None:
                first = last
        return first, last

    f_q, l_q = run(mode)
    assert np.isfinite(l_q)
    assert l_q < f_q, (f_q, l_q)  # decreasing
    f_e, l_e = run("off")
    # the int8 trajectory tracks the exact one within quantization noise
    # (measured: identical to 3 decimals on this task — LoRA-only barely
    # learns here, so the meaningful gate is trajectory fidelity, and the
    # full-scale convergence gate is the on-chip drive in BASELINE.md)
    assert abs(f_q - f_e) / f_e < 0.05, (f_q, f_e)
    assert abs(l_q - l_e) / l_e < 0.02, (l_q, l_e)
