"""folded_linear (low-rank-only backward) vs autodiff through merge_lora.

The fold_lora training path runs adapted linears as ONE dot against
W_eff = W + s*A(Em)B with a custom backward that produces dA/dB/dE from
narrow rank-r dots (models/lora.py::folded_linear) — these tests pin it to
the mathematically-identical autodiff-through-merge gradients, and the
train step built with NEUSPEECH_FOLD_IMPL=linear to the round-2 'merge'
implementation.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neuspeech1_tpu.models.lora import folded_linear


def _entry(rng, din, dout, r, adalora):
    e = {
        "A": jnp.asarray(rng.standard_normal((din, r)) * 0.1, jnp.float32),
        "B": jnp.asarray(rng.standard_normal((r, dout)) * 0.1, jnp.float32),
        "alpha": jnp.asarray([[2.0 * r]], jnp.float32),
    }
    if adalora:
        e["E"] = jnp.asarray(rng.standard_normal((r, 1)) * 0.5, jnp.float32)
        e["mask"] = jnp.ones((r, 1), jnp.float32)
    return e


def _merge_form(x, p, entry):
    a = entry["A"]
    if "E" in entry:
        a = a * entry["E"][..., 0][None, :]
    scale = jax.lax.stop_gradient(entry["alpha"]).reshape(()) / a.shape[-1]
    w_eff = (p["w"] + (a @ entry["B"]) * scale).astype(x.dtype)
    y = jnp.dot(x, w_eff)
    if p.get("b") is not None:
        y = y + p["b"].astype(x.dtype)
    return y


@pytest.mark.parametrize("adalora", [False, True])
@pytest.mark.parametrize("bias", [True, False])
def test_folded_linear_matches_merge_form(adalora, bias):
    rng = np.random.default_rng(0)
    din, dout, r = 16, 24, 4
    x = jnp.asarray(rng.standard_normal((3, 5, din)), jnp.float32)
    p = {"w": jnp.asarray(rng.standard_normal((din, dout)) * 0.2, jnp.float32),
         "b": (jnp.asarray(rng.standard_normal((dout,)), jnp.float32)
               if bias else None)}
    entry = _entry(rng, din, dout, r, adalora)

    y_f = folded_linear(x, p, entry)
    y_m = _merge_form(x, p, entry)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_m), atol=1e-5)

    def loss_f(x, entry):
        return jnp.sum(jnp.sin(folded_linear(x, p, entry)))

    def loss_m(x, entry):
        return jnp.sum(jnp.sin(_merge_form(x, p, entry)))

    gx_f, ge_f = jax.grad(loss_f, argnums=(0, 1))(x, entry)
    gx_m, ge_m = jax.grad(loss_m, argnums=(0, 1))(x, entry)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_m), atol=2e-5)
    for k in ("A", "B") + (("E",) if adalora else ()):
        np.testing.assert_allclose(
            np.asarray(ge_f[k]), np.asarray(ge_m[k]), atol=2e-5,
            err_msg=k)
    # hyper-parameter leaves keep exact-zero grads
    assert float(jnp.abs(ge_f["alpha"]).max()) == 0.0
    if adalora:
        assert float(jnp.abs(ge_f["mask"]).max()) == 0.0


def test_lora_adapter_bwd_kernel_matches_einsum():
    """ops/lora_bwd.py fused kernel (interpret mode) vs the einsum form."""
    from neuspeech1_tpu.ops.lora_bwd import lora_adapter_bwd, lora_bwd_available

    rng = np.random.default_rng(7)
    n, din, dout, r = 2048, 128, 256, 32
    assert lora_bwd_available(n, din, dout, r)
    x = jnp.asarray(rng.standard_normal((n, din)), jnp.float32)
    dy = jnp.asarray(rng.standard_normal((n, dout)), jnp.float32)
    a = jnp.asarray(rng.standard_normal((din, r)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((r, dout)) * 0.1, jnp.float32)
    da, db, de = lora_adapter_bwd(x, dy, a, b, interpret=True)
    t1 = dy @ b.T
    u = x @ a
    np.testing.assert_allclose(np.asarray(da), np.asarray(x.T @ t1),
                               rtol=2e-5, atol=2e-3)
    np.testing.assert_allclose(np.asarray(db), np.asarray(u.T @ dy),
                               rtol=2e-5, atol=2e-3)
    np.testing.assert_allclose(np.asarray(de), np.asarray((u * t1).sum(0)),
                               rtol=2e-5, atol=2e-3)
    # shape gate rejects non-divisible token counts and non-lane dims
    assert not lora_bwd_available(2049, din, dout, r)
    assert not lora_bwd_available(n, 96, dout, r)


@pytest.mark.parametrize("adalora", [False, True])
def test_train_step_linear_fold_matches_merge_fold(adalora, monkeypatch):
    from neuspeech1_tpu.config import StemConfig, tiny_config
    from neuspeech1_tpu.models.init import init_params
    from neuspeech1_tpu.models.lora import init_lora
    from neuspeech1_tpu.train import optimizer as opt
    from neuspeech1_tpu.train import trainstep as ts

    config = tiny_config()
    stem = StemConfig("base", in_channels=4)
    rng = np.random.default_rng(1)
    t_in = config.max_source_positions * 4
    batch = {
        "input_features": jnp.asarray(
            rng.standard_normal((2, 4, t_in)), jnp.float32),
        "labels": jnp.asarray(
            rng.integers(0, config.vocab_size, (2, 8)), jnp.int32),
        "decoder_input_ids": jnp.asarray(
            rng.integers(0, config.vocab_size, (2, 8)), jnp.int32),
    }

    def run(impl):
        monkeypatch.setenv("NEUSPEECH_FOLD_IMPL", impl)
        params = init_params(jax.random.key(0), config, stem)
        lora = init_lora(jax.random.key(1), config, rank=4, alpha=8,
                         adalora=adalora)
        # B starts at zero (PEFT); perturb so dA has signal
        lora = jax.tree_util.tree_map(
            lambda v: v + 0.01 * np.float32(1.0), lora)
        tx = opt.make_optimizer(peak_lr=1e-3, warmup_steps=2, total_steps=10)
        state, frozen = ts.init_train_state(
            jax.random.key(2), params, lora, tx, opt.default_trainable_pred())
        step = ts.make_train_step(config, stem, tx, fold_lora=True,
                                  donate=False)
        state, m = step(state, frozen, batch)
        state, m = step(state, frozen, batch)
        return state, m

    s_lin, m_lin = run("linear")
    s_fc, m_fc = run("fc")
    s_mrg, m_mrg = run("merge")
    np.testing.assert_allclose(float(m_lin["loss"]), float(m_mrg["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m_fc["loss"]), float(m_mrg["loss"]),
                               rtol=1e-5)
    for (p1, l1), (p2, l2), (p3, l3) in zip(
        jax.tree_util.tree_leaves_with_path(s_lin.trainable),
        jax.tree_util.tree_leaves_with_path(s_mrg.trainable),
        jax.tree_util.tree_leaves_with_path(s_fc.trainable),
    ):
        assert p1 == p2 == p3
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                   atol=3e-5, err_msg=str(p1))
        np.testing.assert_allclose(np.asarray(l3), np.asarray(l2),
                                   atol=3e-5, err_msg=str(p1))
