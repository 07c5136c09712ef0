"""The unfold-matmul conv lowering must match XLA's native conv exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuspeech1_tpu.models import whisper as jw


@pytest.mark.parametrize("impl", ["unfold", "matmul"])
@pytest.mark.parametrize("stride,padding,k", [(1, 1, 3), (2, 1, 3), (2, 2, 5)])
def test_alt_lowering_matches_native_conv(impl, stride, padding, k):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 40, 6)).astype(np.float32))
    p = {
        "w": jnp.asarray(rng.standard_normal((8, 6, k)).astype(np.float32)),
        "b": jnp.asarray(rng.standard_normal((8,)).astype(np.float32)),
    }
    jw.set_conv_cl_impl("conv")
    ref = jw.conv1d_cl(x, p, stride=stride, padding=padding)
    jw.set_conv_cl_impl(impl)
    try:
        got = jw.conv1d_cl(x, p, stride=stride, padding=padding)
    finally:
        jw.set_conv_cl_impl("conv")
    assert ref.shape == got.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("impl", ["unfold", "matmul"])
def test_alt_lowering_gradients_match(impl):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 20, 4)).astype(np.float32))
    p = {
        "w": jnp.asarray(rng.standard_normal((5, 4, 3)).astype(np.float32)),
        "b": jnp.zeros((5,), jnp.float32),
    }

    def loss(w, impl):
        jw.set_conv_cl_impl(impl)
        try:
            return jnp.sum(jw.conv1d_cl(x, {"w": w, "b": p["b"]}, stride=2) ** 2)
        finally:
            jw.set_conv_cl_impl("conv")

    g_ref = jax.grad(lambda w: loss(w, "conv"))(p["w"])
    g_new = jax.grad(lambda w: loss(w, impl))(p["w"])
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)
