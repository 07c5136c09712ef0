"""Fast exact-form GELU (ops/gelu.py) vs jax.nn.gelu(approximate=False).

The fast form is the DEFAULT activation everywhere (models/whisper.py), so
the HF model-parity suite exercises it end to end; this file pins the
elementwise contract directly.
"""
import jax
import jax.numpy as jnp
import numpy as np

from neuspeech1_tpu.ops.gelu import erf_fast, gelu


def test_erf_accuracy():
    z = jnp.asarray(np.linspace(-8, 8, 200_001), jnp.float32)
    ref = jax.lax.erf(z)
    err = np.abs(np.asarray(erf_fast(z)) - np.asarray(ref))
    assert err.max() < 1.5e-6, err.max()


def test_gelu_matches_exact_f32():
    x = jnp.asarray(np.linspace(-12, 12, 200_001), jnp.float32)
    ref = jax.nn.gelu(x, approximate=False)
    err = np.abs(np.asarray(gelu(x)) - np.asarray(ref))
    assert err.max() < 2e-6, err.max()


def test_gelu_grad_matches_exact():
    x = jnp.asarray(np.linspace(-8, 8, 20_001), jnp.float32)
    g_ref = jax.grad(lambda v: jnp.sum(jax.nn.gelu(v, approximate=False)))(x)
    g = jax.grad(lambda v: jnp.sum(gelu(v)))(x)
    err = np.abs(np.asarray(g) - np.asarray(g_ref))
    assert err.max() < 2e-6, err.max()


def test_gelu_preserves_dtype_and_bf16_exactness():
    x = jnp.asarray(np.linspace(-6, 6, 20_001), jnp.bfloat16)
    y = gelu(x)
    assert y.dtype == jnp.bfloat16
    # vs the f64 ground truth, the bf16 fast form must round-trip within
    # one bf16 ulp of the exact activation
    xf = np.asarray(x, np.float64)
    from scipy.special import erf as _erf

    ref = xf * 0.5 * (1 + _erf(xf / np.sqrt(2)))
    err = np.abs(np.asarray(y, np.float64) - ref)
    tol = np.maximum(np.abs(ref) * 1.6e-2, 1e-3)  # ~2 bf16 ulps
    assert (err <= tol).all()


def test_gelu_jittable_and_large_inputs_saturate():
    f = jax.jit(gelu)
    x = jnp.asarray([-50.0, -10.0, 0.0, 10.0, 50.0], jnp.float32)
    y = np.asarray(f(x))
    np.testing.assert_allclose(y[2], 0.0, atol=1e-7)
    np.testing.assert_allclose(y[3], 10.0, rtol=1e-6)
    np.testing.assert_allclose(y[4], 50.0, rtol=1e-6)
    np.testing.assert_allclose(y[0], 0.0, atol=1e-6)
