"""Fast exact-form GELU for TPU.

Whisper uses exact (erf) GELU everywhere (HF `modeling_whisper` ACT2FN
'gelu'; reference vendored fork `utils/load_model.py` uses the same
activations). XLA's f32 `erf` lowers to a branchy rational with divides —
measured ~2.0 ms per encoder-MLP activation tensor at whisper-base bs64
([98304, 2048]; perf/mlp_probe.py: fc1+gelu+fc2 5.68 ms vs 3.69 for the
bare dots, while tanh/relu are free). With ~1.6G activation elements per
training step (6 encoder MLPs + 3 stem gelus + decoder), erf is a
double-digit-ms cost.

`gelu` here evaluates Phi via the Abramowitz-Stegun 7.1.26 erf form —
one reciprocal, one hardware exp, and a 5-term Horner ladder (~12 VPU ops
vs ~77 for XLA's erf at the measured rate):

    erf(z) ~= sign(z) * (1 - poly(t) * t * exp(-z^2)),  t = 1/(1 + p|z|)

max |err| 6.1e-7 over f32 (fit check in the unit test) — invisible at
bf16 activations (eps ~8e-3) and far inside the model-parity tolerance
(logits <=2e-4 vs HF torch, tests/test_model_parity.py, which exercise
THIS implementation end to end since it is the default everywhere).

The backward is the analytic gelu'(x) = Phi(x) + x*phi(x) via custom_jvp
(same form XLA's autodiff of exact gelu produces; phi uses the hardware
exp). NEUSPEECH_GELU=xla restores jax.nn.gelu for A/Bs.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_A1 = 0.254829592
_A2 = -0.284496736
_A3 = 1.421413741
_A4 = -1.453152027
_A5 = 1.061405429
_P = 0.3275911

_INV_SQRT2 = 0.7071067811865476
_INV_SQRT2PI = 0.3989422804014327


def erf_fast(z):
    """f32 erf via A&S 7.1.26 (max abs err ~6e-7). Computes in f32 and
    returns the input dtype."""
    dt = z.dtype
    z = z.astype(jnp.float32)
    za = jnp.abs(z)
    t = 1.0 / (1.0 + _P * za)
    poly = ((((_A5 * t + _A4) * t + _A3) * t + _A2) * t + _A1) * t
    r = 1.0 - poly * jnp.exp(-za * za)
    return jnp.where(z < 0, -r, r).astype(dt)


def _phi_cdf_f32(x32):
    """Standard normal CDF Phi(x) in f32 via erf_fast."""
    return 0.5 * (1.0 + erf_fast(x32 * _INV_SQRT2))


@jax.custom_jvp
def gelu(x):
    """Exact-form gelu(x) = x * Phi(x) with the fast erf; input dtype
    preserved, internals f32. NEUSPEECH_GELU=xla falls back to
    jax.nn.gelu(approximate=False)."""
    if os.environ.get("NEUSPEECH_GELU") == "xla":
        return jax.nn.gelu(x, approximate=False)
    x32 = x.astype(jnp.float32)
    return (x32 * _phi_cdf_f32(x32)).astype(x.dtype)


@gelu.defjvp
def _gelu_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    if os.environ.get("NEUSPEECH_GELU") == "xla":
        y, dy = jax.jvp(lambda v: jax.nn.gelu(v, approximate=False), (x,), (dx,))
        return y, dy
    x32 = x.astype(jnp.float32)
    cdf = _phi_cdf_f32(x32)
    pdf = _INV_SQRT2PI * jnp.exp(-0.5 * x32 * x32)
    y = (x32 * cdf).astype(x.dtype)
    dy = (dx.astype(jnp.float32) * (cdf + x32 * pdf)).astype(x.dtype)
    return y, dy
