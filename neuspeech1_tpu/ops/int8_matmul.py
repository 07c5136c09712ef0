"""AQT-style int8 quantized matmul for training (opt-in).

v5e's int8 MXU runs at ~2x the bf16 rate — the one physics lever left
past the measured bf16 ceiling (BASELINE.md "North-star reconciliation").
This implements dynamic symmetric per-vector int8 quantization along the
contraction axis of a dot, the standard AQT int8-training recipe:

    y = (q(x) @ q(w)) * sx * sw        q(v) = round(v * 127 / absmax(v))

with absmax taken per contraction vector (per x row, per w column), the
integer product accumulated in int32 on the MXU, and the scales applied
as a rank-1 outer product on the way out. Gradients use the
straight-through estimator: the backward differentiates the EXACT dot
(d/dx [x@w] = dy @ w^T), optionally itself computed with quantized
operands ('full' mode) — quantizing dy along its contraction axis the
same way.

Reference axis: SURVEY §2 quantization row — the reference's optional
`load_in_8bit` path (`finetune.py:128,171`) is bitsandbytes weight-only
int8 for CUDA; this is the TPU-native training-compute analog (the
serving-side weight-only path lives in `models/quantize.py`).

Modes (see `set_mode` / trainstep's `int8_matmul` arg):
  'off'  — exact bf16 dots (default).
  'fwd'  — forward dots quantized; backward dx/dw exact bf16.
  'full' — forward AND backward dots quantized (dx = q(dy) @ q(w^T),
           dw = q(x^T) @ q(dy)); the full 2x-rate surface.
"""

from __future__ import annotations

import contextlib
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

_MODE = ["off"]  # trace-time switch, entered by train.trainstep


def mode() -> str:
    return _MODE[0]


@contextlib.contextmanager
def int8_mode(m: str):
    """Trace-time context: route `models.whisper.linear` / the folded-LoRA
    dots through quantized matmuls ('fwd' or 'full'); same mechanism as
    `whisper.fold_at_linear`."""
    assert m in ("off", "fwd", "full"), m
    prev = _MODE[0]
    _MODE[0] = m
    try:
        yield
    finally:
        _MODE[0] = prev


def _quant(v, axis: int):
    """Symmetric per-vector int8 quantization along ``axis``.

    Returns (q int8, scale f32 with the quantized axis kept at size 1).
    Zero vectors get scale 1 (q = 0, exact)."""
    a = jnp.max(jnp.abs(v.astype(jnp.float32)), axis=axis, keepdims=True)
    s = jnp.where(a > 0, a * (1.0 / 127.0), 1.0)
    q = jnp.round(v.astype(jnp.float32) / s)
    return q.astype(jnp.int8), s


def _qdot2(x2, w, out_dtype):
    """Quantized x2 [N, K] @ w [K, M] -> [N, M] in ``out_dtype``."""
    xq, xs = _quant(x2, axis=1)          # xs [N, 1]
    wq, ws = _quant(w, axis=0)           # ws [1, M]
    y = lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * xs * ws).astype(out_dtype)


def _fwd_only(x, w):
    k = x.shape[-1]
    n = 1
    for s in x.shape[:-1]:
        n *= s
    y = _qdot2(x.reshape(n, k), w, x.dtype)
    return y.reshape(*x.shape[:-1], w.shape[-1])


# The mode rides as a STATIC first argument (nondiff_argnums): the
# int8_mode context is only active while the forward is being traced —
# custom_vjp backward rules trace later, after the context exits — so the
# backward cannot read _MODE and must receive the decision statically.
@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _quantized_dot(m: str, x, w):
    return _fwd_only(x, w)


def _quantized_dot_fwd(m, x, w):
    return _fwd_only(x, w), (x, w)


def _quantized_dot_bwd(m, res, dy):
    x, w = res
    k = x.shape[-1]
    mdim = w.shape[-1]
    n = 1
    for s in x.shape[:-1]:
        n *= s
    dy2 = dy.reshape(n, mdim)
    x2 = x.reshape(n, k)
    if m == "full":
        dx2 = _qdot2(dy2, w.T, x.dtype)
        # dw contraction is over tokens: quantize x^T rows / dy columns
        # along the token axis; accumulate in f32 (master-weight grads)
        dw = _qdot2(x2.T, dy2, jnp.float32)
    else:
        dx2 = jnp.dot(dy2, w.T.astype(dy2.dtype)).astype(x.dtype)
        dw = lax.dot_general(x2, dy2, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    return dx2.reshape(x.shape), dw.astype(w.dtype)


_quantized_dot.defvjp(_quantized_dot_fwd, _quantized_dot_bwd)


def quantized_dot(x, w, m: str | None = None):
    """Drop-in for ``jnp.dot(x, w)`` on [..., K] x [K, M] with int8 compute
    and straight-through gradients; ``m`` defaults to the active mode
    (captured statically at forward-trace time)."""
    return _quantized_dot(mode() if m is None else m, x, w)
