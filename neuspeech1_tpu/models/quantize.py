"""Int8 weight-only quantization (storage / memory-bound serving).

The reference exposes an optional `load_in_8bit` path through bitsandbytes
(`finetune.py:128,171`). The TPU-native equivalent here is symmetric
per-output-channel int8 weight quantization of the transformer linears:

    w_q = round(w / s),  s = max|w| / 127 per output column

`quantize_params` converts a parameter tree (linears only — convs, norms and
embeddings stay f32/bf16, they are a rounding-error share of the bytes);
`dequantize_params` restores a dense tree for the standard forward. For
fused on-the-fly dequant the stored tree can be mapped leaf-wise at load
time, which is what the serving path does — weights stream from HBM at 1/2
(vs bf16) or 1/4 (vs f32) the bytes.

Training stays bf16/f32 (TPU norm; the reference's 8-bit training path is
documented as replaced — see PARITY.md).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

_QUANT_KEY = "w_int8"
_SCALE_KEY = "w_scale"


def _is_linear_weight(path: Tuple, leaf) -> bool:
    keys = [str(getattr(k, "key", k)) for k in path]
    if not keys or keys[-1] != "w":
        return False
    if any(k in ("stem", "conv2") for k in keys):
        return False  # convs stay dense
    return leaf.ndim == 3  # [L, d_in, d_out] stacked linears


def quantize_int8(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[..., d_in, d_out] -> (int8 values, f32 scales per output column)."""
    amax = jnp.max(jnp.abs(w), axis=-2, keepdims=True)  # [..., 1, d_out]
    scale = jnp.where(amax == 0, 1.0, amax / 127.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale


def dequantize_int8(q: jnp.ndarray, scale: jnp.ndarray, dtype=jnp.float32):
    return (q.astype(jnp.float32) * scale).astype(dtype)


def quantize_params(params: Params) -> Params:
    """Replace eligible linear weights with {"w_int8", "w_scale"} entries."""

    def walk(tree, path=()):
        if isinstance(tree, dict):
            if "w" in tree and _is_linear_weight(
                path + ("w",), np.asarray(tree["w"])
            ):
                q, s = quantize_int8(jnp.asarray(tree["w"]))
                out = {k: v for k, v in tree.items() if k != "w"}
                out[_QUANT_KEY] = q
                out[_SCALE_KEY] = s
                return out
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        return tree

    return walk(params)


def dequantize_params(params: Params, dtype=jnp.float32) -> Params:
    def walk(tree):
        if isinstance(tree, dict):
            if _QUANT_KEY in tree:
                out = {
                    k: v
                    for k, v in tree.items()
                    if k not in (_QUANT_KEY, _SCALE_KEY)
                }
                out["w"] = dequantize_int8(
                    tree[_QUANT_KEY], tree[_SCALE_KEY], dtype
                )
                return out
            return {k: walk(v) for k, v in tree.items()}
        return tree

    return walk(params)


def quantization_error(params: Params) -> float:
    """Max relative RMS error over quantized linears (sanity metric)."""
    worst = 0.0
    qp = quantize_params(params)

    def walk(orig, q):
        nonlocal worst
        if isinstance(orig, dict):
            if "w" in orig and _QUANT_KEY in q:
                w = np.asarray(orig["w"], np.float32)
                wd = np.asarray(
                    dequantize_int8(q[_QUANT_KEY], q[_SCALE_KEY])
                )
                rms = float(np.sqrt(np.mean((w - wd) ** 2)))
                denom = float(np.sqrt(np.mean(w**2))) + 1e-12
                worst = max(worst, rms / denom)
            else:
                for k in orig:
                    if isinstance(orig[k], dict):
                        walk(orig[k], q[k])

    walk(params, qp)
    return worst
