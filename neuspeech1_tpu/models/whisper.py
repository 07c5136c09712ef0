"""Whisper-style encoder-decoder, TPU-first functional JAX implementation.

Capability parity with the reference's vendored HF fork
(`utils/load_model.py`: WhisperEncoder :327-476, WhisperDecoder :478-767,
WhisperForConditionalGeneration :940-1401) — but written as pure functions
over parameter pytrees:

  * layers are stacked along a leading axis and driven by `lax.scan`
    (one compiled layer body, O(1) compile time in depth, remat-friendly);
  * the EEG/speech stem is a swappable pure function chosen statically from
    `StemConfig` (the reference swaps `encoder.conv1` via
    `set_input_embeddings`, `utils/load_model.py:365-369`);
  * LoRA/AdaLoRA ride along as an optional parallel pytree consumed inside
    each linear (see `models/lora.py`) — no module surgery needed;
  * decode-time KV caches are fixed-shape buffers updated with
    `lax.dynamic_update_slice` so generation jits cleanly.

Weight layouts: conv kernels keep torch's [out, in, k]; linears are stored
[in, out] (transposed once at conversion) so forward is `x @ w`, which also
gives clean tensor-parallel PartitionSpecs (see `parallel/sharding.py`).
"""

from __future__ import annotations

import functools
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax

from neuspeech1_tpu.config import StemConfig, WhisperConfig
from neuspeech1_tpu.models.lora import lora_delta
from neuspeech1_tpu.ops.gelu import gelu as gelu_exact

Params = Dict[str, Any]


def resolve_flash(config: WhisperConfig, t_kv: int) -> bool:
    """Static decision: Pallas flash attention on TPU when enabled in the
    config and the K/V tiles fit the kernel's VMEM envelope.

    'auto' = on for TPU backends, off on CPU (tests run the XLA path there;
    kernel-level parity is covered in interpret mode separately).
    """
    mode = config.flash_attention
    if mode == "off":
        return False
    from neuspeech1_tpu.ops.flash_attention import flash_available, on_tpu

    ok = flash_available(t_kv, config.d_model // config.encoder_heads)
    if mode == "on":
        return ok
    return ok and on_tpu()


# --------------------------------------------------------------------------
# primitives
# --------------------------------------------------------------------------

import contextlib

# Trace-time mode for the fold_lora training path: adapted linears run ONE
# dot against W_eff = W + s*A(Em)B with a LOW-RANK-ONLY backward
# (models/lora.py::folded_linear) instead of per-token low-rank deltas.
# Entered by train.trainstep.make_loss_fn(fold_lora=True) around tracing —
# it carries the frozen-base contract (see folded_linear's docstring).
_FOLD_AT_LINEAR = [False]


@contextlib.contextmanager
def fold_at_linear():
    prev = _FOLD_AT_LINEAR[0]
    _FOLD_AT_LINEAR[0] = True
    try:
        yield
    finally:
        _FOLD_AT_LINEAR[0] = prev


def linear(x, p: Params, lora: Optional[Params] = None):
    """x @ w + b, with optional low-rank delta from a parallel LoRA tree.

    Under `ops.int8_matmul.int8_mode` (trainstep's int8_matmul='fwd'|'full')
    the dot runs as an AQT-style dynamic int8 matmul — the train-time
    analog of the reference's optional load_in_8bit path
    (`finetune.py:128,171`), using the int8 MXU's 2x bf16 rate."""
    if lora is not None and _FOLD_AT_LINEAR[0]:
        from neuspeech1_tpu.models.lora import folded_linear

        return folded_linear(x, p, lora)
    from neuspeech1_tpu.ops import int8_matmul as _i8

    if _i8.mode() != "off":
        y = _i8.quantized_dot(x, p["w"].astype(x.dtype))
    else:
        y = jnp.dot(x, p["w"].astype(x.dtype))
    if "b" in p and p["b"] is not None:
        y = y + p["b"].astype(x.dtype)
    if lora is not None:
        y = y + lora_delta(x, lora)
    return y


def layer_norm(x, p: Params, eps: float = 1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    y = (x - mu) * lax.rsqrt(var + eps)
    return y * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)


import os as _os

_CONV_IMPL = _os.environ.get("NEUSPEECH_CONV_IMPL", "conv")  # 'conv'|'matmul'


def conv1d(x, p: Params, stride: int = 1, padding: int = 1):
    """1-D conv over [B, C, T] with torch-layout kernel [out, in, k].

    Two lowerings: XLA's native conv, or K shifted matmuls (einsum over the
    channel dim) — on TPU the matmul form sometimes maps better onto the MXU
    for channel-heavy stems; selectable via NEUSPEECH_CONV_IMPL.
    """
    w = p["w"].astype(x.dtype)
    b = p["b"].astype(x.dtype)[None, :, None]
    if _CONV_IMPL == "matmul":
        k = w.shape[-1]
        t_out = (x.shape[-1] + 2 * padding - k) // stride + 1
        xp = jnp.pad(x, ((0, 0), (0, 0), (padding, padding)))
        y = None
        for j in range(k):
            xs = lax.slice_in_dim(xp, j, j + (t_out - 1) * stride + 1, stride, axis=2)
            term = jnp.einsum("bct,oc->bot", xs, w[:, :, j])
            y = term if y is None else y + term
        return y + b
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    ) + b


_CONV_CL_IMPL = _os.environ.get("NEUSPEECH_CONV_CL_IMPL", "conv")


def set_conv_cl_impl(name: str) -> None:
    """'conv' (XLA native conv) or 'unfold' (K-strided-slice concat + one
    matmul). Takes effect at next trace."""
    global _CONV_CL_IMPL
    _CONV_CL_IMPL = name


def conv1d_cl(x, p: Params, stride: int = 1, padding: int = 1):
    """Channels-LAST 1-D conv over [B, T, C] (torch kernel [out, in, k]).

    Default lowering is XLA's native NHC conv — measured FASTER than the
    'unfold' alternative (K strided slices + one [K*C, O] matmul) at the
    whisper-base EEG stem geometry (+23 ms/step for unfold; BASELINE.md
    round-2 rejects). 'matmul' is the concat-free variant — K shifted
    einsums summed in place (no [B, T, K*C] materialization; the slices
    fuse into the dots). All stay selectable per geometry."""
    w = p["w"].astype(x.dtype)  # [O, I, K]
    b = p["b"].astype(x.dtype)
    if _CONV_CL_IMPL == "matmul":
        o, i, k = w.shape
        t_out = (x.shape[1] + 2 * padding - k) // stride + 1
        xp = jnp.pad(x, ((0, 0), (padding, padding), (0, 0)))
        y = None
        for j in range(k):
            xs = lax.slice_in_dim(
                xp, j, j + (t_out - 1) * stride + 1, stride, axis=1)
            term = jnp.einsum("btc,co->bto", xs, w[:, :, j].T)
            y = term if y is None else y + term
        return y + b
    if _CONV_CL_IMPL == "unfold":
        o, i, k = w.shape
        t_out = (x.shape[1] + 2 * padding - k) // stride + 1
        xp = jnp.pad(x, ((0, 0), (padding, padding), (0, 0)))
        cols = [
            lax.slice_in_dim(xp, j, j + (t_out - 1) * stride + 1, stride, axis=1)
            for j in range(k)
        ]
        xcat = jnp.concatenate(cols, axis=-1)  # [B, T_out, K*I]
        wmat = w.transpose(2, 1, 0).reshape(k * i, o)
        return jnp.dot(xcat, wmat) + b
    return lax.conv_general_dilated(
        x,
        w.transpose(2, 1, 0),  # [K, I, O]
        window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=("NHC", "HIO", "NHC"),
    ) + b


def _scan_unroll(config: WhisperConfig):
    """0 = auto: full unroll on TPU (scheduling/stacking win, measured),
    plain scan elsewhere (O(1) compile for CPU tests)."""
    if config.scan_unroll:
        return config.scan_unroll
    from neuspeech1_tpu.ops.flash_attention import on_tpu

    return True if on_tpu() else 1


def _split_heads(x, n_heads: int):
    """[B, T, D] -> [B, T, H, Dh] — a pure reshape. Heads live on dim 2
    (BTHD layout) so NO transpose brackets the attention kernel; both the
    Pallas flash kernel and the XLA einsum path consume BTHD directly."""
    b, t, d = x.shape
    return x.reshape(b, t, n_heads, d // n_heads)


def _merge_heads(x):
    b, t, h, dh = x.shape
    return x.reshape(b, t, h * dh)


def attention(
    q, k, v, mask=None, *,
    logits_dtype=jnp.float32,
    use_flash: bool = False,
    causal: bool = False,
    kv_len: Optional[int] = None,
    ring_axis: Optional[str] = None,
):
    """SDPA on [B, T, H, Dh] (BTHD) tensors; softmax in fp32 for stability.

    With `use_flash` (and no explicit mask, or a plain causal pattern) the
    Pallas flash kernel runs instead — no [B, H, T, T] HBM intermediates
    (see `ops/flash_attention.py`). ``kv_len`` masks zero-padded K/V rows
    (only meaningful on the flash path; the XLA path takes explicit masks).
    ``ring_axis``: sequence-parallel self-attention over that ambient-mesh
    axis (`parallel/ring_attention.py`; non-causal, mask-free only).
    """
    if ring_axis is not None and mask is None and not causal:
        from neuspeech1_tpu.parallel.ring_attention import (
            ring_flash_attention)

        mesh = jax.sharding.get_abstract_mesh()
        return ring_flash_attention(q, k, v, mesh, ring_axis,
                                    kv_valid_len=kv_len)
    if use_flash:
        from neuspeech1_tpu.ops.flash_attention import flash_attention_bthd

        return flash_attention_bthd(q, k, v, causal=causal, kv_len=kv_len)
    dh = q.shape[-1]
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(logits_dtype)
    scores = scores * (dh ** -0.5)
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.finfo(logits_dtype).min)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


# Fused q/k/v projection (one dot through column-concatenated weights) is a
# measured REJECT on this hardware in BOTH regimes (round-2 A/B): training
# scans +14 ms/step (the per-layer weight concat inside the scan outweighs
# the op-count win) and incremental decode 4.72->4.78 ms/token. Kept
# selectable for other geometries: '1' fuse everywhere, 'decode' fuse only
# the decode cache path, '0' (default) never. Read at call time (like
# NEUSPEECH_FLASH_LAYOUT) so setting it after import works.
def _fused_qkv() -> str:
    return _os.environ.get("NEUSPEECH_FUSED_QKV", "0")


# Streaming decode-cross kernel is a measured REJECT on v5e at whisper-base
# bs64 in BOTH shapes tried: all-heads-per-block grid (B,) 8.42 ms/token,
# per-(b,h) BHTD-native grid (B*H,) 18.5 ms/token, vs 4.75 on XLA's single
# batched matmul — serialized tiny-M dots pay full pipeline latency per
# grid instance despite touching the same HBM bytes. Kept selectable for
# geometries with much longer K/V per head. Read at call time.
def _flash_decode_on() -> bool:
    return _os.environ.get("NEUSPEECH_FLASH_DECODE", "0") == "1"


def _decode_cross_ok(k) -> bool:
    """Route incremental-decode cross-attention to the streaming Pallas
    kernel (TPU only — CPU tests keep the XLA path; kernel parity is
    covered in interpret mode separately). ``k`` is the cross cache in its
    BHTD layout [B, H, T_src, Dh]."""
    if not _flash_decode_on():
        return False
    from neuspeech1_tpu.ops.flash_attention import (
        decode_cross_available, on_tpu)

    d = k.shape[-1]
    return (on_tpu() and d in (32, 64, 128)
            and decode_cross_available(k.shape[2], d, k.shape[1],
                                       itemsize=k.dtype.itemsize))


# MEASURED REJECT, kept selectable (NEUSPEECH_QKV_BWD_FUSED=1): backward-
# only multi-linear fusion for q/k/v (and cross k/v) projections sharing
# one input. The FORWARD stays three separate dots — the fused forward
# (_linear_cat) is its own reject because its sliced outputs force copies
# in front of the Pallas attention kernels (218.2 vs 202.4 ms/step). The
# BACKWARD concatenates the dys once and computes
#   dx    = dy_cat @ Wcat^T      (ONE deep-K dot: K = sum(douts))
#   dW_cat = x^T @ dy_cat        (one dot, sliced into per-matrix grads)
# hypothesizing a win from replacing N shallow-K dots (K=512 dots measure
# ~107 TF/s vs ~172 deep-K on v5e) and the N-1 [B,T,d] dx add passes.
# Measured (whisper-base bs64 noremat, round 3b): 200.8 -> 208.5 ms/step —
# the dy concat copies plus the custom_vjp closed_call boundary relayouts
# cost more than the dot-rate gain, the same boundary-tax law as the
# pallas-operand finding (PARITY.md). Gradients are identical (7.5e-8 max
# diff on the CPU f32 check; the dx sum lands in one f32 accumulator).
@jax.custom_vjp
def _multi_linear(x, ps):
    return tuple(linear(x, p) for p in ps)


def _multi_linear_fwd(x, ps):
    return _multi_linear(x, ps), (x, ps)


def _multi_linear_bwd(res, dys):
    x, ps = res
    n = 1
    for s in x.shape[:-1]:
        n *= s
    din = x.shape[-1]
    dy_cat = jnp.concatenate(dys, axis=-1).reshape(n, -1)
    wcat = jnp.concatenate(
        [p["w"] for p in ps], axis=1).astype(dy_cat.dtype)
    dx = jnp.dot(dy_cat, wcat.T).reshape(x.shape).astype(x.dtype)
    dw_cat = jax.lax.dot_general(
        x.reshape(n, din), dy_cat, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    d_ps = []
    off = 0
    for p, dy in zip(ps, dys):
        dout = p["w"].shape[1]
        d_p = jax.tree_util.tree_map(jnp.zeros_like, p)
        d_p["w"] = lax.slice_in_dim(
            dw_cat, off, off + dout, axis=1).astype(p["w"].dtype)
        if "b" in p and p["b"] is not None:
            d_p["b"] = jnp.sum(
                dy.astype(jnp.float32),
                axis=tuple(range(dy.ndim - 1))).astype(p["b"].dtype)
        d_ps.append(d_p)
        off += dout
    return dx, tuple(d_ps)


_multi_linear.defvjp(_multi_linear_fwd, _multi_linear_bwd)


def _qkv_bwd_fused() -> bool:
    return _os.environ.get("NEUSPEECH_QKV_BWD_FUSED", "0") == "1"


def _linear_cat(x, ps):
    """One dot through the column-concat of several linears' weights,
    returning per-linear output slices. The projections' FLOPs are
    identical; one wide MXU op replaces N narrow ones (fewer fixed
    overheads, better N-dim tiling). Used on the fold_lora hot path where
    no per-matrix LoRA delta applies (callers fall back otherwise)."""
    wcat = jnp.concatenate([p["w"] for p in ps], axis=1).astype(x.dtype)
    out = jnp.dot(x, wcat)
    if any(("b" in p and p["b"] is not None) for p in ps):
        bcat = jnp.concatenate([
            p["b"] if ("b" in p and p["b"] is not None)
            else jnp.zeros((p["w"].shape[1],), p["w"].dtype)
            for p in ps
        ]).astype(x.dtype)
        out = out + bcat
    res = []
    off = 0
    for p in ps:
        s = p["w"].shape[1]
        res.append(lax.slice_in_dim(out, off, off + s, axis=-1))
        off += s
    return res


def mha(
    x,
    p: Params,
    n_heads: int,
    kv_source=None,
    mask=None,
    lora: Optional[Params] = None,
    cache: Optional[Params] = None,
    cache_index=None,
    use_flash: bool = False,
    causal: bool = False,
    kv_len: Optional[int] = None,
    ring_axis: Optional[str] = None,
    self_contig: bool = False,
):
    """Multi-head attention with optional cross-attention and KV cache.

    cache: {"k": [B,Tmax,H,Dh], "v": ...} fixed-shape BTHD buffers; with
    ``cache_index`` (scalar) new K/V rows are written at that position and
    attention spans the first ``cache_index+q_len`` entries.
    Returns (out, new_cache).
    """
    lora = lora or {}
    src = x if kv_source is None else kv_source
    # fused projections apply when no per-matrix LoRA delta is live and K/V
    # are computed this call; see _fused_qkv for the train/decode split
    is_decode_self = cache is not None and kv_source is None
    fqkv = _fused_qkv()
    fuse = not lora and (
        fqkv == "1" if cache is None
        else (fqkv in ("1", "decode") and is_decode_self)
    )
    if fuse and kv_source is None:
        qh, kh, vh = _linear_cat(x, (p["q"], p["k"], p["v"]))
        q = _split_heads(qh, n_heads)
        k = _split_heads(kh, n_heads)
        v = _split_heads(vh, n_heads)
        if cache is not None:
            return _self_decode_dt(q, k, v, cache, cache_index, mask, p,
                                   lora, contig=self_contig)
        new_cache = None
    elif fuse:
        q = _split_heads(linear(x, p["q"]), n_heads)
        kh, vh = _linear_cat(src, (p["k"], p["v"]))
        k = _split_heads(kh, n_heads)
        v = _split_heads(vh, n_heads)
        new_cache = None
    else:
        # applies under the merged/fc fold regimes too: merged attention
        # adapters leave `lora` empty here and their dW_eff cotangents
        # chain through merge_lora's autodiff regardless of which dot
        # produced them
        bwd_fuse = cache is None and not lora and _qkv_bwd_fused()
        if bwd_fuse and kv_source is None:
            qh, kh, vh = _multi_linear(x, (p["q"], p["k"], p["v"]))
            q = _split_heads(qh, n_heads)
            k = _split_heads(kh, n_heads)
            v = _split_heads(vh, n_heads)
            out = attention(q, k, v, mask=mask, use_flash=use_flash,
                            causal=causal, kv_len=kv_len)
            return linear(_merge_heads(out), p["out"],
                          lora.get("out")), None
        q = _split_heads(linear(x, p["q"], lora.get("q")), n_heads)
        if bwd_fuse:
            kh, vh = _multi_linear(src, (p["k"], p["v"]))
            k = _split_heads(kh, n_heads)
            v = _split_heads(vh, n_heads)
            out = attention(q, k, v, mask=mask, use_flash=use_flash,
                            causal=causal, kv_len=kv_len)
            return linear(_merge_heads(out), p["out"],
                          lora.get("out")), None
        if cache is not None and kv_source is not None and cache_index is None:
            # cross-attention with precomputed encoder K/V. The cache keeps
            # K/V in [B, H, Tkv, Dh] (BHTD) so each (b, h) pane is read as
            # one contiguous stream — incremental decode re-reads the WHOLE
            # cross cache every token (~1.2 GB/token at whisper-base bs64)
            # and the head-strided [B,T,H,D] layout measured at only half
            # HBM bandwidth (0.26 ms per 100 MB einsum; device profile).
            rows, t_q_rows = q.shape[0], q.shape[1]
            b_c = next(iter(cache.values())).shape[0]
            if rows != b_c:
                # beam search: B·K decoder rows, ONE cross cache per
                # utterance (cross K/V is beam-invariant) — fold the beam
                # dim into the query rows instead of replicating/gathering
                # the cache (K x fewer cross HBM reads, no per-step gather)
                assert mask is None and rows % b_c == 0
                q = q.reshape(b_c, (rows // b_c) * t_q_rows, *q.shape[2:])
            if "k_btc" in cache:
                # BTC cross cache: the batched block-diagonal Pallas kernel
                # for single-row decode steps (TPU; interpret mode on CPU),
                # BTHD-view einsum (free reshape) for multi-row prefill /
                # beam-folded queries
                k_btc, v_btc = cache["k_btc"], cache["v_btc"]
                t_pad = k_btc.shape[1]
                dh = q.shape[-1]
                hh = q.shape[2]
                if q.shape[1] == 1 and kv_len is not None:
                    from neuspeech1_tpu.ops.flash_attention import (
                        flash_decode_cross_btc)

                    out = flash_decode_cross_btc(
                        q, k_btc.astype(q.dtype), v_btc.astype(q.dtype),
                        kv_len=kv_len)
                else:
                    k = k_btc.reshape(b_c, t_pad, hh, dh).astype(q.dtype)
                    v = v_btc.reshape(b_c, t_pad, hh, dh).astype(q.dtype)
                    scores = jnp.einsum(
                        "bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
                    scores = scores * (dh ** -0.5)
                    valid = jnp.arange(t_pad) < (
                        kv_len if kv_len is not None else t_pad)
                    scores = jnp.where(valid[None, None, None, :], scores,
                                       jnp.finfo(jnp.float32).min)
                    if mask is not None:
                        scores = jnp.where(mask, scores,
                                           jnp.finfo(jnp.float32).min)
                    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
                    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
            elif "k_qt" in cache:
                # int8 cross cache: the big int8 arrays feed the dots raw
                # (half the HBM bytes of decode's dominant stream); the
                # per-(b,h,channel) scales fold into the TINY operands —
                # q for scores (q_d·k_d·s_d = (q_d·s_d)·k_d), the output
                # for PV (scale is per output channel)
                k_q, k_s = cache["k_qt"], cache["k_s"]
                v_q, v_s = cache["v_qt"], cache["v_s"]
                dh = q.shape[-1]
                # k_qt/v_qt: int8 [B, H, Dh, T] — T on the lane axis (see
                # init_cache); k_s/v_s: [B, H, 1, Dh] scales fold into the
                # TINY operands (q for scores, the output for PV) so the
                # dots stream the int8 arrays raw
                qs = q * k_s[:, :, 0, :].astype(q.dtype)[:, None]
                scores = jnp.einsum(
                    "bqhd,bhdk->bhqk", qs, k_q.astype(q.dtype)
                ).astype(jnp.float32) * (dh ** -0.5)
                if mask is not None:
                    scores = jnp.where(mask, scores,
                                       jnp.finfo(jnp.float32).min)
                probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
                out = jnp.einsum("bhqk,bhdk->bqhd", probs,
                                 v_q.astype(q.dtype))
                out = out * v_s[:, :, 0, :].astype(q.dtype)[:, None]
            elif "k_t" in cache:
                # bf16 cross cache TRANSPOSED [B, H, Dh, T] — same
                # full-lane-width reasoning as the int8 branch above
                k_t, v_t = cache["k_t"], cache["v_t"]
                dh = q.shape[-1]
                scores = jnp.einsum(
                    "bqhd,bhdk->bhqk", q, k_t.astype(q.dtype)
                ).astype(jnp.float32) * (dh ** -0.5)
                if mask is not None:
                    scores = jnp.where(mask, scores,
                                       jnp.finfo(jnp.float32).min)
                probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
                out = jnp.einsum("bhqk,bhdk->bqhd", probs,
                                 v_t.astype(q.dtype))
            else:
                k, v = cache["k"], cache["v"]
                if mask is None and _decode_cross_ok(k):
                    from neuspeech1_tpu.ops.flash_attention import (
                        flash_decode_cross)

                    out = flash_decode_cross(q, k, v)
                else:
                    dh = q.shape[-1]
                    scores = jnp.einsum(
                        "bqhd,bhkd->bhqk", q, k).astype(jnp.float32)
                    scores = scores * (dh ** -0.5)
                    if mask is not None:
                        scores = jnp.where(mask, scores,
                                           jnp.finfo(jnp.float32).min)
                    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
                    out = jnp.einsum("bhqk,bhkd->bqhd", probs, v)
            if rows != b_c:
                out = out.reshape(rows, t_q_rows, *out.shape[2:])
            return linear(_merge_heads(out), p["out"],
                          lora.get("out")), cache
        else:
            k = _split_heads(linear(src, p["k"], lora.get("k")), n_heads)
            v = _split_heads(linear(src, p["v"], lora.get("v")), n_heads)
            if cache is not None:
                return _self_decode_dt(q, k, v, cache, cache_index, mask, p,
                                       lora, contig=self_contig)
            new_cache = None
    out = attention(q, k, v, mask=mask, use_flash=use_flash, causal=causal,
                    kv_len=kv_len, ring_axis=ring_axis)
    return linear(_merge_heads(out), p["out"], lora.get("out")), new_cache


def _self_decode_dt(q, k_new, v_new, cache, cache_index, mask, p, lora,
                    contig=False):
    """Incremental decode self-attention on the TRANSPOSED [B, H, Dh, Tmax]
    cache — the same full-lane-width layout as the cross cache (T on the
    128-lane axis; the BTHD form put Dh=64 on lanes and read head-strided
    panes). Measured NEUTRAL end to end at whisper-base bs64 (long-form
    slopes identical to BTHD): the faster reads are offset by the per-step
    write becoming a lane-column read-modify-write of the (8,128) tiles.
    Kept for layout symmetry with the cross cache and the simpler
    dedicated path. Long-form per-token cost is dominated by Tmax
    (fixed-shape buffers), measured 2.34 ms/token busy at Tmax~300
    (steady-state trace) — no layout pathology.

    ``contig=True`` asserts the caller's mask is the implicit contiguous
    ``position <= cache_index`` rule, which lets the q_len==1 step take
    the fused Pallas kernel (ops/decode_step.py: cache write + scores +
    softmax + PV in ONE op — the decode while-body is launch-gap bound).

    Numerics identical to `attention`'s XLA path: bf16 score einsum, f32
    softmax, probs cast back for PV."""
    lora = lora or {}
    if "k_tm" in cache:
        return _self_decode_tm(q, k_new, v_new, cache, cache_index, mask,
                               p, lora)
    if "k_bt" in cache:
        return _self_decode_bt(q, k_new, v_new, cache, cache_index, mask,
                               p, lora)
    if "k_tu" in cache:
        return _self_decode_dt_unrolled(q, k_new, v_new, cache, cache_index,
                                        mask, p, lora)
    if contig and q.shape[1] == 1:
        from neuspeech1_tpu.ops.decode_step import (fused_self_decode,
                                                    fused_self_on)

        if fused_self_on():
            out, k_t, v_t = fused_self_decode(
                q, k_new, v_new, cache["k_t"], cache["v_t"], cache_index)
            return (linear(_merge_heads(out), p["out"], lora.get("out")),
                    {"k_t": k_t, "v_t": v_t})
    k_t = lax.dynamic_update_slice(
        cache["k_t"], k_new.transpose(0, 2, 3, 1), (0, 0, 0, cache_index))
    v_t = lax.dynamic_update_slice(
        cache["v_t"], v_new.transpose(0, 2, 3, 1), (0, 0, 0, cache_index))
    new_cache = {"k_t": k_t, "v_t": v_t}
    dh = q.shape[-1]
    scores = jnp.einsum("bqhd,bhdk->bhqk", q, k_t).astype(jnp.float32)
    scores = scores * (dh ** -0.5)
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bhdk->bqhd", probs, v_t)
    return linear(_merge_heads(out), p["out"], lora.get("out")), new_cache


def _self_decode_tm(q, k_new, v_new, cache, cache_index, mask, p, lora):
    """Incremental decode self-attention on a T-MAJOR [Tmax, B, H, Dh]
    cache (speculative decode path). The gamma-token draft-verify loop
    writes gamma new positions per step at a dynamic T offset; with T on
    the lane axis (the `_self_decode_dt` layout) XLA materialized the
    update as an unaliased read-modify-write of every (8,128) tile of the
    whole buffer (4.3 ms/iteration of dynamic_update_slice in the gamma=4
    device trace — more than a full greedy step). With T as the LEADING
    logical axis any layout XLA picks keeps T major-most, so the update
    writes gamma contiguous [B, H, Dh] slabs and aliases in place.

    Same math as `_self_decode_dt` (bf16 score einsum, f32 softmax)."""
    k_tm = lax.dynamic_update_slice(
        cache["k_tm"], k_new.transpose(1, 0, 2, 3), (cache_index, 0, 0, 0))
    v_tm = lax.dynamic_update_slice(
        cache["v_tm"], v_new.transpose(1, 0, 2, 3), (cache_index, 0, 0, 0))
    new_cache = {"k_tm": k_tm, "v_tm": v_tm}
    dh = q.shape[-1]
    scores = jnp.einsum("bqhd,kbhd->bhqk", q, k_tm).astype(jnp.float32)
    scores = scores * (dh ** -0.5)
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,kbhd->bqhd", probs, v_tm)
    return linear(_merge_heads(out), p["out"], lora.get("out")), new_cache


def _self_decode_dt_unrolled(q, k_new, v_new, cache, cache_index, mask, p,
                             lora):
    """Speculative-decode self-attention as gamma UNROLLED width-1 greedy
    steps on the [B, H, Dh, Tmax] cache.

    Why: with q-len gamma >= 2 the score op is a matmul and XLA's layout
    pass pins the K/V cache with T on the 128-lane axis REGARDLESS of the
    logical dim order (tried [Tmax,B,H,Dh] and [B,Tmax,H,Dh] — both got
    T-minor layouts), which turns every dynamic-offset cache write into a
    partial-tile read-modify-write of the whole buffer (4.3 ms/iteration
    at whisper-base bs64, more than a full greedy step). With q-len 1 the
    score op is a matvec and XLA picks the T-MAJOR layout where the write
    is a contiguous aliased slab (the production greedy loop's fragment).
    So: run the self-attention as gamma sequential width-1 writes+matvecs
    — isomorphic to gamma greedy fragments — while cross-attention, MLP
    and the logit projection still batch over the gamma positions (those
    carry the HBM amortization that makes speculation pay).

    In-block causality is inherent: position i's matvec runs after writes
    0..i only; `mask[..., i, :]` excludes the stale tail."""
    if mask is not None:
        from neuspeech1_tpu.ops.decode_step import (fused_self_decode_multi,
                                                    fused_self_on)

        if fused_self_on():
            # ONE op for the whole gamma-step chain (ops/decode_step.py):
            # the mask already excludes in-block lanes > i for query i, so
            # writing all gamma columns up front is equivalent
            out, k_t, v_t = fused_self_decode_multi(
                q, k_new, v_new, mask, cache["k_tu"], cache["v_tu"],
                cache_index)
            return (linear(_merge_heads(out), p["out"], lora.get("out")),
                    {"k_tu": k_t, "v_tu": v_t})
    k_t, v_t = cache["k_tu"], cache["v_tu"]
    g = q.shape[1]
    dh = q.shape[-1]
    outs = []
    for i in range(g):
        k_t = lax.dynamic_update_slice(
            k_t, k_new[:, i:i + 1].transpose(0, 2, 3, 1),
            (0, 0, 0, cache_index + i))
        v_t = lax.dynamic_update_slice(
            v_t, v_new[:, i:i + 1].transpose(0, 2, 3, 1),
            (0, 0, 0, cache_index + i))
        s = jnp.einsum("bqhd,bhdk->bhqk", q[:, i:i + 1], k_t)
        s = s.astype(jnp.float32) * (dh ** -0.5)
        if mask is not None:
            s = jnp.where(mask[:, :, i:i + 1], s,
                          jnp.finfo(jnp.float32).min)
        pr = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        outs.append(jnp.einsum("bhqk,bhdk->bqhd", pr, v_t))
    out = jnp.concatenate(outs, axis=1)
    new_cache = {"k_tu": k_t, "v_tu": v_t}
    return linear(_merge_heads(out), p["out"], lora.get("out")), new_cache


def _self_decode_bt(q, k_new, v_new, cache, cache_index, mask, p, lora):
    """Incremental decode self-attention on a [B, Tmax, H, Dh] cache
    (speculative-decode alternative to `_self_decode_tm`): the gamma new
    K/V rows land at a T (second-major) offset, touching only whole
    (H, Dh) tiles — no partial-tile lane RMW, no transpose of the
    incoming [B, gamma, H, Dh] projections."""
    k = lax.dynamic_update_slice(
        cache["k_bt"], k_new, (0, cache_index, 0, 0))
    v = lax.dynamic_update_slice(
        cache["v_bt"], v_new, (0, cache_index, 0, 0))
    new_cache = {"k_bt": k, "v_bt": v}
    dh = q.shape[-1]
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
    scores = scores * (dh ** -0.5)
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
    return linear(_merge_heads(out), p["out"], lora.get("out")), new_cache


def _mlp_tail(h, p2, lora2):
    return linear(gelu_exact(h), p2, lora2)


def mlp(x, p: Params, lora: Optional[Params] = None):
    from jax.ad_checkpoint import checkpoint_name

    lora = lora or {}
    # 'mlp_h' (the fc1 pre-activation) is the one MLP tensor worth saving
    # under remat: from it, gelu and both dW matmuls are recomputable with
    # cheap VPU work only (see _remat_policy 'flash_mlp')
    h = checkpoint_name(linear(x, p["fc1"], lora.get("fc1")), "mlp_h")
    if _os.environ.get("NEUSPEECH_MLP_TAIL_REMAT", "0") == "1":
        # Recompute gelu(h) in the backward pass instead of saving it:
        # autodiff otherwise keeps BOTH h (for gelu') and gelu(h) (for dW2),
        # making the fc1 fusion write two [B,T,4d] tensors back to HBM.
        # With the tail checkpointed, fwd's gelu has a single consumer (the
        # fc2 dot) so XLA fuses it into the dot's operand, and bwd re-derives
        # it from h with VPU-only work.
        tail = jax.checkpoint(
            _mlp_tail, policy=jax.checkpoint_policies.nothing_saveable)
        return tail(h, p["fc2"], lora.get("fc2"))
    h = gelu_exact(h)
    return linear(h, p["fc2"], lora.get("fc2"))


# --------------------------------------------------------------------------
# stems: [B, ch, T] -> [B, frames, d]
# --------------------------------------------------------------------------

def _conv1d_nch_in(x_nch, p: Params, stride: int = 1, padding: int = 1):
    """First-stem-conv variant reading the RAW [B, C, T] input (NCH) and
    writing channels-last [B, T, O]: the dims spec does the transpose inside
    the conv instead of a standalone [B,T,C] copy of the 300 MB input."""
    w = p["w"].astype(x_nch.dtype)  # [O, I, K]
    b = p["b"].astype(x_nch.dtype)
    return lax.conv_general_dilated(
        x_nch,
        w.transpose(2, 1, 0),  # [K, I, O]
        window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=("NCH", "HIO", "NHC"),
    ) + b


def apply_stem(params: Params, features, config: WhisperConfig, stem: StemConfig,
               dropout_rng=None):
    """Projection stem + whisper conv2, mirroring the reference geometry.

    'speech':  gelu(conv1(mel))          k3 s1  (HF whisper conv1)
    'base':    gelu(conv_b(gelu(conv_a)))  a: k3 s1, b: k3 s2
               (reference `utils/model_utils.py:12-16`, executed under the
               encoder's own gelu at `utils/load_model.py:410`)
    'replace': gelu(conv(x))             k3 s2  (`utils/model_utils.py:18-20`)

    then always: gelu(conv2(h)) with s2 (`utils/load_model.py:348,411`).
    Output: [B, T', d_model] with T' == config.max_source_positions.
    """
    if _os.environ.get("NEUSPEECH_STEM_NCH_IN", "0") == "1":
        sp = params["stem"]
        if stem.kind == "speech":
            h = gelu_exact(_conv1d_nch_in(features, sp["conv1"], stride=1))
        elif stem.kind == "base":
            h = gelu_exact(_conv1d_nch_in(features, sp["conv_a"], stride=1))
            h = gelu_exact(conv1d_cl(h, sp["conv_b"], stride=2))
        elif stem.kind == "replace":
            h = gelu_exact(_conv1d_nch_in(features, sp["conv"], stride=2))
        else:  # premel
            h = _conv1d_nch_in(features, sp["pre_conv"], stride=2, padding=2)
            if stem.dropout > 0 and dropout_rng is not None:
                keep = 1.0 - stem.dropout
                mask = jax.random.bernoulli(
                    dropout_rng, keep, (h.shape[0], 1, h.shape[2]))
                h = jnp.where(mask, h / keep, 0.0)
            h = gelu_exact(conv1d_cl(h, sp["conv1"], stride=1))
        return gelu_exact(conv1d_cl(h, params["conv2"], stride=2))
    # channels-last throughout: one input transpose, none at the output
    x = features.transpose(0, 2, 1)  # [B, T, ch]
    sp = params["stem"]
    if stem.kind == "speech":
        h = gelu_exact(conv1d_cl(x, sp["conv1"], stride=1))
    elif stem.kind == "base":
        h = gelu_exact(conv1d_cl(x, sp["conv_a"], stride=1))
        h = conv1d_cl(h, sp["conv_b"], stride=2)
        h = gelu_exact(h)
    elif stem.kind == "replace":
        h = gelu_exact(conv1d_cl(x, sp["conv"], stride=2))
    elif stem.kind == "premel":
        # pre_conv1: ch -> num_mel_bins at stride 2, then whisper's own conv1
        h = conv1d_cl(x, sp["pre_conv"], stride=2, padding=2)
        if stem.dropout > 0 and dropout_rng is not None:
            # channel dropout (torch Dropout1d semantics: whole feature
            # channels zeroed; reference `utils/load_model.py:1516-1521`)
            keep = 1.0 - stem.dropout
            mask = jax.random.bernoulli(
                dropout_rng, keep, (h.shape[0], 1, h.shape[2])
            )
            h = jnp.where(mask, h / keep, 0.0)
        h = gelu_exact(conv1d_cl(h, sp["conv1"], stride=1))
    else:
        raise ValueError(stem.kind)
    h = gelu_exact(conv1d_cl(h, params["conv2"], stride=2))
    return h  # [B, T', d]


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------

def _remat_policy(config: WhisperConfig):
    """Checkpoint policy for the per-layer remat.

    None (default): full recompute — lowest memory, backward re-runs the
      whole layer forward including the flash kernel.
    'flash': save the flash kernel outputs (o + lse) so the backward loads
      them instead of re-running the forward kernel; q/k/v projections are
      still recomputed. ~125 MB/layer extra at whisper-base bs64.
    'flash_qkv': additionally save q/k/v (skips the projection recompute
      too); ~425 MB/layer extra.
    'dots' / 'attn': XLA-side policies kept for comparison (measured slower
      in round 1).
    """
    name = config.remat_policy
    if name == "dots":
        return jax.checkpoint_policies.dots_saveable
    if name == "attn":
        return jax.checkpoint_policies.save_only_these_names("attn_out")
    if name == "flash":
        return jax.checkpoint_policies.save_only_these_names(
            "flash_o", "flash_lse"
        )
    if name == "flash_qkv":
        return jax.checkpoint_policies.save_only_these_names(
            "flash_q", "flash_k", "flash_v", "flash_o", "flash_lse"
        )
    if name == "flash_mlp":
        # flash residuals + q/k/v + fc1 pre-activation: backward recomputes
        # only layernorms and gelu (VPU-cheap); every matmul/kernel output
        # feeding a gradient is loaded, not recomputed.
        return jax.checkpoint_policies.save_only_these_names(
            "flash_q", "flash_k", "flash_v", "flash_o", "flash_lse", "mlp_h"
        )
    if name == "everything":
        # no recompute at all — keeps the scan structure (one compiled layer
        # body) but saves every intermediate; highest memory
        return jax.checkpoint_policies.everything_saveable
    return None


def _encoder_layer(h, layer_p, n_heads, lora=None, use_flash=False,
                   kv_len=None, ring_axis=None):
    from jax.ad_checkpoint import checkpoint_name

    res = h
    x = layer_norm(h, layer_p["self_attn_ln"])
    x, _ = mha(x, layer_p["self_attn"], n_heads,
               lora=(lora or {}).get("self_attn"), use_flash=use_flash,
               kv_len=kv_len, ring_axis=ring_axis)
    x = checkpoint_name(x, "attn_out")  # saveable under remat_policy='attn'
    h = res + x
    res = h
    x = layer_norm(h, layer_p["final_ln"])
    x = mlp(x, layer_p, lora=lora)
    return res + x


def encoder_apply(
    params: Params,
    features,
    config: WhisperConfig,
    stem: StemConfig,
    lora: Optional[Params] = None,
    deterministic: bool = True,
    dropout_rng=None,
    return_padded: bool = False,
):
    """[B, ch, T] -> [B, T', d] encoder states.

    Positional table is added in full (the geometry invariant guarantees
    T' == max_source_positions; reference `utils/load_model.py:413-416`).

    With ``return_padded`` the result is ``(states, valid_len)`` where
    ``states`` may keep the flash q-block padding (rows >= valid_len are
    garbage) — the training forward hands this straight to the decoder's
    flash cross-attention (kv_len-masked) so no slice/re-pad pair sits
    between encoder and decoder.
    """
    dtype = jnp.dtype(config.dtype)
    enc = params["encoder"]
    stem_rng = None
    if not deterministic and dropout_rng is not None:
        dropout_rng, stem_rng = jax.random.split(dropout_rng)
    h = apply_stem(enc, features.astype(dtype), config, stem,
                   dropout_rng=stem_rng)
    t = h.shape[1]
    if t != config.max_source_positions:
        raise ValueError(
            f"stem produced {t} frames, expected {config.max_source_positions}"
            " — input length must be 4x the source positions (stride 2 x 2)"
        )
    h = h + enc["pos_embed"].astype(dtype)[None, :t]
    if not deterministic and stem.dropout > 0:
        keep = 1.0 - stem.dropout
        mask = jax.random.bernoulli(dropout_rng, keep, (h.shape[0], h.shape[1], 1))
        h = jnp.where(mask, h / keep, 0.0)

    enc_lora = (lora or {}).get("encoder", {}).get("layers")
    ring_axis = config.seq_parallel_axis
    pipe_axis = config.pipeline_axis
    use_flash = (ring_axis is None and pipe_axis is None
                 and resolve_flash(config, h.shape[1]))

    # Run the layer stack at T padded to the flash q-block multiple so the
    # kernels see already-aligned tensors: the per-call jnp.pad/slice ops
    # around the kernel (8 pads + 4 slices per layer, ~43 ms/step at
    # whisper-base bs64 — round-2 device profile) become no-ops and vanish.
    # Padded rows carry garbage-but-finite values; K/V padding is masked
    # inside the kernel via kv_len, and the rows are sliced off at the end.
    # Under sequence parallelism the pad quantum is instead n_shards x 128
    # lanes (ring_flash_attention's shard contract).
    kv_len = None
    t_valid = h.shape[1]
    if ring_axis is not None:
        from neuspeech1_tpu.ops.flash_attention import _LANE, _round_up

        n_sp = jax.sharding.get_abstract_mesh().shape[ring_axis]
        t_pad = _round_up(t_valid, n_sp * _LANE)
        if t_pad != t_valid:
            h = jnp.pad(h, ((0, 0), (0, t_pad - t_valid), (0, 0)))
            kv_len = t_valid
    elif use_flash:
        from neuspeech1_tpu.ops.flash_attention import btc_block_q, _round_up

        t_pad = _round_up(t_valid, btc_block_q(t_valid))
        if t_pad != t_valid:
            h = jnp.pad(h, ((0, 0), (0, t_pad - t_valid), (0, 0)))
            kv_len = t_valid

    layer_fn = functools.partial(_encoder_layer, use_flash=use_flash,
                                 kv_len=kv_len, ring_axis=ring_axis)
    if config.remat:
        layer_fn = jax.checkpoint(
            layer_fn, static_argnums=(2,), policy=_remat_policy(config)
        )

    if pipe_axis is not None:
        # GPipe over the stacked layers (parallel/pipeline): each device
        # holds L/P layers; microbatches ride the ppermute ring.
        from neuspeech1_tpu.parallel.pipeline import pipeline_scan

        mesh = jax.sharding.get_abstract_mesh()
        batch_axes = tuple(
            a for a in ("data", "fsdp")
            if a in mesh.axis_names and a != pipe_axis
        ) or None
        if enc_lora is None:
            xs = enc["layers"]
            def pbody(carry, layer_p):
                return layer_fn(carry, layer_p, config.encoder_heads)
        else:
            xs = (enc["layers"], enc_lora)
            def pbody(carry, xs_):
                return layer_fn(carry, xs_[0], config.encoder_heads, xs_[1])
        h = pipeline_scan(
            pbody, xs, h, mesh, pipe_axis,
            num_microbatches=config.pipeline_microbatches or None,
            batch_axes=batch_axes,
            # SP x PP: the ring's shard_map nests inside the stage body and
            # must find the seq axis still auto (parallel/pipeline docstring)
            auto_axes=(ring_axis,) if ring_axis is not None else (),
        )
    elif enc_lora is None:
        def body(carry, layer_p):
            return layer_fn(carry, layer_p, config.encoder_heads), None
        h, _ = lax.scan(body, h, enc["layers"], unroll=_scan_unroll(config))
    else:
        def body(carry, xs):
            layer_p, layer_l = xs
            return layer_fn(carry, layer_p, config.encoder_heads, layer_l), None
        h, _ = lax.scan(body, h, (enc["layers"], enc_lora), unroll=_scan_unroll(config))

    if return_padded:
        return layer_norm(h, enc["ln_post"]), t_valid
    if h.shape[1] != t_valid:
        h = h[:, :t_valid]
    return layer_norm(h, enc["ln_post"])


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------

def _decoder_layer(h, layer_p, enc_out, self_mask, n_heads, lora=None,
                   self_cache=None, cross_cache=None, cache_index=None,
                   use_flash=False, cross_kv_len=None, use_flash_self=None,
                   use_flash_cross=None, self_contig=False):
    lora = lora or {}
    res = h
    x = layer_norm(h, layer_p["self_attn_ln"])
    # teacher-forcing decoder SELF-attention has its own flash gate
    # (config.decoder_flash_self_min_q): at tiny T the [B,H,T,T] tensors
    # are small and the kernel's per-instance overhead dominates, so the
    # XLA path wins while cross-attention stays on the flash kernel
    flash_self = (use_flash if use_flash_self is None else use_flash_self) \
        and self_cache is None
    x, new_self = mha(
        x, layer_p["self_attn"], n_heads,
        mask=None if flash_self else self_mask,
        lora=lora.get("self_attn"), cache=self_cache, cache_index=cache_index,
        use_flash=flash_self, causal=True, self_contig=self_contig,
    )
    h = res + x
    res = h
    x = layer_norm(h, layer_p["cross_attn_ln"])
    flash_cross = (use_flash if use_flash_cross is None else use_flash_cross) \
        and cross_cache is None
    x, new_cross = mha(
        x, layer_p["cross_attn"], n_heads, kv_source=enc_out,
        lora=lora.get("cross_attn"), cache=cross_cache,
        use_flash=flash_cross, kv_len=cross_kv_len,
    )
    h = res + x
    res = h
    x = layer_norm(h, layer_p["final_ln"])
    x = mlp(x, layer_p, lora=lora)
    return res + x, (new_self, new_cross)


def decoder_apply(
    params: Params,
    tokens,
    enc_out,
    config: WhisperConfig,
    lora: Optional[Params] = None,
    cache: Optional[Params] = None,
    cache_index=None,
    enc_valid_len: Optional[int] = None,
    return_hidden: bool = False,
    pos_ids=None,
    self_attn_mask=None,
):
    """Token ids [B, T] -> logits [B, T, vocab].

    ``pos_ids`` / ``self_attn_mask`` (cached decode only): per-row LOGICAL
    position ids [B, T] for the learned pos-embed gather, and a
    [B, 1, T, Tmax] bool mask replacing the contiguous
    ``position <= cache_index + i`` rule. Speculative (multi-token
    draft-verify) decode needs both: per row, accepted tokens live at
    non-contiguous PHYSICAL cache positions (rejected drafts leave
    holes that are never re-read), while logical positions stay dense
    (decode/spec.py).

    ``return_hidden`` (cached decode only): also return the final-LN
    hidden states [B, T, d] — HF's decoder ``last_hidden_state``, needed
    by contrastive search's degeneration penalty.

    Without cache: full causal self-attention (training / teacher forcing).
    With cache: incremental decode — ``cache`` is produced by `init_cache`,
    ``cache_index`` is the write position; returns (logits, new_cache).
    ``enc_valid_len``: when ``enc_out`` keeps the encoder's flash q-block
    padding, the number of valid leading rows (flash cross-attention masks
    the rest via kv_len; the XLA path slices them off).
    """
    dtype = jnp.dtype(config.dtype)
    dec = params["decoder"]
    b, t = tokens.shape
    embed = dec["token_embed"]
    h = embed[tokens].astype(dtype)

    if cache is None:
        pos = dec["pos_embed"].astype(dtype)[None, :t]
        causal = jnp.tril(jnp.ones((t, t), bool))[None, None]
        self_mask = causal
    else:
        if pos_ids is not None:
            pos = dec["pos_embed"][pos_ids].astype(dtype)  # [B, t, d]
        else:
            pos = lax.dynamic_slice(
                dec["pos_embed"], (cache_index, 0),
                (t, dec["pos_embed"].shape[1])
            ).astype(dtype)[None]
        if self_attn_mask is not None:
            self_mask = self_attn_mask
        else:
            sc0 = cache["self"][0]
            t_max = (sc0["k_tm"].shape[0] if "k_tm" in sc0
                     else sc0["k_bt"].shape[1] if "k_bt" in sc0
                     else sc0["k_tu"].shape[-1] if "k_tu" in sc0
                     else sc0["k_t"].shape[-1])
            positions = jnp.arange(t_max)[None, None, None, :]
            self_mask = positions <= (
                cache_index + jnp.arange(t)[:, None]).reshape(1, 1, t, 1)
    h = h + pos

    dec_lora = (lora or {}).get("decoder", {}).get("layers")
    enc_out = enc_out.astype(dtype)
    pipe_axis = config.pipeline_axis if cache is None else None
    use_flash = cache is None and pipe_axis is None \
        and resolve_flash(config, enc_out.shape[1]) \
        and resolve_flash(config, t) and t >= config.decoder_flash_min_q
    use_flash_self = use_flash and t >= getattr(
        config, "decoder_flash_self_min_q", 256)
    use_flash_cross = use_flash and t >= getattr(
        config, "decoder_flash_cross_min_q", 1)
    kv_len = None
    if enc_valid_len is not None and enc_valid_len != enc_out.shape[1]:
        if use_flash_cross:
            kv_len = enc_valid_len
        else:
            enc_out = enc_out[:, :enc_valid_len]

    if cache is None and pipe_axis is not None:
        # GPipe over the decoder stack: enc_out rides as a per-sample
        # scheduled const (each stage indexes the microbatch it holds),
        # the causal mask as a replicated const (parallel/pipeline).
        from neuspeech1_tpu.parallel.pipeline import pipeline_scan

        mesh = jax.sharding.get_abstract_mesh()
        batch_axes = tuple(
            a for a in ("data", "fsdp")
            if a in mesh.axis_names and a != pipe_axis
        ) or None
        if dec_lora is None:
            xs = dec["layers"]
            def pbody(carry, layer_p, enc_mb, mask):
                out, _ = _decoder_layer(
                    carry, layer_p, enc_mb, mask, config.decoder_heads)
                return out
        else:
            xs = (dec["layers"], dec_lora)
            def pbody(carry, xs_, enc_mb, mask):
                out, _ = _decoder_layer(
                    carry, xs_[0], enc_mb, mask, config.decoder_heads,
                    lora=xs_[1])
                return out
        h = pipeline_scan(
            pbody, xs, h, mesh, pipe_axis,
            num_microbatches=config.pipeline_microbatches or None,
            batch_axes=batch_axes, consts=(self_mask,),
            sample_consts=(enc_out,),
        )
        new_cache = None
    elif cache is None:
        if dec_lora is None:
            def body(carry, layer_p):
                out, _ = _decoder_layer(
                    carry, layer_p, enc_out, self_mask, config.decoder_heads,
                    use_flash=use_flash, cross_kv_len=kv_len,
                    use_flash_self=use_flash_self,
                    use_flash_cross=use_flash_cross,
                )
                return out, None
            h, _ = lax.scan(body, h, dec["layers"], unroll=_scan_unroll(config))
        else:
            def body(carry, xs):
                layer_p, layer_l = xs
                out, _ = _decoder_layer(
                    carry, layer_p, enc_out, self_mask, config.decoder_heads,
                    lora=layer_l, use_flash=use_flash, cross_kv_len=kv_len,
                    use_flash_self=use_flash_self,
                    use_flash_cross=use_flash_cross,
                )
                return out, None
            h, _ = lax.scan(body, h, (dec["layers"], dec_lora), unroll=_scan_unroll(config))
        new_cache = None
    else:
        # Per-layer cache leaves + a Python loop over layers: the earlier
        # stacked [L, ...] cache under a (even fully unrolled) lax.scan
        # still paid per-token dynamic-slice/DUS-restack plumbing on every
        # cache buffer — the round-3 beam device trace attributed ~15.5
        # ms/batch (bs32) to those slice/copy fusions alone. With one
        # buffer per layer, XLA aliases each K/V in place and the beam
        # reorder gathers each buffer directly.
        n_layers = len(cache["self"])
        new_self, new_cross = [], []
        for i in range(n_layers):
            layer_p = jax.tree_util.tree_map(lambda x: x[i], dec["layers"])
            layer_l = (None if dec_lora is None else
                       jax.tree_util.tree_map(lambda x: x[i], dec_lora))
            h, (ns, nc) = _decoder_layer(
                h, layer_p, enc_out, self_mask, config.decoder_heads,
                lora=layer_l, self_cache=cache["self"][i],
                cross_cache=cache["cross"][i], cache_index=cache_index,
                # static true cross length (BTC caches are row-padded)
                cross_kv_len=enc_out.shape[1],
                # mask is the implicit contiguous position<=cache_index
                # rule (not a caller-supplied spec-decode hole mask) —
                # q_len==1 steps may take the fused decode-step kernel
                self_contig=self_attn_mask is None,
            )
            new_self.append(ns)
            new_cross.append(nc)
        new_cache = {"self": tuple(new_self), "cross": tuple(new_cross)}

    h = layer_norm(h, dec["ln"])
    logits = jnp.dot(h, embed.T.astype(dtype))
    if cache is None:
        return logits
    if return_hidden:
        return logits, new_cache, h
    return logits, new_cache


def _quantize_kv_int8(x):
    """Symmetric int8 over the time axis of [B, H, T, Dh], one scale per
    (batch, head, channel) column: (int8 values, f32 scales [B,H,1,Dh]).
    Same semantics as the weight quantizer — one implementation."""
    from neuspeech1_tpu.models.quantize import quantize_int8

    q, scale = quantize_int8(x.astype(jnp.float32))
    return q, scale


def _decode_cross_layout(config: WhisperConfig, int8_cross: bool) -> str:
    """Cross-cache layout for incremental decode.

    'btc'  [B, Tpad, H*D]: the K/V projections' NATIVE layout (no build
           transpose) feeding the batched block-diagonal Pallas kernel
           (`ops/flash_attention.py::flash_decode_cross_btc`) on TPU —
           round-3 probe: 325 GB/s vs 27-29 GB/s for same-layout XLA;
    'bhtd' [B, H, T, D]: contiguous per-(b,h) panes for the XLA batched
           matmul (round-2 path; also carries the int8 variant).
    NEUSPEECH_DECODE_CROSS overrides ('btc'|'bhtd'); default 'auto'.
    """
    mode = _os.environ.get("NEUSPEECH_DECODE_CROSS", "auto")
    if mode in ("btc", "bhtd"):
        return mode
    # 'bhtd' measured FASTER in-program (round 3, whisper-base bs64 greedy:
    # 4.46 vs 5.87 ms/token): XLA lowers the per-(b,h) matvec as
    # multiply+lane-reduce VPU fusions that stream the cache at full HBM
    # bandwidth (~1.4 ms/token of the total), while the MXU-based BTC
    # kernel pays a 16x N-padding compute tax (3.7 ms for the same bytes).
    # The BTC kernel stays selectable for geometries with more heads*beams
    # per 128 lanes; see ops/flash_attention.py::flash_decode_cross_btc.
    return "bhtd"


def init_cache(params: Params, enc_out, config: WhisperConfig, max_len: int,
               int8_cross: bool = False, self_batch: Optional[int] = None,
               self_t_major: bool = False):
    """Fixed-shape KV cache; cross-attention K/V precomputed from enc_out.

    Cache leaves are PER LAYER (tuples of per-layer dicts, no stacked [L]
    dim): each buffer aliases in place across decode steps and the beam
    reorder gathers it directly — the stacked layout cost per-token
    slice/restack plumbing (see decoder_apply).

    self k/v: per-layer TRANSPOSED [B, H, Dh, max_len] (T on the lane
    axis — see `_self_decode_dt`; one lane column written per step);
    cross k/v: layout per `_decode_cross_layout` — 'btc'
    [B, Tpad, H·Dh] (kernel-native, zero-padded rows masked via the static
    kv_len) or 'bhtd' [B, H, T_src, Dh] (transposed ONCE here so the
    per-token full-cache XLA reads stream contiguously; see `mha`).

    ``int8_cross``: store the cross K/V int8 with per-(b,h,channel) scales —
    incremental decode re-reads the WHOLE cross cache every token, so
    halving its bytes halves decode's dominant HBM stream. The scales fold
    into the TINY side of each product (Q for scores, the output for PV),
    so the dots read the int8 arrays directly (see the `mha` cross branch).

    ``self_batch``: decoder-row count when it exceeds the encoder batch —
    beam search runs B·K decoder rows against ONE cross cache per
    utterance (cross K/V is beam-invariant; `mha` folds the beam dim into
    the query rows), so only the self cache is allocated at B·K.
    """
    dtype = jnp.dtype(config.dtype)
    dec = params["decoder"]
    b = enc_out.shape[0]
    h = config.decoder_heads
    dh = config.d_model // h
    L = jax.tree_util.tree_leaves(dec["layers"])[0].shape[0]
    layout = _decode_cross_layout(config, int8_cross)

    def per_layer_cross(layer_p):
        kc = linear(enc_out.astype(dtype), layer_p["cross_attn"]["k"])
        vc = linear(enc_out.astype(dtype), layer_p["cross_attn"]["v"])
        if layout == "btc":
            t = kc.shape[1]
            t_pad = -(-t // 8) * 8
            if t_pad != t:
                kc = jnp.pad(kc, ((0, 0), (0, t_pad - t), (0, 0)))
                vc = jnp.pad(vc, ((0, 0), (0, t_pad - t), (0, 0)))
            return {"k_btc": kc, "v_btc": vc}
        k = _split_heads(kc, h).transpose(0, 2, 1, 3)
        v = _split_heads(vc, h).transpose(0, 2, 1, 3)
        if int8_cross:
            # int8 values stored TRANSPOSED [B, H, Dh, T] so the decode
            # multiply+reduce fusions carry T on the 128-lane axis (full
            # width; T=1500 -> 12 lane tiles). The BHTD orientation put
            # Dh=64 on lanes — half the VPU idle — and measured the int8
            # stream at ~440 GB/s vs ~880 for bf16 (round-3 steady-state
            # decode trace: cross 2.0 ms/token of a 4.4 ms busy loop).
            # Scales stay per-(b,h,channel) [B, H, 1, Dh] (quantize over
            # the T axis); the transpose is a one-time setup op.
            k_q, k_s = _quantize_kv_int8(k)
            v_q, v_s = _quantize_kv_int8(v)
            return {"k_qt": k_q.transpose(0, 1, 3, 2), "k_s": k_s,
                    "v_qt": v_q.transpose(0, 1, 3, 2), "v_s": v_s}
        if _flash_decode_on():
            # the opt-in streaming kernel reads BHTD panes; keep its layout
            return {"k": k, "v": v}
        return {"k_t": k.transpose(0, 1, 3, 2),
                "v_t": v.transpose(0, 1, 3, 2)}

    if layout == "btc" or _flash_decode_on():
        cross = tuple(
            per_layer_cross(
                jax.tree_util.tree_map(lambda x: x[i], dec["layers"]))
            for i in range(L)
        )
    else:
        # batched all-layer K/V build: ONE einsum per projection reads
        # enc_out once for all L layers (12 separate per-layer linears
        # re-streamed the ~100 MB encoder output and left ~35 XLA layout
        # copies in the setup — ~5% of a serving batch at bs32)
        ca = dec["layers"]["cross_attn"]
        e16 = enc_out.astype(dtype)
        def all_layers(p):
            # [B,T,C] x [L,C,H*Dh] -> [L,B,H,T,Dh]
            w = p["w"].astype(dtype).reshape(L, e16.shape[-1], h, dh)
            kv = jnp.einsum("btc,lchd->lbhtd", e16, w)
            if p.get("b") is not None:
                kv = kv + p["b"].astype(dtype).reshape(L, 1, h, 1, dh)
            return kv
        k_all = all_layers(ca["k"])
        v_all = all_layers(ca["v"])
        if int8_cross:
            kq_all, ks_all = _quantize_kv_int8(k_all)
            vq_all, vs_all = _quantize_kv_int8(v_all)
            cross = tuple(
                {"k_qt": kq_all[i].transpose(0, 1, 3, 2), "k_s": ks_all[i],
                 "v_qt": vq_all[i].transpose(0, 1, 3, 2), "v_s": vs_all[i]}
                for i in range(L))
        else:
            cross = tuple(
                {"k_t": k_all[i].transpose(0, 1, 3, 2),
                 "v_t": v_all[i].transpose(0, 1, 3, 2)}
                for i in range(L))
    # the true (pre-pad) kv length is re-derived statically from
    # enc_out.shape[1] inside decoder_apply — no dynamic state in the cache.
    # self K/V are TRANSPOSED [B, H, Dh, Tmax] (see _self_decode_dt), or
    # T-MAJOR [Tmax, B, H, Dh] when ``self_t_major`` (multi-token
    # speculative decode — see _self_decode_tm for why).
    if self_t_major:
        mode = _os.environ.get("NEUSPEECH_SPEC_SELF", "dtu")
        if mode == "tm":
            zeros = jnp.zeros((max_len, self_batch or b, h, dh), dtype)
            return {"self": tuple({"k_tm": zeros, "v_tm": zeros}
                                  for _ in range(L)),
                    "cross": cross}
        if mode == "bt":
            zeros = jnp.zeros((self_batch or b, max_len, h, dh), dtype)
            return {"self": tuple({"k_bt": zeros, "v_bt": zeros}
                                  for _ in range(L)),
                    "cross": cross}
        zeros = jnp.zeros((self_batch or b, h, dh, max_len), dtype)
        return {"self": tuple({"k_tu": zeros, "v_tu": zeros}
                              for _ in range(L)),
                "cross": cross}
    zeros = jnp.zeros((self_batch or b, h, dh, max_len), dtype)
    return {"self": tuple({"k_t": zeros, "v_t": zeros} for _ in range(L)),
            "cross": cross}


# --------------------------------------------------------------------------
# full model
# --------------------------------------------------------------------------

def forward(
    params: Params,
    features,
    decoder_input_ids,
    config: WhisperConfig,
    stem: StemConfig,
    lora: Optional[Params] = None,
    deterministic: bool = True,
    dropout_rng=None,
):
    """Training/teacher-forcing forward: logits [B, T, vocab]."""
    enc_out, enc_valid = encoder_apply(
        params, features, config, stem, lora=lora,
        deterministic=deterministic, dropout_rng=dropout_rng,
        return_padded=True,
    )
    return decoder_apply(params, decoder_input_ids, enc_out, config,
                         lora=lora, enc_valid_len=enc_valid)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def ce_loss(logits, labels, ignore_id: int = -100):
    """Token-mean cross entropy with -100 masking (reference
    `utils/load_model.py:1050-1054`).

    Forward: logsumexp(logits) - logits[label] — only reductions and a
    gather touch the [B, T, V] tensor (no f32 log-softmax materialization;
    at whisper's 51865-wide vocab that intermediate alone is ~850 MB for a
    bs-64 batch). Backward (custom VJP): dlogits = (softmax − onehot)·w is
    emitted directly in the LOGITS dtype as one fused elementwise kernel
    from the saved f32 lse row statistics — autodiff would otherwise
    materialize the f32 softmax AND a scatter-subtract before downcasting.
    """
    loss, _ = _ce_fwd_impl(logits, labels, ignore_id)
    return loss


def _ce_fwd_impl(logits, labels, ignore_id):
    mask = labels != ignore_id
    safe = jnp.where(mask, labels, 0)
    # logsumexp spelled so the f32 upcast of the [B,T,V] logits has exactly
    # ONE consumer chain (the exp-sum reduce): the row max is exact in the
    # logits dtype, and XLA then fuses the cast+exp into the reduction
    # instead of materializing an f32 copy of the logits (~850 MB at
    # whisper's vocab for a bs-64 batch — measured 2.3 ms/step of pure
    # HBM write before this change)
    m = jax.lax.stop_gradient(jnp.max(logits, axis=-1))
    s = jnp.sum(
        jnp.exp(logits.astype(jnp.float32) - m.astype(jnp.float32)[..., None]),
        axis=-1,
    )
    lse = jnp.log(s) + m.astype(jnp.float32)
    picked = jnp.take_along_axis(
        logits, safe[..., None], axis=-1
    )[..., 0].astype(jnp.float32)
    # true nll >= 0; the clamp removes f32 summation noise (~1e-4) visible
    # once a model memorizes its data
    nll = jnp.maximum(lse - picked, 0.0)
    n = jnp.maximum(jnp.sum(mask), 1)
    loss = jnp.sum(nll * mask) / n
    return loss, (lse, n)


def _ce_fwd(logits, labels, ignore_id):
    loss, (lse, n) = _ce_fwd_impl(logits, labels, ignore_id)
    return loss, (logits, labels, lse, n)


def _ce_bwd(ignore_id, res, g):
    logits, labels, lse, n = res
    mask = labels != ignore_id
    safe = jnp.where(mask, labels, 0)
    w = (g * mask.astype(jnp.float32) / n.astype(jnp.float32))[..., None]
    probs = jnp.exp(logits.astype(jnp.float32) - lse[..., None])
    onehot = (
        jnp.arange(logits.shape[-1], dtype=labels.dtype)[None, None, :]
        == safe[..., None]
    )
    dlogits = ((probs - onehot) * w).astype(logits.dtype)
    return dlogits, None


ce_loss.defvjp(_ce_fwd, _ce_bwd)
