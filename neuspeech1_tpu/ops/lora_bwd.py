"""Fused (Ada)LoRA adapter backward — one pass over (x, dy) on TPU.

The fold_lora training path (reference regime: base frozen, LoRA/AdaLoRA
adapters trainable — `/root/reference/finetune.py:176-177,205-212`) needs
only rank-r adapter cotangents from each adapted matmul:

    t1 = dy B^T          [N, r]
    u  = x A             [N, r]
    dA_raw = x^T t1      [din, r]      (caller applies E/scale)
    dB_raw = u^T dy      [r, dout]
    dE_raw = sum_n u*t1  [r]

Why a kernel: XLA computes these as four separate dot fusions, each
streaming the full [B,T,din] x / [B,T,dout] dy activations from HBM again
(round-3 device trace: +22.5 ms/step vs the merged-weight dW path at
whisper-base bs64 — MORE than the 18.7 ms of full-rank dW_eff gradients it
replaces, despite 5x fewer FLOPs, because the narrow N=r dots run at ~25%
MXU and the operands are re-read per dot). This kernel tiles the token dim,
reads x and dy ONCE (same traffic as one dW dot), keeps the f32
[din,r]/[r,dout] accumulators resident in VMEM across grid steps, and
overlaps the narrow dots with the streaming DMA. Measured: the adapter
backward drops to its ~N=r MXU floor (~14 ms/step across the 36 adapted
matrices) instead of 18.7 (dW_eff) or 22.5 (XLA narrow dots).

Used by `models/lora.py::folded_linear`'s custom VJP when shapes qualify
(token count divisible by the block, din/dout lane-aligned); the einsum
fallback remains for CPU tests and odd geometries.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover - no backend at all
        return False


def _kernel(x_ref, dy_ref, a_ref, b_ref, da_ref, db_ref, de_ref,
            da_acc, db_acc, de_acc, *, n_blocks):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        da_acc[...] = jnp.zeros_like(da_acc)
        db_acc[...] = jnp.zeros_like(db_acc)
        de_acc[...] = jnp.zeros_like(de_acc)

    x = x_ref[...]            # [BN, din]
    dy = dy_ref[...]          # [BN, dout]
    a = a_ref[...]            # [din, r]
    b = b_ref[...]            # [r, dout]

    # t1 = dy B^T ; u = x A   (f32 accumulation on the MXU)
    t1 = jax.lax.dot_general(
        dy, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    u = jax.lax.dot_general(
        x, a, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    # dA += x^T t1 ; dB += u^T dy
    da_acc[...] += jax.lax.dot_general(
        x, t1.astype(x.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db_acc[...] += jax.lax.dot_general(
        u.astype(dy.dtype), dy, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # dE += rowsum(u * t1)
    de_acc[...] += jnp.sum(u * t1, axis=0, keepdims=True)

    @pl.when(i == n_blocks - 1)
    def _():
        da_ref[...] = da_acc[...]
        db_ref[...] = db_acc[...]
        de_ref[...] = de_acc[...]


def _vmem_est(block_n: int, din: int, dout: int, r: int) -> int:
    """Scoped-VMEM estimate in bytes. The r-wide tiles pad the lane dim to
    128 (t1/u/dA accumulators and outputs) and the [r, dout] tiles pad the
    sublane dim to 8 — the first fc2-shaped compile OOM'd at 16.55M against
    the 16M scoped limit precisely because of this padding."""
    rp = max(r, 128)
    r8 = max(r, 8)
    dbuf_in = 2 * block_n * (din + dout) * 2          # x/dy bf16, 2-deep
    t1u = 2 * block_n * rp * 4                        # f32 [bn, r->128]
    da = 2 * din * rp * 4                             # acc + out block
    db = 2 * r8 * dout * 4
    de = 2 * 8 * rp * 4
    ab_in = din * rp * 2 + r8 * dout * 2              # A/B operand blocks
    return dbuf_in + t1u + da + db + de + ab_in


def pick_block_n(n_tokens: int, din: int, dout: int, r: int):
    """Largest token block that divides n_tokens and fits scoped VMEM
    (None if no candidate works — caller falls back to the einsum path)."""
    if din % 128 or dout % 128 or r > 128:
        return None
    for bn in (1024, 512, 256):
        if n_tokens % bn == 0 and n_tokens >= bn and \
                _vmem_est(bn, din, dout, r) < 12 * 1024 * 1024:
            return bn
    return None


def lora_bwd_available(n_tokens: int, din: int, dout: int, r: int,
                       block_n: int = 1024) -> bool:
    """Shape gate used by tests; production callers use `pick_block_n`."""
    return pick_block_n(n_tokens, din, dout, r) is not None


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def lora_adapter_bwd(x2, dy2, a, b, block_n: int = 1024,
                     interpret: bool = False):
    """(x [N,din], dy [N,dout], A [din,r], B [r,dout]) ->
    (dA_raw f32 [din,r], dB_raw f32 [r,dout], dE_raw f32 [r]).

    Raw products only — the caller applies the AdaLoRA E column scaling and
    alpha/r scale (see `models/lora.py::_folded_linear_bwd`). dx stays an
    XLA dot at the caller: an in-kernel dx matmul measured 228 vs 207
    ms/step (lost pipelining + consumer fusion, tighter VMEM).
    """
    n, din = x2.shape
    dout = dy2.shape[1]
    r = a.shape[1]
    n_blocks = n // block_n
    da, db, de = pl.pallas_call(
        functools.partial(_kernel, n_blocks=n_blocks),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block_n, din), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, dout), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((din, r), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, dout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((din, r), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, dout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((din, r), jnp.float32),
            jax.ShapeDtypeStruct((r, dout), jnp.float32),
            jax.ShapeDtypeStruct((1, r), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((din, r), jnp.float32),
            pltpu.VMEM((r, dout), jnp.float32),
            pltpu.VMEM((1, r), jnp.float32),
        ],
        interpret=interpret,
    )(x2, dy2, a, b)
    return da, db, de[0]
