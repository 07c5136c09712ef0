"""Pallas TPU flash attention (forward + custom-VJP backward).

Why: XLA's materialized attention writes [B, H, T, T] score/prob tensors to
HBM — for the whisper-base encoder (T=1500, B=64, H=8) that is ~2.3-4.6 GB
per layer per pass and dominates step time. This kernel keeps score tiles in
VMEM (q-block x full-K), writing only O and the logsumexp rows.

Design (v5e: 16 MB VMEM, MXU 128x128):
  * grid (B*H, Tq/BLOCK_Q) forward; K/V blocks are grid-invariant along the
    q axis so Pallas keeps them resident in VMEM across q-blocks;
  * full-K tiles: T<=~4k keeps [BLOCK_Q, T] f32 scores in VMEM (whisper is
    fixed T=1500 -> padded 1536), so no online-softmax rescaling is needed —
    a single max/exp/sum per row block;
  * backward: grid (B*H,), fori_loop over q-blocks with f32 dK/dV
    accumulators in VMEM scratch, probs recomputed from the saved lse;
  * non-square Tq x Tkv supported (decoder cross-attention), causal masking
    supported for Tq == Tkv (decoder self-attention in training).

Numerics: scores/softmax in f32 (matching `models/whisper.py::attention`),
P cast to the value dtype for the PV matmul, outputs in the input dtype.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ----------------------------------------------------------------------
# forward
# ----------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, t_q, t_kv,
                block_q, causal):
    qi = pl.program_id(1)
    q = q_ref[0]  # [BQ, D]
    k = k_ref[0]  # [Tk_pad, D]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [BQ, Tk_pad]

    kv_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    mask = kv_idx < t_kv
    if causal:
        q_idx = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        mask = mask & (kv_idx <= q_idx)
    s = jnp.where(mask, s, NEG_INF)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / l
    o_ref[0] = o.astype(o_ref.dtype)
    # lse is stored [.., 8, block_q] (8 replicated sublanes) to satisfy the
    # TPU (8, 128) min-tile constraint for f32 blocks
    lse = (m + jnp.log(l))[:, 0]
    lse_ref[0] = jnp.broadcast_to(lse[None, :], (8, lse.shape[0]))


def _fwd_arrays(q, k, v, scale, causal, block_q, t_q, t_kv):
    """Pallas forward on padded [bh, ...] arrays (partitionable on dim 0)."""
    bh, tq_pad, d = q.shape
    tk_pad = k.shape[1]
    grid = (bh, tq_pad // block_q)
    o, lse = pl.pallas_call(
        functools.partial(
            _fwd_kernel, scale=scale, t_q=t_q, t_kv=t_kv,
            block_q=block_q, causal=causal,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, block_q), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, tq_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, 8, tq_pad), jnp.float32),
        ],
        interpret=not on_tpu(),
    )(q, k, v)
    return o, lse


def _fwd(q, k, v, scale, causal, block_q):
    bh, t_q, d = q.shape
    t_kv = k.shape[1]
    tq_pad = _round_up(t_q, block_q)
    tk_pad = _round_up(t_kv, 128)
    q = jnp.pad(q, ((0, 0), (0, tq_pad - t_q), (0, 0)))
    k = jnp.pad(k, ((0, 0), (0, tk_pad - t_kv), (0, 0)))
    v = jnp.pad(v, ((0, 0), (0, tk_pad - t_kv), (0, 0)))
    o, lse = _fwd_sharded(q, k, v, scale, causal, block_q, t_q, t_kv)
    return o[:, :t_q], lse


# ----------------------------------------------------------------------
# backward
# ----------------------------------------------------------------------

def _bwd_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref,
                dq_ref, dk_ref, dv_ref, dk_acc, dv_acc, *,
                scale, t_q, t_kv, block_q, causal, n_q_blocks):
    """Grid (BH, n_q_blocks): q/o/do blocks are pipelined by Pallas (double
    buffered) while K/V stay VMEM-resident (grid-invariant index); dK/dV
    accumulate in f32 scratch that persists across the q-block grid steps
    and are written out on the final block."""
    qb = pl.program_id(1)
    k = k_ref[0]
    v = v_ref[0]

    @pl.when(qb == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q = q_ref[0]              # [BQ, D]
    o = o_ref[0]
    do = do_ref[0]
    lse = lse_ref[0, 0]       # [BQ] (sublane-replicated storage)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [BQ, Tk_pad]
    kv_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    mask = kv_idx < t_kv
    if causal:
        q_idx = qb * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        mask = mask & (kv_idx <= q_idx)
    s = jnp.where(mask, s, NEG_INF)
    p = jnp.exp(s - lse[:, None])  # [BQ, Tk_pad] f32

    do_f = do.astype(jnp.float32)
    o_f = o.astype(jnp.float32)
    # dV += P^T dO
    dv_acc[...] += jax.lax.dot_general(
        p, do_f, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # dP = dO V^T ; dS = P * (dP - rowsum(dO*O)) * scale
    dp = jax.lax.dot_general(
        do_f, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    delta = jnp.sum(do_f * o_f, axis=-1, keepdims=True)
    ds = p * (dp - delta) * scale  # [BQ, Tk_pad]
    # dQ = dS K
    dq = jax.lax.dot_general(
        ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dq_ref[0] = dq.astype(dq_ref.dtype)
    # dK += dS^T Q
    dk_acc[...] += jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(qb == n_q_blocks - 1)
    def _():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _bwd_arrays(qp, kp, vp, op, dop, lsep, scale, causal, block_q, t_q, t_kv):
    """Pallas backward on padded [bh, ...] arrays (partitionable on dim 0)."""
    bh, tq_pad, d = qp.shape
    tk_pad = kp.shape[1]
    n_q_blocks = tq_pad // block_q
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_kernel, scale=scale, t_q=t_q, t_kv=t_kv, block_q=block_q,
            causal=causal, n_q_blocks=n_q_blocks,
        ),
        grid=(bh, n_q_blocks),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, block_q), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, tq_pad, d), qp.dtype),
            jax.ShapeDtypeStruct((bh, tk_pad, d), kp.dtype),
            jax.ShapeDtypeStruct((bh, tk_pad, d), vp.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((tk_pad, d), jnp.float32),
            pltpu.VMEM((tk_pad, d), jnp.float32),
        ],
        interpret=not on_tpu(),
    )(qp, kp, vp, op, dop, lsep)
    return dq, dk, dv


def _bwd(scale, causal, block_q, res, g):
    q, k, v, o, lse = res
    do = g
    bh, t_q, d = q.shape
    t_kv = k.shape[1]
    tq_pad = _round_up(t_q, block_q)
    tk_pad = _round_up(t_kv, 128)
    qp = jnp.pad(q, ((0, 0), (0, tq_pad - t_q), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, tk_pad - t_kv), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, tk_pad - t_kv), (0, 0)))
    op = jnp.pad(o, ((0, 0), (0, tq_pad - t_q), (0, 0)))
    dop = jnp.pad(do, ((0, 0), (0, tq_pad - t_q), (0, 0)))
    lsep = lse  # already [bh, 8, tq_pad] from the forward
    dq, dk, dv = _bwd_sharded(
        qp, kp, vp, op, dop, lsep, scale, causal, block_q, t_q, t_kv
    )
    return dq[:, :t_q], dk[:, :t_kv], dv[:, :t_kv]


# ----------------------------------------------------------------------
# BTHD layout: kernels reading [B, T, H, D] directly — the layout the
# q/k/v projections produce with a free reshape, so NO [B,T,H,D]→[B,H,T,D]
# transposes bracket the kernel (4 transposed tensors per layer per
# direction otherwise). Grid (B, H, nq); K/V blocks grid-invariant over nq.
# ----------------------------------------------------------------------

def _fwd_kernel_bthd(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, t_q,
                     t_kv, block_q, causal, n_heads):
    """Grid (B, nq); blocks carry ALL heads (Mosaic requires the last two
    block dims divisible by (8,128) or equal to the array dims — a 1-sized
    head block is rejected, a full H block is legal). Heads are processed
    by an unrolled loop of 2-D dots."""
    qi = pl.program_id(1)
    for hh in range(n_heads):
        q = q_ref[0, :, hh, :]      # [BQ, D]
        k = k_ref[0, :, hh, :]      # [Tk_pad, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        kv_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        mask = kv_idx < t_kv
        if causal:
            q_idx = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, s.shape, 0)
            mask = mask & (kv_idx <= q_idx)
        s = jnp.where(mask, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, :, hh, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) / l
        o_ref[0, :, hh, :] = o.astype(o_ref.dtype)
        lse = (m + jnp.log(l))[:, 0]
        lse_ref[0, hh] = jnp.broadcast_to(lse[None, :], (8, lse.shape[0]))


def _fwd_arrays_bthd(q, k, v, scale, causal, block_q, t_q, t_kv):
    """Forward on padded [B, Tq_pad, H, D] arrays (shardable on B and H)."""
    b, tq_pad, h, d = q.shape
    tk_pad = k.shape[1]
    grid = (b, tq_pad // block_q)
    o, lse = pl.pallas_call(
        functools.partial(
            _fwd_kernel_bthd, scale=scale, t_q=t_q, t_kv=t_kv,
            block_q=block_q, causal=causal, n_heads=h,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, h, d), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, h, d), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, h, d), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, h, d), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, 8, block_q), lambda b, i: (b, 0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, tq_pad, h, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, 8, tq_pad), jnp.float32),
        ],
        interpret=not on_tpu(),
    )(q, k, v)
    return o, lse


def _bwd_kernel_bthd(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref,
                     dq_ref, dk_ref, dv_ref, *,
                     scale, t_q, t_kv, block_q, causal, n_q_blocks, n_heads):
    """Grid (B, nq). dK/dV accumulate directly into their (grid-invariant,
    f32) output blocks — they stay VMEM-resident across the q-block steps,
    so no separate scratch is needed and VMEM stays within budget at
    whisper-base geometry."""
    qb = pl.program_id(1)

    @pl.when(qb == 0)
    def _():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    for hh in range(n_heads):
        k = k_ref[0, :, hh, :]
        v = v_ref[0, :, hh, :]
        q = q_ref[0, :, hh, :]
        o = o_ref[0, :, hh, :]
        do = do_ref[0, :, hh, :]
        lse = lse_ref[0, hh, 0]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        kv_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        mask = kv_idx < t_kv
        if causal:
            q_idx = qb * block_q + jax.lax.broadcasted_iota(
                jnp.int32, s.shape, 0)
            mask = mask & (kv_idx <= q_idx)
        s = jnp.where(mask, s, NEG_INF)
        p = jnp.exp(s - lse[:, None])

        do_f = do.astype(jnp.float32)
        o_f = o.astype(jnp.float32)
        dv_ref[0, :, hh, :] += jax.lax.dot_general(
            p, do_f, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            do_f, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        delta = jnp.sum(do_f * o_f, axis=-1, keepdims=True)
        ds = p * (dp - delta) * scale
        dq = jax.lax.dot_general(
            ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dq_ref[0, :, hh, :] = dq.astype(dq_ref.dtype)
        dk_ref[0, :, hh, :] += jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


def _bwd_arrays_bthd(qp, kp, vp, op, dop, lsep, scale, causal, block_q,
                     t_q, t_kv):
    b, tq_pad, h, d = qp.shape
    tk_pad = kp.shape[1]
    # smaller q blocks than forward (dk/dv f32 output blocks are resident),
    # but the caller padded Tq to the FORWARD block size — the backward
    # block must divide tq_pad or the tail q-block would never run,
    # leaving dq rows uninitialized and dk/dv missing contributions
    # (tq_pad is always a multiple of 8)
    bq = min(block_q, 256)
    while tq_pad % bq:
        bq -= 8
    block_q = bq
    n_q_blocks = tq_pad // block_q
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_kernel_bthd, scale=scale, t_q=t_q, t_kv=t_kv,
            block_q=block_q, causal=causal, n_q_blocks=n_q_blocks, n_heads=h,
        ),
        grid=(b, n_q_blocks),
        in_specs=[
            pl.BlockSpec((1, block_q, h, d), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, h, d), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, h, d), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, h, d), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, h, d), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, 8, block_q), lambda b, i: (b, 0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, h, d), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, h, d), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, h, d), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, tq_pad, h, d), qp.dtype),
            jax.ShapeDtypeStruct((b, tk_pad, h, d), jnp.float32),
            jax.ShapeDtypeStruct((b, tk_pad, h, d), jnp.float32),
        ],
        interpret=not on_tpu(),
    )(qp, kp, vp, op, dop, lsep)
    return dq, dk.astype(kp.dtype), dv.astype(vp.dtype)


def _fwd_bthd(q, k, v, scale, causal, block_q):
    b, t_q, h, d = q.shape
    t_kv = k.shape[1]
    tq_pad = _round_up(t_q, block_q)
    tk_pad = _round_up(t_kv, 128)
    q = jnp.pad(q, ((0, 0), (0, tq_pad - t_q), (0, 0), (0, 0)))
    k = jnp.pad(k, ((0, 0), (0, tk_pad - t_kv), (0, 0), (0, 0)))
    v = jnp.pad(v, ((0, 0), (0, tk_pad - t_kv), (0, 0), (0, 0)))
    o, lse = _fwd_sharded_bthd(q, k, v, scale, causal, block_q, t_q, t_kv)
    return o[:, :t_q], lse


def _bwd_bthd(scale, causal, block_q, res, g):
    q, k, v, o, lse = res
    do = g
    b, t_q, h, d = q.shape
    t_kv = k.shape[1]
    tq_pad = _round_up(t_q, block_q)
    tk_pad = _round_up(t_kv, 128)
    qp = jnp.pad(q, ((0, 0), (0, tq_pad - t_q), (0, 0), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, tk_pad - t_kv), (0, 0), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, tk_pad - t_kv), (0, 0), (0, 0)))
    op = jnp.pad(o, ((0, 0), (0, tq_pad - t_q), (0, 0), (0, 0)))
    dop = jnp.pad(do, ((0, 0), (0, tq_pad - t_q), (0, 0), (0, 0)))
    dq, dk, dv = _bwd_sharded_bthd(
        qp, kp, vp, op, dop, lse, scale, causal, block_q, t_q, t_kv
    )
    return dq[:, :t_q], dk[:, :t_kv], dv[:, :t_kv]


# ----------------------------------------------------------------------
# BTC layout: kernels reading [B, T, H*D] — the EXACT memory layout the
# fused q/k/v projections produce ([B,T,H,D] is a free bitcast of it), so
# neither transposes NOR head-splitting reshapes bracket the kernel. Blocks
# are 3-D (the Mosaic release crashes on dots under 4-D blocks — see the
# _BTHD_NATIVE note); the lane dim carries a PAIR of heads (128 lanes, the
# minimum legal lane block), split by static 64-lane slices in-kernel.
# Grid (B, head_pairs, nq); K/V blocks grid-invariant along nq.
# Measured (v5e, B=64 H=8 T=1536 D=64): fwd 5.5 ms, bwd 9.9 ms per call —
# vs 7.5/14.7 for the BHTD kernels PLUS their pad/transpose ops.
# ----------------------------------------------------------------------

_LANE = 128


def _btc_heads_per_block(d_head: int) -> int:
    """Heads per lane-block; d_head must divide 128. Default = one 128-lane
    register row (2 heads at d_head=64). NEUSPEECH_FLASH_HP overrides for
    experiments (e.g. 4 → 256-lane blocks: half the grid instances, double
    the VMEM per instance)."""
    import os as _os

    hp = int(_os.environ.get("NEUSPEECH_FLASH_HP", "0"))
    if hp > 0:
        return hp
    return max(1, _LANE // d_head)


def _fwd_kernel_btc(q_ref, k_ref, v_ref, *rest, scale, t_kv,
                    block_q, causal, d_head, hp, has_bias=False):
    # with has_bias, an extra [1, 8, Tk_pad] f32 operand carries an
    # EXPLICIT additive bias row (0 / -1e9) instead of the iota-computed
    # kv_len mask — needed when the mask is data-dependent per SPMD shard
    # (ring attention) and usable for ALiBi-style biasing
    if has_bias:
        bias_ref, o_ref, lse_ref = rest
    else:
        o_ref, lse_ref = rest
    qi = pl.program_id(2)
    tk_pad = k_ref.shape[1]

    # Softmax is EXACT for ANY per-row m >= nothing in particular — p/l
    # ratios and lse = m*scale + log(l) are invariant in the shift — so the
    # row max is taken over the RAW dot output (including masked/padded
    # columns) and scale+mask fold into the exp's FMA:
    # p = exp((s - m)*scale + bias). This drops the standalone
    # s*scale(+bias) full-tile VPU pass the old form spent between the dot
    # and the max. Masked/padded columns still underflow to exactly 0
    # through the -1e9 bias. Including them in m is safe: padded K rows are
    # either exact zeros (this wrapper's own padding) or garbage-but-
    # LN-BOUNDED rows (the padded encoder states — every attention K input
    # is post-layernorm), so m exceeds the true max by at most a few score
    # units and exp keeps full f32 relative precision in p/l.
    def bias_for(s_shape):
        if has_bias:
            return bias_ref[0, 0:1, :]
        if causal:
            kv_idx = jax.lax.broadcasted_iota(jnp.int32, s_shape, 1)
            mask = kv_idx < t_kv
            q_idx = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, s_shape, 0)
            mask = mask & (kv_idx <= q_idx)
            return jnp.where(mask, 0.0, NEG_INF)
        if t_kv < tk_pad:
            kv_valid = jax.lax.broadcasted_iota(
                jnp.int32, (1, tk_pad), 1) < t_kv
            return jnp.where(kv_valid, 0.0, NEG_INF)
        return None

    # NOTE: phase-interleaving the hp heads (all score dots first, then the
    # softmax+PV phase) was measured 222.1 vs 220.5 ms/step — holding both
    # f32 score tiles live costs more than any MXU/VPU overlap it buys.
    for hh in range(hp):
        sl = slice(hh * d_head, (hh + 1) * d_head)
        q = q_ref[0, :, sl]              # [BQ, D]
        k = k_ref[0, :, sl]              # [Tk_pad, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        bias = bias_for(s.shape)
        if bias is None:
            p = jnp.exp((s - m) * scale)
        else:
            p = jnp.exp((s - m) * scale + bias)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, :, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) / l
        o_ref[0, :, sl] = o.astype(o_ref.dtype)
        lse = (m * scale + jnp.log(l))[:, 0]
        # 8 replicated sublanes per head (f32 (8,128) min-tile)
        lse_ref[0, hh * 8:(hh + 1) * 8, :] = jnp.broadcast_to(
            lse[None, :], (8, lse.shape[0]))


def _fwd_arrays_btc(q, k, v, scale, causal, block_q, t_q, t_kv, d_head):
    """Forward on padded [B, Tq_pad, C] arrays (shardable on B)."""
    b, tq_pad, c = q.shape
    tk_pad = k.shape[1]
    hp = _btc_heads_per_block(d_head)
    n_heads = c // d_head
    grid = (b, n_heads // hp, tq_pad // block_q)
    hp_cols = hp * d_head
    o, lse = pl.pallas_call(
        functools.partial(
            _fwd_kernel_btc, scale=scale, t_kv=t_kv, block_q=block_q,
            causal=causal, d_head=d_head, hp=hp,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, hp_cols), lambda b, h, i: (b, i, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, hp_cols), lambda b, h, i: (b, 0, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, hp_cols), lambda b, h, i: (b, 0, h),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, hp_cols), lambda b, h, i: (b, i, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8 * hp, block_q), lambda b, h, i: (b, h, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, tq_pad, c), q.dtype),
            jax.ShapeDtypeStruct((b, 8 * n_heads, tq_pad), jnp.float32),
        ],
        interpret=not on_tpu(),
    )(q, k, v)
    return o, lse


def _bwd_kernel_btc(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref, *rest,
                    scale, t_kv, block_q, causal, d_head, hp, n_q_blocks,
                    has_bias=False):
    if has_bias:
        bias_ref, dq_ref, dk_ref, dv_ref, dk_acc, dv_acc = rest
    else:
        dq_ref, dk_ref, dv_ref, dk_acc, dv_acc = rest
    qb = pl.program_id(2)

    @pl.when(qb == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    for hh in range(hp):
        sl = slice(hh * d_head, (hh + 1) * d_head)
        q = q_ref[0, :, sl]
        k = k_ref[0, :, sl]
        v = v_ref[0, :, sl]
        o = o_ref[0, :, sl]
        do = do_ref[0, :, sl]
        lse = lse_ref[0, hh * 8, :]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        # scale+mask folded into the exp's FMA (same one-pass form as the
        # forward kernel): p = exp((s - lse/scale)*scale + bias). The
        # masked/padded columns underflow to exactly 0 through the bias.
        if has_bias:
            bias = bias_ref[0, 0:1, :]
        elif causal:
            kv_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            mask = kv_idx < t_kv
            q_idx = qb * block_q + jax.lax.broadcasted_iota(
                jnp.int32, s.shape, 0)
            mask = mask & (kv_idx <= q_idx)
            bias = jnp.where(mask, 0.0, NEG_INF)
        elif t_kv < k_ref.shape[1]:
            kv_valid = jax.lax.broadcasted_iota(
                jnp.int32, (1, k_ref.shape[1]), 1) < t_kv
            bias = jnp.where(kv_valid, 0.0, NEG_INF)
        else:
            bias = None
        lse_r = (lse * (1.0 / scale))[:, None]
        if bias is None:
            p = jnp.exp((s - lse_r) * scale)
        else:
            p = jnp.exp((s - lse_r) * scale + bias)

        # dots take operands in the INPUT dtype (MXU-native bf16 when the
        # model runs bf16; f32 inputs keep full precision) with f32
        # accumulation — matching what XLA autodiff of the reference
        # attention emits (probs are cast to the value dtype there too)
        op_t = q_ref.dtype
        do_f = do.astype(jnp.float32)
        dv_acc[:, sl] += jax.lax.dot_general(
            p.astype(op_t), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        delta = jnp.sum(do_f * o.astype(jnp.float32), axis=-1, keepdims=True)
        # ds's trailing *scale folds into the SMALL per-instance operands of
        # the dq/dk dots ([Tk,D]/[BQ,D] one-time multiplies) instead of a
        # full [BQ, Tk] tile pass
        ds = (p * (dp - delta)).astype(op_t)
        k_s = (k.astype(jnp.float32) * scale).astype(op_t)
        q_s = (q.astype(jnp.float32) * scale).astype(op_t)
        dq = jax.lax.dot_general(
            ds, k_s, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)
        dk_acc[:, sl] += jax.lax.dot_general(
            ds, q_s, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(qb == n_q_blocks - 1)
    def _():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _bwd_arrays_btc(qp, kp, vp, op, dop, lsep, scale, causal, block_q,
                    t_q, t_kv, d_head):
    b, tq_pad, c = qp.shape
    tk_pad = kp.shape[1]
    hp = _btc_heads_per_block(d_head)
    n_heads = c // d_head
    hp_cols = hp * d_head
    # the backward block must divide tq_pad (the caller pads to the FORWARD
    # block size) and keep the lse block's lane dim a 128-multiple. The
    # entry point quantizes block_q to a lane multiple, so tq_pad is a lane
    # multiple too and this search always terminates at >= _LANE.
    import os as _os

    bq_env = int(_os.environ.get("NEUSPEECH_FLASH_BWD_BQ", "0"))
    bq = (bq_env or min(block_q, 512)) // _LANE * _LANE
    while bq > _LANE and tq_pad % bq:
        bq -= _LANE
    n_q_blocks = tq_pad // bq
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_kernel_btc, scale=scale, t_kv=t_kv, block_q=bq,
            causal=causal, d_head=d_head, hp=hp, n_q_blocks=n_q_blocks,
        ),
        grid=(b, n_heads // hp, n_q_blocks),
        in_specs=[
            pl.BlockSpec((1, bq, hp_cols), lambda b, h, i: (b, i, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, hp_cols), lambda b, h, i: (b, 0, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, hp_cols), lambda b, h, i: (b, 0, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, hp_cols), lambda b, h, i: (b, i, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, hp_cols), lambda b, h, i: (b, i, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8 * hp, bq), lambda b, h, i: (b, h, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, hp_cols), lambda b, h, i: (b, i, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, hp_cols), lambda b, h, i: (b, 0, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, hp_cols), lambda b, h, i: (b, 0, h),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, tq_pad, c), qp.dtype),
            jax.ShapeDtypeStruct((b, tk_pad, c), kp.dtype),
            jax.ShapeDtypeStruct((b, tk_pad, c), vp.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((tk_pad, hp_cols), jnp.float32),
            pltpu.VMEM((tk_pad, hp_cols), jnp.float32),
        ],
        interpret=not on_tpu(),
    )(qp, kp, vp, op, dop, lsep)
    return dq, dk, dv


def fwd_arrays_btc_bias(q, k, v, bias, scale, block_q, d_head):
    """Forward with an EXPLICIT additive bias row (ring attention / SPMD
    shards where the kv mask is data-dependent). q [B, Tq, C] with
    block_q | Tq; k, v [B, Tk, C]; bias [1, 8, Tk] f32 (0 / -1e9).
    Returns (o [B, Tq, C], lse f32 [B, 8*H, Tq]). A fully-masked row
    yields o = 0/0 = NaN and lse = -inf — callers merging partials must
    gate on lse (see parallel/ring_attention.py)."""
    b, tq_pad, c = q.shape
    tk_pad = k.shape[1]
    hp = _btc_heads_per_block(d_head)
    n_heads = c // d_head
    grid = (b, n_heads // hp, tq_pad // block_q)
    hp_cols = hp * d_head
    o, lse = pl.pallas_call(
        functools.partial(
            _fwd_kernel_btc, scale=scale, t_kv=tk_pad, block_q=block_q,
            causal=False, d_head=d_head, hp=hp, has_bias=True,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, hp_cols), lambda b, h, i: (b, i, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, hp_cols), lambda b, h, i: (b, 0, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, hp_cols), lambda b, h, i: (b, 0, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, tk_pad), lambda b, h, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, hp_cols), lambda b, h, i: (b, i, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8 * hp, block_q), lambda b, h, i: (b, h, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, tq_pad, c), q.dtype),
            jax.ShapeDtypeStruct((b, 8 * n_heads, tq_pad), jnp.float32),
        ],
        interpret=not on_tpu(),
    )(q, k, v, bias)
    return o, lse


def bwd_arrays_btc_bias(qp, kp, vp, op, dop, lsep, bias, scale, block_q,
                        d_head):
    """Backward twin of `fwd_arrays_btc_bias` — ``lsep`` may be the GLOBAL
    (merged) lse so partial grads against one kv shard come out in global
    normalization (ring attention's backward)."""
    b, tq_pad, c = qp.shape
    tk_pad = kp.shape[1]
    hp = _btc_heads_per_block(d_head)
    n_heads = c // d_head
    hp_cols = hp * d_head
    bq = min(block_q, 512) // _LANE * _LANE
    while bq > _LANE and tq_pad % bq:
        bq -= _LANE
    n_q_blocks = tq_pad // bq
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_kernel_btc, scale=scale, t_kv=tk_pad, block_q=bq,
            causal=False, d_head=d_head, hp=hp, n_q_blocks=n_q_blocks,
            has_bias=True,
        ),
        grid=(b, n_heads // hp, n_q_blocks),
        in_specs=[
            pl.BlockSpec((1, bq, hp_cols), lambda b, h, i: (b, i, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, hp_cols), lambda b, h, i: (b, 0, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, hp_cols), lambda b, h, i: (b, 0, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, hp_cols), lambda b, h, i: (b, i, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, hp_cols), lambda b, h, i: (b, i, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8 * hp, bq), lambda b, h, i: (b, h, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, tk_pad), lambda b, h, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, hp_cols), lambda b, h, i: (b, i, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, hp_cols), lambda b, h, i: (b, 0, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, hp_cols), lambda b, h, i: (b, 0, h),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, tq_pad, c), qp.dtype),
            jax.ShapeDtypeStruct((b, tk_pad, c), kp.dtype),
            jax.ShapeDtypeStruct((b, tk_pad, c), vp.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((tk_pad, hp_cols), jnp.float32),
            pltpu.VMEM((tk_pad, hp_cols), jnp.float32),
        ],
        interpret=not on_tpu(),
    )(qp, kp, vp, op, dop, lsep, bias)
    return dq, dk, dv


def _fwd_btc(q, k, v, scale, causal, block_q, kv_len, d_head):
    b, t_q, c = q.shape
    t_kv = kv_len if kv_len is not None else k.shape[1]
    tq_pad = _round_up(t_q, block_q)
    tk_pad = _round_up(k.shape[1], _LANE)
    q = jnp.pad(q, ((0, 0), (0, tq_pad - t_q), (0, 0)))
    k = jnp.pad(k, ((0, 0), (0, tk_pad - k.shape[1]), (0, 0)))
    v = jnp.pad(v, ((0, 0), (0, tk_pad - v.shape[1]), (0, 0)))
    o, lse = _fwd_sharded_btc(q, k, v, scale, causal, block_q, t_q, t_kv,
                              d_head)
    return o[:, :t_q], lse


# ----------------------------------------------------------------------
# Decode cross-attention kernel: incremental decode reads the ENTIRE cross
# K/V cache every token (whisper-base bs64: ~200 MB/layer/token, 1.2 GB
# per token over 6 layers) — the decode bottleneck is HBM streaming. This
# kernel reads the cache's BHTD layout natively: grid (B*H,), per-(b,h)
# [1, Tk_pad, D] K/V blocks streamed through VMEM with one tiny-q dot pair
# per instance. Inference only — no VJP. Selectable variant (see the
# measured reject note at models/whisper.py::_FLASH_DECODE).
# ----------------------------------------------------------------------


def _decode_cross_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, t_kv):
    q = q_ref[0]                         # [Tq, D] (Tq tiny)
    k = k_ref[0]                         # [Tk_pad, D]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    kv_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(kv_idx < t_kv, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) / l
    o_ref[0] = o.astype(o_ref.dtype)


def flash_decode_cross(q, k, v, kv_len: Optional[int] = None):
    """Cross-attention for incremental decode. q [B, Tq, H, D] with tiny Tq
    (1 for a decode step, prompt length at prefill); k, v **[B, H, Tkv, D]**
    — the decode cache's BHTD layout, read natively ([B,H,Tkv,D] ->
    [B*H,Tkv,D] is a free reshape; only the tiny q is transposed). Returns
    [B, Tq, H, D] in q.dtype. Grid (B*H,)."""
    b, t_q, h, d = q.shape
    t_src = k.shape[2]
    t_kv = kv_len if kv_len is not None else t_src
    tk_pad = _round_up(t_src, _LANE)
    qb = q.transpose(0, 2, 1, 3).reshape(b * h, t_q, d)
    kb = jnp.pad(k.reshape(b * h, t_src, d),
                 ((0, 0), (0, tk_pad - t_src), (0, 0)))
    vb = jnp.pad(v.reshape(b * h, t_src, d),
                 ((0, 0), (0, tk_pad - t_src), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_decode_cross_kernel, scale=d ** -0.5, t_kv=t_kv),
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, t_q, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_q, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, t_q, d), q.dtype),
        interpret=not on_tpu(),
    )(qb, kb, vb)
    return out.reshape(b, h, t_q, d).transpose(0, 2, 1, 3)


# ----------------------------------------------------------------------
# Batched tiny-q decode cross-attention (round 3): the winning shape after
# the per-row grids above lost. Grid (B, H/hp) with hp heads per 128-lane
# block; K/V live in the cache's natural BTC layout [B, T, H*D] (written
# straight from the K/V projections — no transpose at build time). The
# tiny q is handled WITHOUT transposes via a block-diagonal selector:
#   scores  S[t, j] = sum_c (k[t,c] * q[c]) * M[c, j],  M[c,j] = (c//D == j)
#           — ONE [T, W]x[W, 128] MXU dot with T as the M dimension
#             (per-row grids made T the N dim and serialized tiny dots);
#   output  o = P^T V via ONE [T,128]x[T,W] dot, then a masked sublane
#           reduce extracts each head's o[h, h*D:(h+1)*D] row;
#   softmax l-normalization rides a [1,128]x[128,W] selector dot so no
#           lane-gather (Mosaic can't lower those) and no [T,128] divide.
# Measured (probe, whisper-base bs64 T=1536 bf16): 3.7 ms per 6-layer
# cross pass = 325 GB/s vs 27-29 GB/s for the same-layout XLA chain; the
# full-C (hp=8) variant measured 12x slower (44 ms) and per-(b,h) grids
# 8-19 ms/token (kept below as the documented reject).
# ----------------------------------------------------------------------


def _decode_cross_btc_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, t_kv,
                             d_head, hp):
    w = hp * d_head
    q = q_ref[0, 0:1, :]                     # [1, W] (row 0 = the query)
    k = k_ref[0]                             # [Tpad, W]
    kq = (k * q).astype(k.dtype)
    sel = (lax.broadcasted_iota(jnp.int32, (w, 128), 0) // d_head
           == lax.broadcasted_iota(jnp.int32, (w, 128), 1))
    m_mat = sel.astype(k.dtype)              # [W, 128] (hp valid columns)
    s = lax.dot_general(kq, m_mat, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32) * scale
    t_idx = lax.broadcasted_iota(jnp.int32, s.shape, 0)
    s = jnp.where(t_idx < t_kv, s, NEG_INF)
    m = jnp.max(s, axis=0, keepdims=True)
    p = jnp.exp(s - m)                       # [Tpad, 128]
    l = jnp.sum(p, axis=0, keepdims=True)    # [1, 128]
    o = lax.dot_general(p.astype(v_ref.dtype), v_ref[0],
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)  # [128, W]
    colc = lax.broadcasted_iota(jnp.int32, (128, w), 1)
    rowr = lax.broadcasted_iota(jnp.int32, (128, w), 0)
    keep = (colc // d_head) == rowr
    out_row = jnp.sum(jnp.where(keep, o, 0.0), axis=0, keepdims=True)  # [1,W]
    # per-head normalizer mapped to channels via a selector dot (the direct
    # l[c//D] indexing is a lane gather Mosaic cannot lower)
    sel_l = (lax.broadcasted_iota(jnp.int32, (128, w), 0)
             == lax.broadcasted_iota(jnp.int32, (128, w), 1) // d_head)
    l_row = lax.dot_general(l, sel_l.astype(jnp.float32),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [1, W]
    o_ref[0, 0:1, :] = (out_row / l_row).astype(o_ref.dtype)


def flash_decode_cross_btc(q, k, v, kv_len: Optional[int] = None):
    """Single-token cross-attention over a BTC cache.

    q: [B, 1, H, D]; k, v: [B, Tpad, H*D] (zero-padded rows past ``kv_len``
    are masked). Returns [B, 1, H, D] in q.dtype. Grid (B, H/hp)."""
    b, t_q, h, d = q.shape
    assert t_q == 1
    c = h * d
    hp = _btc_heads_per_block(d)
    w = hp * d
    t_pad = k.shape[1]
    t_kv = kv_len if kv_len is not None else t_pad
    qp = jnp.pad(q.reshape(b, 1, c), ((0, 0), (0, 7), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_decode_cross_btc_kernel, scale=d ** -0.5,
                          t_kv=t_kv, d_head=d, hp=hp),
        grid=(b, h // hp),
        in_specs=[
            pl.BlockSpec((1, 8, w), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, w), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, w), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, w), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 8, c), q.dtype),
        interpret=not on_tpu(),
    )(qp, k, v)
    return out[:, :1].reshape(b, 1, h, d)


def decode_cross_btc_available(t_kv: int, d: int, n_heads: int,
                               itemsize: int = 2) -> bool:
    """BTC decode kernel gate: head grouping must tile 128 lanes and the
    per-instance K/V panes must fit VMEM double-buffered."""
    if d not in (32, 64, 128) or n_heads % _btc_heads_per_block(d) != 0:
        return False
    t_pad = _round_up(t_kv, 8)
    # k + v panes (itemsize) + f32 scores/probs [Tpad, 128]
    vmem = 2 * 2 * t_pad * 128 * itemsize + 2 * t_pad * 128 * 4
    return vmem < 14 * 1024 * 1024


def decode_cross_available(t_kv: int, d: int, n_heads: int,
                           itemsize: int = 2) -> bool:
    """Per-(batch, head) K/V blocks must fit VMEM with double buffering.
    ``itemsize`` is the cache dtype's byte width (2 for bf16, 4 for f32)."""
    del n_heads  # grid is (B*H,); VMEM holds one head's K/V at a time
    tk_pad = _round_up(t_kv, _LANE)
    return tk_pad * d * itemsize * 2 * 2 < 14 * 1024 * 1024


from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as _P


def _dim0_spec(sharding):
    spec = getattr(sharding, "spec", None)
    if not spec or len(spec) == 0:
        return None
    return spec[0]


def _make_partitioned(fn, n_arrays: int, n_out: int, out_ndims,
                      sharding_rule=None, need_replication=(),
                      n_static: int = 5):
    wrapped = custom_partitioning(
        fn, static_argnums=tuple(range(n_arrays, n_arrays + n_static))
    )

    def _shardings(mesh, b):
        outs = tuple(
            NamedSharding(mesh, _P(b, *([None] * (nd - 1)))) for nd in out_ndims
        )
        args = tuple(
            NamedSharding(mesh, _P(b, None, None)) for _ in range(n_arrays)
        )
        return outs, args

    def infer(*call_args):
        *_, mesh, arg_infos, result_infos = call_args
        b = _dim0_spec(arg_infos[0].sharding)
        outs, _ = _shardings(mesh, b)
        return outs if n_out > 1 else outs[0]

    def partition(*call_args):
        *static, mesh, arg_infos, result_infos = call_args
        static = static[-n_static:]  # (scale, causal, block_q, t_q, t_kv[, d])
        b = _dim0_spec(arg_infos[0].sharding)
        outs, args = _shardings(mesh, b)

        def lower(*arrays):
            return fn(*arrays, *static)

        return mesh, lower, (outs if n_out > 1 else outs[0]), args

    wrapped.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule=sharding_rule,  # required by the Shardy partitioner
        need_replication_factors=need_replication,
    )
    return wrapped


_fwd_sharded = _make_partitioned(
    _fwd_arrays, 3, 2, (3, 3),
    sharding_rule="b q d, b k d, b k d -> b q d, b e q",
    # factor order must follow first appearance: q(1) d(2) k(3) e(4)
    need_replication=("q", "d", "k", "e"),
)
_bwd_sharded = _make_partitioned(
    _bwd_arrays, 6, 3, (3, 3, 3),
    sharding_rule="b q d, b k d, b k d, b q d, b q d, b e q -> b q d, b k d, b k d",
    need_replication=("q", "d", "k", "e"),
)


# BTC kernels: shard over B (dim 0) AND the channel dim (dim 2 — head
# groups, i.e. tensor parallelism; the lse's per-head row dim shards with
# the same axis). A shard's channel slice must stay a 128-lane multiple
# with whole head-pairs; otherwise the partition falls back to replicating
# the channel dim (correct, just gathers).


def _spec_dim(sharding, dim):
    spec = getattr(sharding, "spec", None)
    if not spec or len(spec) <= dim:
        return None
    return spec[dim]


def _make_partitioned_btc(fn, n_arrays: int, n_out: int, lse_positions,
                          sharding_rule=None, need_replication=(),
                          n_static: int = 6):
    wrapped = custom_partitioning(
        fn, static_argnums=tuple(range(n_arrays, n_arrays + n_static))
    )

    def _shardings(mesh, b, caxis):
        def arr(is_lse):
            if is_lse:
                return NamedSharding(mesh, _P(b, caxis, None))
            return NamedSharding(mesh, _P(b, None, caxis))

        outs = tuple(arr(i in lse_positions) for i in range(n_out))
        args = tuple(arr(n_arrays == 6 and i == 5) for i in range(n_arrays))
        return outs, args

    def _axes(mesh, arg_infos, statics):
        b = _spec_dim(arg_infos[0].sharding, 0)
        caxis = _spec_dim(arg_infos[0].sharding, 2)
        if caxis is not None:
            names = (caxis,) if isinstance(caxis, str) else tuple(caxis)
            nshards = 1
            for nm in names:
                nshards *= mesh.shape[nm]
            c = arg_infos[0].shape[2]
            d_head = statics[-1]
            hp_cols = _btc_heads_per_block(d_head) * d_head
            per = c // max(nshards, 1)
            if per <= 0 or per % _LANE or per % hp_cols or c % nshards:
                caxis = None
        return b, caxis

    def infer(*call_args):
        *static, mesh, arg_infos, result_infos = call_args
        b, caxis = _axes(mesh, arg_infos, static[-n_static:])
        outs, _ = _shardings(mesh, b, caxis)
        return outs if n_out > 1 else outs[0]

    def partition(*call_args):
        *static, mesh, arg_infos, result_infos = call_args
        static = static[-n_static:]
        b, caxis = _axes(mesh, arg_infos, static)
        outs, args = _shardings(mesh, b, caxis)

        def lower(*arrays):
            return fn(*arrays, *static)

        return mesh, lower, (outs if n_out > 1 else outs[0]), args

    wrapped.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule=sharding_rule,
        need_replication_factors=need_replication,
    )
    return wrapped


_fwd_sharded_btc = _make_partitioned_btc(
    _fwd_arrays_btc, 3, 2, lse_positions=(1,),
    sharding_rule="b q c, b k c, b k c -> b q c, b m q",
    need_replication=("q", "k"),
    n_static=6,
)
_bwd_sharded_btc = _make_partitioned_btc(
    _bwd_arrays_btc, 6, 3, lse_positions=(),
    sharding_rule=(
        "b q c, b k c, b k c, b q c, b q c, b m q -> b q c, b k c, b k c"
    ),
    need_replication=("q", "k"),
    n_static=6,
)


def _bwd_btc(scale, causal, block_q, kv_len, d_head, res, g):
    q, k, v, o, lse = res
    do = g
    b, t_q, c = q.shape
    t_kv = kv_len if kv_len is not None else k.shape[1]
    tq_pad = _round_up(t_q, block_q)
    tk_pad = _round_up(k.shape[1], _LANE)
    qp = jnp.pad(q, ((0, 0), (0, tq_pad - t_q), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, tk_pad - k.shape[1]), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, tk_pad - v.shape[1]), (0, 0)))
    op = jnp.pad(o, ((0, 0), (0, tq_pad - t_q), (0, 0)))
    dop = jnp.pad(do, ((0, 0), (0, tq_pad - t_q), (0, 0)))
    dq, dk, dv = _bwd_sharded_btc(
        qp, kp, vp, op, dop, lse, scale, causal, block_q, t_q, t_kv, d_head
    )
    return dq[:, :t_q], dk[:, :k.shape[1]], dv[:, :v.shape[1]]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash_btc(q, k, v, scale, causal, block_q, kv_len, d_head):
    o, _ = _fwd_btc(q, k, v, scale, causal, block_q, kv_len, d_head)
    return o


def _flash_btc_fwd(q, k, v, scale, causal, block_q, kv_len, d_head):
    o, lse = _fwd_btc(q, k, v, scale, causal, block_q, kv_len, d_head)
    from jax.ad_checkpoint import checkpoint_name

    q = checkpoint_name(q, "flash_q")
    k = checkpoint_name(k, "flash_k")
    v = checkpoint_name(v, "flash_v")
    o = checkpoint_name(o, "flash_o")
    lse = checkpoint_name(lse, "flash_lse")
    return o, (q, k, v, o, lse)


_flash_btc.defvjp(_flash_btc_fwd, _bwd_btc)


def _make_partitioned_bthd(fn, n_arrays: int, n_out: int, lse_positions,
                           sharding_rule=None, need_replication=()):
    """BTHD variant: tensors shard on B (dim 0) and H (dim 2 for q/k/v/o,
    dim 1 for lse); T and D replicated."""
    wrapped = custom_partitioning(
        fn, static_argnums=tuple(range(n_arrays, n_arrays + 5))
    )

    def _shardings(mesh, b, h):
        def arr(nd, is_lse):
            if is_lse:
                return NamedSharding(mesh, _P(b, h, None, None))
            return NamedSharding(mesh, _P(b, None, h, None))

        outs = tuple(
            arr(4, i in lse_positions) for i in range(n_out)
        )
        # inputs: q/k/v/o/do are BTHD; the lse input (backward arg 5) is BH8T
        args = tuple(
            arr(4, n_arrays == 6 and i == 5) for i in range(n_arrays)
        )
        return outs, args

    def infer(*call_args):
        *_, mesh, arg_infos, result_infos = call_args
        b = _spec_dim(arg_infos[0].sharding, 0)
        h = _spec_dim(arg_infos[0].sharding, 2)
        outs, _ = _shardings(mesh, b, h)
        return outs if n_out > 1 else outs[0]

    def partition(*call_args):
        *static, mesh, arg_infos, result_infos = call_args
        static = static[-5:]
        b = _spec_dim(arg_infos[0].sharding, 0)
        h = _spec_dim(arg_infos[0].sharding, 2)
        outs, args = _shardings(mesh, b, h)

        def lower(*arrays):
            return fn(*arrays, *static)

        return mesh, lower, (outs if n_out > 1 else outs[0]), args

    wrapped.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule=sharding_rule,
        need_replication_factors=need_replication,
    )
    return wrapped


_fwd_sharded_bthd = _make_partitioned_bthd(
    _fwd_arrays_bthd, 3, 2, lse_positions=(1,),
    # factor order of first appearance: q(1) h(2) d(3) k(4) e(5)
    sharding_rule="b q h d, b k h d, b k h d -> b q h d, b h e q",
    need_replication=("q", "d", "k", "e"),
)
_bwd_sharded_bthd = _make_partitioned_bthd(
    _bwd_arrays_bthd, 6, 3, lse_positions=(),
    sharding_rule=(
        "b q h d, b k h d, b k h d, b q h d, b q h d, b h e q "
        "-> b q h d, b k h d, b k h d"
    ),
    need_replication=("q", "d", "k", "e"),
)


# ----------------------------------------------------------------------
# public API
# ----------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_bh(q, k, v, scale, causal, block_q):
    o, _ = _fwd(q, k, v, scale, causal, block_q)
    return o


def _flash_bh_fwd(q, k, v, scale, causal, block_q):
    o, lse = _fwd(q, k, v, scale, causal, block_q)
    # Under `jax.checkpoint(..., policy=save_only_these_names('flash_*'))`
    # these names let the VJP residuals survive rematerialization: the
    # backward pass then loads o/lse (and optionally q/k/v) instead of
    # re-running the forward kernel — the single biggest remat recompute
    # cost at whisper-base geometry (see models/whisper.py remat policies).
    from jax.ad_checkpoint import checkpoint_name

    q = checkpoint_name(q, "flash_q")
    k = checkpoint_name(k, "flash_k")
    v = checkpoint_name(v, "flash_v")
    o = checkpoint_name(o, "flash_o")
    lse = checkpoint_name(lse, "flash_lse")
    return o, (q, k, v, o, lse)


_flash_bh.defvjp(_flash_bh_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_bthd(q, k, v, scale, causal, block_q):
    o, _ = _fwd_bthd(q, k, v, scale, causal, block_q)
    return o


def _flash_bthd_fwd(q, k, v, scale, causal, block_q):
    o, lse = _fwd_bthd(q, k, v, scale, causal, block_q)
    from jax.ad_checkpoint import checkpoint_name

    q = checkpoint_name(q, "flash_q")
    k = checkpoint_name(k, "flash_k")
    v = checkpoint_name(v, "flash_v")
    o = checkpoint_name(o, "flash_o")
    lse = checkpoint_name(lse, "flash_lse")
    return o, (q, k, v, o, lse)


_flash_bthd.defvjp(_flash_bthd_fwd, _bwd_bthd)


import os

DEFAULT_BLOCK_Q = int(os.environ.get("NEUSPEECH_FLASH_BLOCK_Q", "512"))


def btc_block_q(t_q: int, block_q: Optional[int] = None) -> int:
    """The q-block the BTC path uses for a length-t_q query: requested (or
    default) block, quantized DOWN to a 128-lane multiple, capped at 512.
    `encoder_apply` pads its layer stack with this same quantum so the
    kernel wrapper's pads become no-ops."""
    if block_q is None:
        block_q = DEFAULT_BLOCK_Q
    return max(_LANE, min(block_q, 512, _round_up(t_q, _LANE)) // _LANE * _LANE)


# The native [B,T,H,D] Pallas kernels above compile in interpret mode but
# the current Mosaic release crashes (remote-compile HTTP 500,
# tpu_compile_helper exit 1) on real TPUs. Bisected (/tmp/mosaic_bisect*,
# round 2): 4-D blocks with head-sliced COPIES compile; ANY dot_general
# inside a kernel with 4-D blocks crashes — even reading clean 2-D VMEM
# scratch, while the identical dot under 3-D blocks compiles. Toolchain
# bug, not a block-shape rule. Until a Mosaic upgrade, the production path
# transposes to the proven BHTD kernel — XLA lays the transposes out next
# to the custom call (measured cost ≈ nothing: 360 vs 357 ms step).
_BTHD_NATIVE = os.environ.get("NEUSPEECH_FLASH_BTHD_NATIVE", "0") == "1"


def flash_attention_bthd(q, k, v, causal: bool = False,
                         block_q: Optional[int] = None,
                         kv_len: Optional[int] = None):
    """BTHD layout API: q [B, Tq, H, D]; k, v [B, Tkv, H, D]; returns
    [B, Tq, H, D] in q.dtype — the natural layout of fused QKV projections
    ([B,T,H*D] reshaped).

    Default path: the BTC kernels — [B,T,H,D] is bitcast (free) to
    [B,T,H*D]; no transposes or pads bracket the kernel when T is already a
    block multiple (the encoder runs at padded T for exactly this reason).
    ``kv_len`` masks keys/values at positions >= kv_len (so callers can pass
    zero-padded K/V without re-slicing). Sharding: B partitionable on the
    BTC path; B and H on the BTHD/BHTD fallbacks."""
    if block_q is None:
        block_q = DEFAULT_BLOCK_Q
    b, t_q, h, d = q.shape
    t_kv = k.shape[1]
    if causal and t_q != t_kv:
        raise ValueError("causal flash attention requires Tq == Tkv")
    layout = os.environ.get("NEUSPEECH_FLASH_LAYOUT", "btc")
    scale = d ** -0.5
    # _BTHD_NATIVE takes precedence over the BTC default so setting it
    # alone reproduces the old-path measurements (it used to be silently
    # ignored whenever the BTC gate matched — ADVICE round 2)
    if (layout == "btc" and not _BTHD_NATIVE and d in (32, 64, 128)
            and h % _btc_heads_per_block(d) == 0):
        # block_q quantized to a lane multiple (the lse block's lane dim
        # must divide 128) and capped at 512 (VMEM; larger measured
        # neutral) — the SAME quantum `btc_block_q` gives the encoder for
        # its padded-T layer stack, so the pads here are no-ops there
        bq = btc_block_q(t_q, block_q)
        c = h * d
        out = _flash_btc(
            q.reshape(b, t_q, c), k.reshape(b, t_kv, c),
            v.reshape(b, t_kv, c), scale, causal, bq, kv_len, d,
        )
        return out.reshape(b, t_q, h, d)
    if kv_len is not None and kv_len != t_kv:
        k = k[:, :kv_len]
        v = v[:, :kv_len]
        t_kv = kv_len
    if _BTHD_NATIVE or not on_tpu():
        bq = min(block_q, _round_up(t_q, 8))
        return _flash_bthd(q, k, v, scale, causal, bq)
    out = flash_attention(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3), causal=causal, block_q=block_q,
    )
    return out.transpose(0, 2, 1, 3)


def flash_attention(q, k, v, causal: bool = False,
                    block_q: Optional[int] = None):
    """Drop-in for `models/whisper.py::attention` without masks.

    q: [B, H, Tq, D]; k, v: [B, H, Tkv, D]. Returns [B, H, Tq, D] in
    q.dtype. Softmax statistics in f32. `causal=True` requires Tq == Tkv.
    """
    if block_q is None:
        block_q = DEFAULT_BLOCK_Q
    b, h, t_q, d = q.shape
    t_kv = k.shape[2]
    if causal and t_q != t_kv:
        raise ValueError("causal flash attention requires Tq == Tkv")
    scale = d ** -0.5
    bq = min(block_q, _round_up(t_q, 8))
    out = _flash_bh(
        q.reshape(b * h, t_q, d),
        k.reshape(b * h, t_kv, d),
        v.reshape(b * h, t_kv, d),
        scale, causal, bq,
    )
    return out.reshape(b, h, t_q, d)


def flash_available(t_kv: int, d: int) -> bool:
    """Conservative envelope: full-K tiles must fit VMEM."""
    if d > 256:
        return False
    tk_pad = _round_up(t_kv, 128)
    # k + v + scores + probs for one q-block, f32-ish accounting
    vmem = tk_pad * d * 2 * 2 + 128 * tk_pad * 8
    return vmem < 8 * 1024 * 1024


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False
