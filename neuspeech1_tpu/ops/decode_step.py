"""Fused decode-step self-attention (cache write + attention, one op).

Why: the greedy/beam decode step is ORCHESTRATION-bound, not
bandwidth-bound — the round-3 device trace (PARITY.md decode findings)
measured ~1.9 ms/token of inter-op launch gaps in the while body against
only ~0.42 ms of non-cross device work at whisper-base bs64. Each decoder
layer's incremental self-attention is a chain of ~7 tiny HLO fusions
(2 cache dynamic-update-slices, the score matvec, mask, softmax, the PV
matvec), each paying the sequencer's per-op gap. This kernel collapses
the whole chain into ONE Pallas op per layer: the new K/V column is
inserted in VMEM, scores/softmax/PV run on the resident pane, and the
updated cache pages out through aliased outputs.

Design (v5e; informed by this repo's measured kernel rejects):
  * the cache keeps its production [B, H, Dh, Tmax] layout (T on the
    128-lane axis — `models/whisper.py::_self_decode_dt`);
  * grid over BATCH CHUNKS, not (b, h): per-(b,h) grids serialize tiny
    dots and lost 2-4x in the round-3 cross-kernel rejects. Each grid
    cell processes [Bc, H, Dh, T] panes — enough VPU work to amortize
    the per-instance pipeline latency. Bc is the largest divisor of B
    whose working set fits the VMEM budget;
  * all math is VPU elementwise+reduce (multiply + sublane/lane reduces),
    mirroring what XLA lowers the production matvecs to — the MXU has no
    role at q_len 1;
  * the column insert is a `where` against a lane iota on the pane
    already resident for the score reduce, so the write costs no extra
    HBM traffic beyond the aliased pane writeback;
  * numerics mirror `_self_decode_dt` exactly: bf16 multiply-accumulate
    in f32 rounded to bf16 once (the einsum's output dtype), f32 scale +
    mask + softmax, probs cast to the compute dtype, PV accumulated in
    f32 and rounded once.

Used for q_len==1 steps whose validity rule is the contiguous
``position <= cache_index`` (greedy / beam / sampling / contrastive —
speculative decode's hole-masked steps keep their own paths). Selection:
`fused_self_on()` (env NEUSPEECH_DECODE_SELF_FUSED=1; default OFF — a
measured reject as a default, see fused_self_on's docstring for the
numbers and the trace-level root cause). CPU tests force the env var and
exercise the kernels in interpret mode.

Reference behavior: HF beam/greedy per-step attention over a growing KV
cache (`/root/reference/utils/load_model.py:534-767` decoder forward with
past_key_values); fixed-shape formulation is this repo's own.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neuspeech1_tpu.ops.flash_attention import NEG_INF, on_tpu

# VMEM budget for one grid cell's working set (k+v panes in+out plus f32
# temporaries) against the 16 MB scoped limit, leaving room for Pallas's
# double buffering of the next cell.
_VMEM_BUDGET = 12 * 1024 * 1024


def fused_self_on() -> bool:
    """MEASURED REJECT as a default (round 5), kept selectable
    (NEUSPEECH_DECODE_SELF_FUSED=1): whisper-base bs64, 32 new tokens,
    two A/B pairs (perf/fused_step_ab.py) —

        greedy int8   435.8/444.5 -> 424.0/420.2 utt/s (-3..-5%)
        spec g2 int8  505.7/519.8 -> 513.6/514.3 (+-1.5%, within noise)
        spec g4 int8  535.7/555.4 -> 543.1/541.1 (+-1.5%, within noise)

    tokens exactly equal in every config. Device trace
    (perf/decode_gap_trace.py --int8, steady-state tail): the kernel DOES
    cut busy time 5.23 -> 4.95 ms/token, but adds 0.48 -> 1.13 ms/token
    of copy-start/copy-done waits — the while-carry cache buffers sit in
    XLA's preferred physical layout for width-1 matvec programs
    ({0,2,1,3}/{2,1,0,3} on [B,H,Dh,T]: T MAJOR, batch or Dh on lanes;
    compiled-HLO layout census), while pallas_call constrains its
    operands to the default {3,2,1,0} (T on lanes), so every layer pays
    two pane relayout copies per token. Same boundary-tax law as the
    round-3 BTC kernel reject (PARITY.md). A layout-matched kernel
    (logical [T,H,Dh,B] cache) is the identified follow-up."""
    return os.environ.get("NEUSPEECH_DECODE_SELF_FUSED", "0") == "1"


def _batch_chunk(b: int, h: int, dh: int, t: int, itemsize: int) -> int:
    """Largest divisor of ``b`` whose per-cell working set fits the VMEM
    budget. Two measured Mosaic realities drive the estimate: (1) stack
    allocation covers FULL-pane intermediates, not just the pipeline
    blocks — k/v in + aliased out in the cache dtype plus ~3 f32
    pane-sized temporaries (upcast k, upcast v, the score product); and
    (2) every pane is allocated at the LANE-PADDED T (multiples of 128),
    so a T=20 decode bucket costs the same stack as T=128 — a bc=16
    T=20 cell measured 23.1 MB against the 16 MB scoped limit (1.44
    MB/row, ~= the padded-T estimate) while bc=8 T=36 compiled fine."""
    tp = -(-t // 128) * 128
    per_row = h * dh * tp * (2 * itemsize + 16) + h * tp * 32
    bc = b
    while bc > 1 and (b % bc != 0 or bc * per_row > _VMEM_BUDGET):
        bc -= 1
    return bc


def _kernel(idx_ref, q_ref, kn_ref, vn_ref, k_ref, v_ref,
            o_ref, ko_ref, vo_ref, *, scale):
    idx = idx_ref[0]
    q = q_ref[...]                      # [Bc, H, Dh]
    kn = kn_ref[...]                    # [Bc, H, Dh]
    vn = vn_ref[...]
    k = k_ref[...]                      # [Bc, H, Dh, T]
    v = v_ref[...]
    t = k.shape[-1]
    lane = lax.broadcasted_iota(jnp.int32, (1, 1, 1, t), 3)
    # minor-dim inserts on sub-32-bit vectors don't lower on Mosaic; expand
    # through f32 (lossless bf16 round-trip)
    kn_c = kn.astype(jnp.float32)[..., None].astype(k.dtype)
    vn_c = vn.astype(jnp.float32)[..., None].astype(v.dtype)
    k_upd = jnp.where(lane == idx, kn_c, k)
    v_upd = jnp.where(lane == idx, vn_c, v)
    ko_ref[...] = k_upd
    vo_ref[...] = v_upd
    # scores: f32 accumulate over Dh, rounded once to the cache dtype (the
    # XLA einsum's output dtype), then f32 for scale/mask/softmax
    s = jnp.sum(q.astype(jnp.float32)[..., None]
                * k_upd.astype(jnp.float32), axis=2)        # [Bc, H, T]
    s = s.astype(k.dtype).astype(jnp.float32) * scale
    valid = lax.broadcasted_iota(jnp.int32, s.shape, 2) <= idx
    s = jnp.where(valid, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    probs = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(k.dtype)
    ctx = jnp.sum(probs.astype(jnp.float32)[:, :, None, :]
                  * v_upd.astype(jnp.float32), axis=-1)     # [Bc, H, Dh]
    o_ref[...] = ctx.astype(o_ref.dtype)


def fused_self_decode(q, k_new, v_new, k_t, v_t, cache_index):
    """One decode step of cached self-attention, fused.

    q, k_new, v_new: [B, 1, H, Dh] (this step's projections);
    k_t, v_t: [B, H, Dh, Tmax] cache panes (aliased through to the
    outputs — callers must treat them as consumed);
    cache_index: int32 scalar write/attend position.

    Returns (context [B, 1, H, Dh], k_t', v_t') where the caches hold the
    new column at ``cache_index`` and context attends positions
    ``0..cache_index`` inclusive.
    """
    b, t_q, h, dh = q.shape
    assert t_q == 1
    t_max = k_t.shape[-1]
    bc = _batch_chunk(b, h, dh, t_max, k_t.dtype.itemsize)
    idx = jnp.asarray(cache_index, jnp.int32).reshape(1)
    q3 = q.reshape(b, h, dh)
    kn3 = k_new.reshape(b, h, dh).astype(k_t.dtype)
    vn3 = v_new.reshape(b, h, dh).astype(v_t.dtype)
    row = lambda i: (i, 0, 0)
    pane = lambda i: (i, 0, 0, 0)
    ctx, k_out, v_out = pl.pallas_call(
        functools.partial(_kernel, scale=dh ** -0.5),
        grid=(b // bc,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bc, h, dh), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, h, dh), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, h, dh), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, h, dh, t_max), pane, memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, h, dh, t_max), pane, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bc, h, dh), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, h, dh, t_max), pane, memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, h, dh, t_max), pane, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, dh), q.dtype),
            jax.ShapeDtypeStruct(k_t.shape, k_t.dtype),
            jax.ShapeDtypeStruct(v_t.shape, v_t.dtype),
        ],
        # cache panes update in place (index 0 is the SMEM scalar)
        input_output_aliases={4: 1, 5: 2},
        interpret=not on_tpu(),
    )(idx, q3, kn3, vn3, k_t, v_t)
    return ctx.reshape(b, 1, h, dh), k_out, v_out


def _kernel_multi(idx_ref, q_ref, kn_ref, vn_ref, m_ref, k_ref, v_ref,
                  o_ref, ko_ref, vo_ref, *, scale, g):
    idx = idx_ref[0]
    k = k_ref[...]                      # [Bc, H, Dh, T]
    v = v_ref[...]
    t = k.shape[-1]
    lane4 = lax.broadcasted_iota(jnp.int32, (1, 1, 1, t), 3)
    for i in range(g):
        # all g columns land before the matvecs: the caller's mask excludes
        # lanes > idx+i for query i, so progressive-write semantics hold
        # (minor-dim inserts go through f32 — Mosaic bf16 limitation)
        kn_c = kn_ref[:, i].astype(jnp.float32)[..., None].astype(k.dtype)
        vn_c = vn_ref[:, i].astype(jnp.float32)[..., None].astype(v.dtype)
        k = jnp.where(lane4 == idx + i, kn_c, k)
        v = jnp.where(lane4 == idx + i, vn_c, v)
    ko_ref[...] = k
    vo_ref[...] = v
    v32 = v.astype(jnp.float32)
    k32 = k.astype(jnp.float32)
    for i in range(g):
        s = jnp.sum(q_ref[:, i].astype(jnp.float32)[..., None] * k32,
                    axis=2)                                    # [Bc, H, T]
        s = s.astype(k.dtype).astype(jnp.float32) * scale
        allow = (m_ref[:, i] != 0)[:, None, :]                 # [Bc, 1, T]
        s = jnp.where(allow, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        probs = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(k.dtype)
        ctx = jnp.sum(probs.astype(jnp.float32)[:, :, None, :] * v32,
                      axis=-1)                                 # [Bc, H, Dh]
        o_ref[:, i] = ctx.astype(o_ref.dtype)


def fused_self_decode_multi(q, k_new, v_new, mask, k_t, v_t, cache_index):
    """Multi-query (speculative draft-verify) decode step, fused.

    The XLA `_self_decode_dt_unrolled` path runs gamma sequential width-1
    DUS+matvec+softmax+PV chains per layer (~7*gamma tiny ops); this is
    the same math in ONE op, amortizing the pane residency over all gamma
    queries. q, k_new, v_new: [B, G, H, Dh]; mask: [B or 1, 1, G, Tmax]
    bool — query i's allowed lanes (must exclude in-block lanes > i and
    rejected-draft holes; decode/spec.py builds exactly this);
    k_t, v_t: [B, H, Dh, Tmax] panes (consumed); cache_index: int32
    scalar — column i lands at ``cache_index + i``.

    Returns (context [B, G, H, Dh], k_t', v_t').
    """
    b, g, h, dh = q.shape
    t_max = k_t.shape[-1]
    bc = _batch_chunk(b, h, dh, t_max, k_t.dtype.itemsize)
    idx = jnp.asarray(cache_index, jnp.int32).reshape(1)
    m8 = jnp.broadcast_to(mask[:, 0], (b, g, t_max)).astype(jnp.uint8)
    row = lambda i: (i, 0, 0, 0)
    pane = lambda i: (i, 0, 0, 0)
    mrow = lambda i: (i, 0, 0)
    ctx, k_out, v_out = pl.pallas_call(
        functools.partial(_kernel_multi, scale=dh ** -0.5, g=g),
        grid=(b // bc,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bc, g, h, dh), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, g, h, dh), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, g, h, dh), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, g, t_max), mrow, memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, h, dh, t_max), pane, memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, h, dh, t_max), pane, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bc, g, h, dh), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, h, dh, t_max), pane, memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, h, dh, t_max), pane, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, g, h, dh), q.dtype),
            jax.ShapeDtypeStruct(k_t.shape, k_t.dtype),
            jax.ShapeDtypeStruct(v_t.shape, v_t.dtype),
        ],
        input_output_aliases={5: 1, 6: 2},
        interpret=not on_tpu(),
    )(idx, q, k_new.astype(k_t.dtype), v_new.astype(v_t.dtype), m8, k_t, v_t)
    return ctx, k_out, v_out
