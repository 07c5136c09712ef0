"""Ring (sequence-parallel) flash self-attention over a mesh axis.

Beyond the reference (whose sequence length is a hard constant — 30 s
clips, 1500 encoder frames, no sequence parallelism anywhere; SURVEY §5):
this shards the SEQUENCE dim of non-causal self-attention over a mesh
axis. Each device keeps its Q shard resident while the K/V shards (and
their validity masks) rotate around the ring with `lax.ppermute` — the
ICI collective — one hop per round:

  forward   round r: (o_r, lse_r) = flash(q_local, kv_block) with the
            block's EXPLICIT bias row (the kv mask is data-dependent per
            device, so the kernel's static kv_len cannot express it —
            `ops/flash_attention.py::fwd_arrays_btc_bias`); partials merge
            in log space, which is exact because flash returns the
            NORMALIZED output plus the row logsumexp:
              lse = logaddexp(lse_a, lse_b)
              o   = o_a * exp(lse_a - lse) + o_b * exp(lse_b - lse)
  backward  round r: the flash backward runs against the kv block with the
            GLOBAL lse and the global delta = rowsum(do * o), so each
            partial is already globally normalized (the standard flash
            decomposition ds = p * (dp - delta) needs only row-global
            statistics); dq accumulates locally, dk/dv ride the ring WITH
            their K/V block and arrive home after the full cycle.

Memory per device is O(T/n) activations and O(T/n) K/V resident at a
time; compute overlaps the ppermute DMA across rounds (XLA schedules the
collective-permute concurrently with the kernel of the current round).
A fully-masked block produces o = 0/0 = NaN with weight exp(-inf) = 0;
the merge gates those terms on weight > 0 (rows masked across EVERY
shard are undefined — keep kv_valid_len >= 1).

Whisper itself never needs this (1500 frames fit one chip comfortably);
it exists so the framework's attention scales past single-chip sequence
lengths, and as the 'seq' leg of the parallelism story (DP/FSDP/TP via
GSPMD specs in `parallel/sharding.py`, SP here via shard_map).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8 top-level name; the experimental path is deprecated
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from neuspeech1_tpu.ops import flash_attention as fa


def unmanual_axes(mesh) -> set:
    """Mesh axes NOT already bound manual by an enclosing shard_map.

    Nesting contract (SP inside PP): a shard_map may only manualize axes
    that are still auto/explicit in the current trace context — the
    enclosing shard_map's axes arrive already Manual in the abstract mesh's
    axis_types and must be left out of the inner `axis_names`."""
    try:
        types = mesh.axis_types
    except Exception:  # pragma: no cover - very old mesh objects
        return set(mesh.axis_names)
    manual = jax.sharding.AxisType.Manual
    return {n for n, t in zip(mesh.axis_names, types) if t != manual}


def _head_weights(w8):
    """lse-shaped weights [B, 8H, T] -> per-(b, t, h) [B, T, H] (the 8
    sublanes per head are replicas; take one)."""
    return w8[:, ::8, :].transpose(0, 2, 1)


def _weighted(o, w_bth, d_head):
    """o [B, T, C] * per-(b,t,h) weights, zero-gated so NaN rows from
    fully-masked partials (weight 0) cannot poison the sum."""
    b, t, c = o.shape
    h = c // d_head
    o4 = o.reshape(b, t, h, d_head)
    w = w_bth[..., None]
    return jnp.where(w > 0, o4 * w, 0.0).reshape(b, t, c)


def _merge(o, lse, o_r, lse_r, d_head):
    new_lse = jnp.logaddexp(lse, lse_r)
    # -inf - -inf = nan when a row is masked in BOTH partials; weight 0
    w_old = jnp.where(lse == -jnp.inf, 0.0, jnp.exp(lse - new_lse))
    w_new = jnp.where(lse_r == -jnp.inf, 0.0, jnp.exp(lse_r - new_lse))
    merged = (_weighted(o, _head_weights(w_old), d_head)
              + _weighted(o_r, _head_weights(w_new), d_head))
    return merged, new_lse


def _ring_perm(n):
    return [(i, (i + 1) % n) for i in range(n)]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _ring(q, k, v, bias, n, axis, scale, block_q, d_head):
    o, _ = _ring_fwd_impl(q, k, v, bias, n, axis, scale, block_q, d_head)
    return o


def _ring_fwd_impl(q, k, v, bias, n, axis, scale, block_q, d_head):
    b, t_loc, c = q.shape
    o = jnp.zeros((b, t_loc, c), jnp.float32)
    lse = jnp.full((b, 8 * (c // d_head), t_loc), -jnp.inf, jnp.float32)
    perm = _ring_perm(n)
    for r in range(n):
        o_r, lse_r = fa.fwd_arrays_btc_bias(
            q, k, v, bias, scale, block_q, d_head)
        o, lse = _merge(o, lse, o_r.astype(jnp.float32), lse_r, d_head)
        if r < n - 1:
            k = lax.ppermute(k, axis, perm)
            v = lax.ppermute(v, axis, perm)
            bias = lax.ppermute(bias, axis, perm)
    return o.astype(q.dtype), lse


def _ring_fwd(q, k, v, bias, n, axis, scale, block_q, d_head):
    o, lse = _ring_fwd_impl(q, k, v, bias, n, axis, scale, block_q, d_head)
    return o, (q, k, v, bias, o, lse)


def _ring_bwd(n, axis, scale, block_q, d_head, res, do):
    q, k, v, bias, o, lse = res
    perm = _ring_perm(n)
    dq = jnp.zeros(q.shape, jnp.float32)
    dk = jnp.zeros(k.shape, jnp.float32)
    dv = jnp.zeros(v.shape, jnp.float32)
    for r in range(n):
        dq_r, dk_r, dv_r = fa.bwd_arrays_btc_bias(
            q, k, v, o, do, lse, bias, scale, block_q, d_head)
        dq = dq + dq_r.astype(jnp.float32)
        dk = dk + dk_r.astype(jnp.float32)
        dv = dv + dv_r.astype(jnp.float32)
        # grads ride the ring WITH their block; after the n-th hop (one per
        # round, including after the last) every block's grads are home
        k, v, bias, dk, dv = (
            lax.ppermute(x, axis, perm) for x in (k, v, bias, dk, dv))
    return (dq.astype(q.dtype), dk.astype(q.dtype), dv.astype(q.dtype),
            jnp.zeros_like(bias))


_ring.defvjp(_ring_fwd, _ring_bwd)


def _pick_block(t_loc: int, block_q: Optional[int]) -> int:
    if block_q is None:
        block_q = fa.btc_block_q(t_loc)
    while block_q > fa._LANE and t_loc % block_q:
        block_q -= fa._LANE
    if t_loc % block_q:
        raise ValueError(
            f"local sequence shard {t_loc} must be a multiple of the "
            f"{fa._LANE}-lane block quantum")
    return block_q


def ring_flash_attention(
    q, k, v, mesh: Mesh, seq_axis: str = "seq",
    kv_valid_len: Optional[int] = None, block_q: Optional[int] = None,
    batch_axes=None,
):
    """Sequence-parallel non-causal self-attention.

    q, k, v: [B, T, H, Dh] GLOBAL arrays (shard or replicate them however
    you like — shard_map repartitions to the ring layout). T must split
    into 128-multiple shards over ``mesh.shape[seq_axis]``. Rows at
    positions >= ``kv_valid_len`` are masked out of the attention (the
    padded-encoder contract). ``batch_axes``: optional mesh axis (or
    tuple) the batch dim is sharded over — composes DP x SP.
    Differentiable (custom VJP; see module docstring). Returns
    [B, T, H, Dh] in q.dtype.
    """
    b, t, h, d = q.shape
    if d not in (32, 64, 128):
        raise ValueError(f"d_head {d} unsupported (needs 128 % d == 0)")
    n = mesh.shape[seq_axis]
    if t % n:
        raise ValueError(f"T={t} not divisible by |{seq_axis}|={n}")
    t_loc = t // n
    bq = _pick_block(t_loc, block_q)
    scale = d ** -0.5
    c = h * d
    q3, k3, v3 = (x.reshape(b, t, c) for x in (q, k, v))
    valid = jnp.arange(t) < (t if kv_valid_len is None else kv_valid_len)
    bias = jnp.broadcast_to(
        jnp.where(valid, 0.0, fa.NEG_INF).astype(jnp.float32)[None, None, :],
        (1, 8, t))
    row_spec = P(batch_axes, seq_axis, None)
    def spmd(q3, k3, v3, bias3):
        # custom_vjp statics must be positional
        return _ring(q3, k3, v3, bias3, n, seq_axis, scale, bq, d)

    inner = shard_map(
        spmd,
        mesh=mesh,
        in_specs=(row_spec, row_spec, row_spec, P(None, None, seq_axis)),
        out_specs=row_spec,
        check_vma=False,
        # manualize only axes not already manual: when the ring runs inside
        # pipeline_scan's shard_map (SP x PP), 'pipe'/'data' arrive Manual
        # and re-manualizing them produces inconsistent collective types
        axis_names=frozenset(unmanual_axes(mesh)),
    )
    return inner(q3, k3, v3, bias).reshape(b, t, h, d)
