"""GPipe-style pipeline parallelism for a stacked layer scan over a mesh axis.

Beyond the reference (whose only parallelism is torch-DDP data parallelism,
`finetune.py:119-122,248`; SURVEY §2): this shards a homogeneous layer stack
over a mesh axis so each device holds L/P consecutive layers in memory —
the 'pp' leg of the parallelism story (DP/FSDP/TP via GSPMD specs in
`parallel/sharding.py`, SP via `parallel/ring_attention`, PP here).

The schedule is the classic microbatch ring, expressed TPU-natively as a
`shard_map` over the pipeline axis with one `lax.scan` over clock ticks:

  tick t: stage 0 injects microbatch t (clamped past M); every stage applies
          its local layers to its resident activation; stage P-1 writes its
          result into the output buffer at slot t-(P-1) (clamped — early
          garbage writes land on slot 0 and are overwritten by the first
          valid one); activations hop one stage around the ring via
          `lax.ppermute` (the ICI collective — point-to-point, no host).

  M + P - 1 ticks drain M microbatches through P stages; the bubble
  fraction is (P-1)/(M+P-1). Activations in flight are O(B/M) per device
  and each device materializes only its own L/P layers' activations, which
  is the point: layer memory AND activation memory scale 1/P.

Numerics are exactly the plain `lax.scan` over the full stack: every op is
per-sample, so splitting the batch into microbatches is a pure reindexing.
The idle ticks run the layers on zeros (finite through LN/attention/MLP)
and their outputs are never read.

Autodiff: plain `jax.grad` through the shard_map. The output psum's
cotangent replicates across the pipe axis, the stage mask zeroes it
everywhere but stage P-1, `ppermute` transposes to the reverse ring, the
per-stage parameter cotangents stay on their own stage (matching the
P(axis) param sharding), and the replicated input's cotangent is psum'd
over the pipe axis by shard_map's transpose rule — nonzero only on stage 0.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8 top-level name; the experimental path is deprecated
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def _leading(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        raise ValueError("pipeline_scan: empty layer pytree")
    sizes = {leaf.shape[0] for leaf in leaves}
    if len(sizes) != 1:
        raise ValueError(f"stacked layer leaves disagree on depth: {sizes}")
    return sizes.pop()


def pipeline_scan(
    body,
    xs,
    h,
    mesh: Mesh,
    pipe_axis: str = "pipe",
    num_microbatches: Optional[int] = None,
    batch_axes=None,
    consts=(),
    sample_consts=(),
    auto_axes=(),
):
    """Run ``lax.scan(body, h, xs)``'s carry pipeline-parallel over a mesh axis.

    body(carry, xs_slice, *sample_consts_mb, *consts) -> carry — one layer
    (same contract as a scan body that returns no per-step output). ``xs``:
    pytree stacked on a leading layer dim L with L % mesh.shape[pipe_axis]
    == 0 (each stage owns L/P consecutive layers). ``h``: [B, ...] with
    B % num_microbatches == 0. ``batch_axes``: mesh axis (or tuple) the
    batch dim is sharded over — composes DP x PP. ``consts``: pytree of
    stage-invariant arrays handed to every body call (replicated across the
    pipe axis), e.g. an attention mask. ``sample_consts``: pytree of
    PER-SAMPLE arrays ([B, ...], e.g. a decoder's encoder states) — every
    stage receives the slice for the microbatch it is processing that tick
    (the schedule is deterministic: stage s holds microbatch t - s), so
    they never ride the ring. ``auto_axes``: mesh axes to LEAVE auto inside
    the stage body so a nested shard_map can claim them — e.g. the 'seq'
    axis when ring attention (SP) runs inside the pipelined layers.
    Differentiable; numerically identical to the plain scan.
    """
    n_stages = mesh.shape[pipe_axis]
    n_layers = _leading(xs)
    if n_layers % n_stages:
        raise ValueError(
            f"{n_layers} layers not divisible by |{pipe_axis}|={n_stages}")
    m = num_microbatches or n_stages
    b = h.shape[0]
    if b % m:
        raise ValueError(f"batch {b} not divisible by {m} microbatches")
    for leaf in jax.tree_util.tree_leaves(sample_consts):
        if leaf.shape[0] != b:
            raise ValueError(
                f"sample_consts leaf batch {leaf.shape[0]} != carry batch {b}")
    if n_stages == 1:  # degenerate mesh: plain scan, no ring
        carry, _ = lax.scan(
            lambda c, xs_: (body(c, xs_, *sample_consts, *consts), None),
            h, xs)
        return carry

    def _mb(leaf):
        return leaf.reshape(m, leaf.shape[0] // m, *leaf.shape[1:])

    def _mb_spec(leaf):
        return P(None, batch_axes, *([None] * (leaf.ndim - 1)))

    hm = _mb(h)
    batch_spec = _mb_spec(h)
    layer_spec = jax.tree_util.tree_map(
        lambda leaf: P(pipe_axis, *([None] * (leaf.ndim - 1))), xs)
    const_spec = jax.tree_util.tree_map(
        lambda leaf: P(*([None] * leaf.ndim)), consts)
    scm = jax.tree_util.tree_map(_mb, sample_consts)
    sc_spec = jax.tree_util.tree_map(_mb_spec, sample_consts)
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def spmd(xs_loc, hm_loc, consts_loc, scm_loc):
        idx = lax.axis_index(pipe_axis)
        state = jnp.zeros(hm_loc.shape[1:], hm_loc.dtype)
        outputs = jnp.zeros(hm_loc.shape, hm_loc.dtype)

        def tick(carry, t):
            state, outputs = carry
            inj = lax.dynamic_index_in_dim(
                hm_loc, jnp.clip(t, 0, m - 1), 0, keepdims=False)
            # this stage is processing microbatch t - idx this tick
            mb_id = jnp.clip(t - idx, 0, m - 1)
            sc_t = jax.tree_util.tree_map(
                lambda leaf: lax.dynamic_index_in_dim(
                    leaf, mb_id, 0, keepdims=False), scm_loc)

            def stage(carry, layer_xs):
                return body(carry, layer_xs, *sc_t, *consts_loc), None

            y = jnp.where(idx == 0, inj, state)
            y, _ = lax.scan(stage, y, xs_loc)
            outputs = lax.dynamic_update_index_in_dim(
                outputs, y, jnp.clip(t - (n_stages - 1), 0, m - 1), 0)
            state = lax.ppermute(y, pipe_axis, perm)
            return (state, outputs), None

        (_, outputs), _ = lax.scan(
            tick, (state, outputs), jnp.arange(m + n_stages - 1))
        # only the last stage holds real outputs; the masked psum makes the
        # result genuinely replicated along the pipe axis (and its transpose
        # routes the output cotangent back to stage P-1 alone)
        outputs = jnp.where(idx == n_stages - 1, outputs, 0)
        return lax.psum(outputs, pipe_axis)

    from neuspeech1_tpu.parallel.ring_attention import unmanual_axes

    inner = shard_map(
        spmd,
        mesh=mesh,
        in_specs=(layer_spec, batch_spec, const_spec, sc_spec),
        out_specs=batch_spec,
        check_vma=False,
        # manualize every still-auto axis EXCEPT auto_axes (left auto so a
        # nested shard_map inside the stage body — SP's ring — can claim it)
        axis_names=frozenset(unmanual_axes(mesh) - set(auto_axes)),
    )
    return inner(xs, hm, consts, scm).reshape(h.shape)
