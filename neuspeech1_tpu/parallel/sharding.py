"""Parameter sharding rules: param path -> PartitionSpec.

Megatron-style tensor parallelism falls out of GSPMD once weights carry the
right specs: q/k/v and fc1 shard their output dim over 'tensor' (head-
parallel / column-parallel), out-proj and fc2 shard their input dim
(row-parallel) so XLA inserts a single all-reduce per block. The 'fsdp' axis
shards the other large dim, ZeRO-3 style. Everything small (norms, biases of
row-parallel layers, convs, positions) is replicated.

Layer-stacked weights have a leading L axis which is never sharded.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for(path: Tuple[str, ...], shape) -> P:
    keys = [str(getattr(k, "key", k)) for k in path]
    name = "/".join(keys)
    last = keys[-1]

    if last != "w":
        if "token_embed" in name:
            # vocab (51865) is odd -> not shardable without padding; shard
            # the feature dim over 'tensor' instead
            return P(None, "tensor")
        if last == "b" and ("fc1" in keys or any(p in keys for p in ("q", "k", "v"))):
            return P(None, "tensor")  # column-parallel bias rides the shard
        return P()  # other biases, norms, pos embeds, lora alpha/E/mask

    # conv kernels [out, in, k] — tiny, replicate
    if any(k in ("stem", "conv2") for k in keys):
        return P()

    # LoRA factors: A [L, d_in, r] / B [L, r, d_out]
    if "A" in keys or "B" in keys:
        return P()

    # attention projections [L, d, d]
    if "self_attn" in keys or "cross_attn" in keys:
        proj = keys[keys.index("self_attn" if "self_attn" in keys else "cross_attn") + 1]
        if proj == "out":
            return P(None, "tensor", "fsdp")  # row-parallel
        return P(None, "fsdp", "tensor")  # column-parallel q/k/v

    if "fc1" in keys:
        return P(None, "fsdp", "tensor")
    if "fc2" in keys:
        return P(None, "tensor", "fsdp")
    return P()


def param_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    """Pytree of PartitionSpecs matching ``params``."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _spec_for(path, leaf.shape), params
    )


def restrict_spec(spec: P, axis_names) -> P:
    """Drop axis names the mesh doesn't have (e.g. a ('data','seq') mesh
    has no 'tensor'/'fsdp' — those dims fall back to replicated)."""
    def keep(e):
        if e is None:
            return None
        if isinstance(e, (tuple, list)):
            kept = tuple(a for a in e if a in axis_names)
            return kept if kept else None
        return e if e in axis_names else None

    return P(*(keep(e) for e in spec))


def param_shardings(mesh: Mesh, params: Dict[str, Any]):
    names = set(mesh.axis_names)
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, restrict_spec(spec, names)),
        param_specs(params),
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(mesh: Mesh, params: Dict[str, Any]):
    """Place (and lay out) a parameter tree onto the mesh."""
    return jax.device_put(params, param_shardings(mesh, params))
