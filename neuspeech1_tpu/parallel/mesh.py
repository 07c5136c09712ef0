"""Device mesh construction.

The reference's only parallelism is torch-DDP data parallelism via HF Trainer
(`finetune.py:119-122,248`). TPU-natively the whole topology is one
`jax.sharding.Mesh`; data parallelism, FSDP-style parameter sharding and
tensor parallelism are all expressed as PartitionSpecs over its axes and XLA
emits the ICI collectives (scaling-book recipe). whisper-base (72.6M params)
needs none of the model sharding to fit, but the axes are first-class so the
same code scales to bigger configs and multi-host meshes.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("data", "fsdp", "tensor")


def make_mesh(
    data: int = -1, fsdp: int = 1, tensor: int = 1, devices=None
) -> Mesh:
    """Build a ('data', 'fsdp', 'tensor') mesh. data=-1 = all remaining."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % (fsdp * tensor) == 0, f"{n} devices not divisible by {fsdp * tensor}"
        data = n // (fsdp * tensor)
    want = data * fsdp * tensor
    assert want <= n, f"mesh {data}x{fsdp}x{tensor} needs {want} > {n} devices"
    arr = np.array(devices[:want]).reshape(data, fsdp, tensor)
    return Mesh(arr, AXES)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim sharded over data (and fsdp) axes; rest replicated.
    Axes the mesh doesn't have are skipped (e.g. a ('data','seq') mesh)."""
    axes = tuple(a for a in ("data", "fsdp") if a in mesh.axis_names)
    return NamedSharding(mesh, P(axes if axes else None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def local_mesh_info(mesh: Mesh) -> dict:
    return {
        "devices": mesh.devices.size,
        "axes": dict(zip(mesh.axis_names, mesh.devices.shape)),
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
    }


_distributed_initialized = False


def initialize_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up (DCN): call once per process, BEFORE any other
    jax use (including the compilation cache); a no-op without a coordinator.

    Decides purely from the argument — `jax.process_count()` would itself
    initialize the XLA backend and make `jax.distributed.initialize` raise,
    so jax state must not be touched here. Re-entry is guarded by a module
    flag instead."""
    global _distributed_initialized
    if coordinator is None or _distributed_initialized:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    _distributed_initialized = True
