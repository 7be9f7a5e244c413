"""Multi-process (multi-host / DCN) mesh support.

The reference scales across hosts with torch.distributed/NCCL process
groups (one process per GPU, rendezvous via env://). The TPU-native
equivalent is JAX's multi-controller runtime: every host runs the same
program, ``jax.distributed.initialize`` federates them, and
``jax.devices()`` becomes the GLOBAL device list. Parallelism then stays
exactly what it is on one host — a ``Mesh`` + ``NamedSharding`` — with
one extra physical concern: axes that cross the process boundary
communicate over DCN (data-center network), axes inside a slice ride ICI.

Axis placement policy (the scaling-book recipe): put the FRAME/data axis
across DCN — frame-parallel stages exchange nothing but halo frames, so
they tolerate DCN latency — and keep ``tensor``/``spatial`` axes (whose
collectives are per-layer) inside the slice on ICI.
``make_hybrid_mesh`` encodes that policy; on a single process it
degrades to :func:`elvis_tpu.parallel.mesh.make_mesh` exactly.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh

from elvis_tpu.parallel.mesh import make_mesh

__all__ = [
    "initialize_distributed",
    "is_distributed",
    "make_hybrid_mesh",
    "process_local_batch",
]

_ENV_COORD = "ELVIS_TPU_COORDINATOR"
_ENV_NPROC = "ELVIS_TPU_NUM_PROCESSES"
_ENV_PID = "ELVIS_TPU_PROCESS_ID"

_initialized = False


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Join the multi-controller runtime; returns True if distributed.

    Arguments fall back to ``ELVIS_TPU_COORDINATOR`` /
    ``ELVIS_TPU_NUM_PROCESSES`` / ``ELVIS_TPU_PROCESS_ID`` (the
    reference's MASTER_ADDR/WORLD_SIZE/RANK pattern, elvis.py's
    torch.distributed env rendezvous), and to JAX's own cluster
    auto-detection (TPU pods set everything automatically — calling with
    no arguments on a pod slice is the normal path). Single process with
    no coordinator configured: no-op. Idempotent."""
    global _initialized
    coordinator_address = coordinator_address or os.environ.get(_ENV_COORD)
    if num_processes is None and _ENV_NPROC in os.environ:
        num_processes = int(os.environ[_ENV_NPROC])
    if process_id is None and _ENV_PID in os.environ:
        process_id = int(os.environ[_ENV_PID])
    if coordinator_address is None and num_processes is None:
        return jax.process_count() > 1
    if _initialized:
        return jax.process_count() > 1
    # NOTE: must run before anything touches the XLA backend
    # (jax.devices(), device_put, ... — even jax.process_count()).
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    return jax.process_count() > 1


def is_distributed() -> bool:
    return jax.process_count() > 1


def make_hybrid_mesh(
    ici_axes: Sequence[tuple] = (),
    dcn_axis: str = "data",
) -> Mesh:
    """Mesh whose ``dcn_axis`` spans processes and whose ``ici_axes``
    (name, size) tile the devices inside each process/slice.

    Single process: plain ``make_mesh(((dcn_axis, -1), *ici_axes))``.
    Multi-process: devices are grouped by ``process_index`` and stacked
    process-major along ``dcn_axis``, so each process's devices form
    contiguous data rows and the ICI axes never cross the process (DCN)
    boundary — the same placement ``mesh_utils.create_hybrid_device_mesh``
    produces for one slice per process, built directly from
    ``process_index`` because slice topology metadata is not available on
    every platform. Requires every process to report the SAME local device
    count (rectangular mesh); raises otherwise.
    """
    ici_axes = tuple(ici_axes)
    names = (dcn_axis,) + tuple(n for n, _ in ici_axes)
    if jax.process_count() == 1:
        return make_mesh(((dcn_axis, -1),) + ici_axes)

    ici_sizes = [s for _, s in ici_axes]
    known = int(np.prod(ici_sizes)) if ici_sizes else 1
    local = jax.local_device_count()
    if local % known:
        raise ValueError(
            f"{local} local devices not divisible by ici axes {ici_sizes}"
        )
    # Group devices by owning process, process-major along the data axis:
    # each process's devices are contiguous data rows, so only the data
    # axis ever crosses the process (DCN) boundary and every ici axis
    # stays on devices one process drives over ICI.
    groups: dict = {}
    for d in jax.devices():
        groups.setdefault(d.process_index, []).append(d)
    counts = {p: len(ds) for p, ds in groups.items()}
    if len(set(counts.values())) > 1:
        raise ValueError(
            f"processes report unequal local device counts {counts}; "
            "a rectangular hybrid mesh needs the same count per process"
        )
    blocks = [
        np.asarray(groups[p]).reshape([len(groups[p]) // known] + ici_sizes)
        for p in sorted(groups)
    ]
    return Mesh(np.concatenate(blocks, axis=0), names)


def process_local_batch(global_array, mesh: Mesh, axis: str = "data"):
    """Assemble a globally-sharded array from per-process local data
    (each host feeds only its shard of the frame axis — the multi-host
    input-pipeline pattern). Single-process: a plain device_put.

    ``global_array`` here is this PROCESS's slice of the global batch;
    the result is a global jax.Array of shape (process_count * local_n,
    ...) sharded along ``axis``."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = [None] * np.ndim(global_array)
    spec[0] = axis
    sharding = NamedSharding(mesh, P(*spec))
    if jax.process_count() == 1:
        return jax.device_put(global_array, sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(global_array))
