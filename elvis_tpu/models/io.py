"""Checkpoint loading for the in-framework model family.

The reference auto-downloads pretrained forks per model name
(elvis.py:2384-2493 ``realesrgan`` weight fetch); with zero egress this
framework trains and ships its own checkpoints under ``checkpoints/``.
This module is the one place that knows how to materialize params for a
model from such a directory (orbax), used by the pipeline auto-load, the
bench, and the eval harness alike.
"""

from __future__ import annotations

import os
from typing import Any, Optional

__all__ = [
    "init_params",
    "load_params",
    "maybe_load_params",
    "default_checkpoint_dir",
    "host_params",
]


def host_params(params: Any) -> Any:
    """Convert a param pytree to host numpy — MESH-AGNOSTIC placement.

    Restored/initialized jax arrays land COMMITTED to specific devices
    (orbax restores to device 0; a full-mesh replicate commits to all
    devices), which errors when the params are then closed over inside a
    ``shard_map`` on a DIFFERENT device subset (the per-stage
    ``*_devices`` knobs). Host constants instead get baked into each
    compiled executable — transferred once per compile, valid under any
    mesh."""
    import jax
    import numpy as np

    return jax.tree.map(np.asarray, params)


def default_checkpoint_dir() -> str:
    """Repo-level ``checkpoints/`` (next to the package)."""
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "checkpoints",
    )


def init_params(model, *example_args) -> Any:
    import jax

    return host_params(jax.jit(model.init)(jax.random.PRNGKey(0), *example_args))


def load_params(model, path: str, *example_args) -> Any:
    """Restore an orbax checkpoint into the model's param structure.

    Shapes come from ``jax.eval_shape`` over the example args (no real
    compute, no device use); non-array args (block sizes etc.) stay static
    Python values rather than tracers."""
    import jax
    import orbax.checkpoint as ocp

    arr_idx = [i for i, a in enumerate(example_args) if hasattr(a, "shape")]

    def init_fn(*arrays):
        args = list(example_args)
        for i, a in zip(arr_idx, arrays):
            args[i] = a
        return model.init(jax.random.PRNGKey(0), *args)

    abstract = jax.eval_shape(init_fn, *[example_args[i] for i in arr_idx])
    params = ocp.StandardCheckpointer().restore(os.path.abspath(path), abstract)
    # Host placement: valid under the full mesh, any per-stage device
    # subset, and single-chip chunking alike (see host_params).
    return host_params(params)


def maybe_load_params(model, path: Optional[str], *example_args) -> Any:
    """load_params when ``path`` exists, fresh init otherwise — the
    identity-fallback policy applied to weights (a fresh SR/deblur model
    is exactly its classical baseline by the zero-init-tail contract)."""
    if path and os.path.isdir(path):
        return load_params(model, path, *example_args)
    return init_params(model, *example_args)
