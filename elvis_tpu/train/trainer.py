"""Trainer: sharded train steps (DP over batch, TP over channels) and
orbax checkpointing.

The reference has no training loop at all — its "distributed" machinery
tops out at chunk-per-GPU inference threads (SURVEY.md §2.7). Here the
restoration models are first-class trainable citizens:

  * the train step is one ``jit`` over a ``Mesh`` with explicit
    shardings — batch sharded on the 'data' axis, conv-kernel
    output-channel axes sharded on the 'tensor' axis (XLA inserts the
    psum/all-gathers over ICI; no hand-written collectives);
  * gradients reduce across 'data' automatically through the sharded
    loss mean;
  * checkpoints via orbax (the stage-cache counterpart for weights).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["TrainState", "make_sharded_train_step", "Trainer", "partition_params"]


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: int = 0


def partition_params(params, mesh: Mesh, tensor_axis: str = "tensor"):
    """Shard conv/dense kernels on their output-channel (last) axis over
    the tensor axis when divisible; replicate everything else."""
    if tensor_axis not in mesh.shape:
        return jax.tree.map(lambda _: NamedSharding(mesh, P()), params)
    tsize = mesh.shape[tensor_axis]

    def rule(x):
        if hasattr(x, "ndim") and x.ndim >= 2 and x.shape[-1] % tsize == 0:
            return NamedSharding(mesh, P(*([None] * (x.ndim - 1) + [tensor_axis])))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, params)


def make_sharded_train_step(
    loss_fn: Callable,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    data_axis: str = "data",
    tensor_axis: str = "tensor",
):
    """loss_fn(params, batch, rng) -> scalar. Returns (train_step, shard_state,
    shard_batch) where train_step is jitted with explicit shardings."""

    def train_step(state_params, opt_state, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(state_params, batch, rng)
        updates, opt_state = optimizer.update(grads, opt_state, state_params)
        params = optax.apply_updates(state_params, updates)
        return params, opt_state, loss

    batch_sharding = NamedSharding(mesh, P(data_axis))

    def shard_state(params, opt_state):
        pshard = partition_params(params, mesh, tensor_axis)
        params = jax.device_put(params, pshard)
        # Optimizer state mirrors param sharding where leaf shapes match
        # (adam moments share param shapes); scalars/counters replicate.
        shapes = {
            tuple(p.shape): s
            for p, s in zip(jax.tree.leaves(params), jax.tree.leaves(pshard))
        }

        def opt_rule(x):
            if hasattr(x, "shape") and tuple(x.shape) in shapes:
                return shapes[tuple(x.shape)]
            return NamedSharding(mesh, P())

        opt_state = jax.device_put(opt_state, jax.tree.map(opt_rule, opt_state))
        return params, opt_state

    def shard_batch(batch):
        return jax.tree.map(
            lambda x: jax.device_put(jnp.asarray(x), batch_sharding), batch
        )

    jitted = jax.jit(train_step, donate_argnums=(0, 1))
    return jitted, shard_state, shard_batch


class Trainer:
    """Minimal loop driver with orbax checkpointing."""

    def __init__(
        self,
        loss_fn: Callable,
        params,
        mesh: Optional[Mesh] = None,
        learning_rate: float = 2e-4,
        ckpt_dir: Optional[str] = None,
        weight_decay: float = 1e-4,
    ):
        if mesh is None:
            from elvis_tpu.parallel.mesh import make_mesh

            mesh = make_mesh()
        self.mesh = mesh
        self.optimizer = optax.adamw(learning_rate, weight_decay=weight_decay)
        # jit the init: optax's eager per-leaf zeros_like dispatches ~2
        # tiny device ops per parameter, which stalls badly on high-latency
        # device transports (this image's TPU tunnel).
        opt_state = jax.jit(self.optimizer.init)(params)
        self.step_fn, shard_state, self.shard_batch = make_sharded_train_step(
            loss_fn, self.optimizer, mesh
        )
        params, opt_state = shard_state(params, opt_state)
        self.state = TrainState(params, opt_state)
        self.ckpt_dir = ckpt_dir

    def step(self, batch, rng) -> float:
        params, opt_state, loss = self.step_fn(
            self.state.params, self.state.opt_state, self.shard_batch(batch), rng
        )
        self.state = TrainState(params, opt_state, self.state.step + 1)
        return float(loss)

    def save(self, tag: str = "latest"):
        if self.ckpt_dir is None:
            return
        import orbax.checkpoint as ocp
        import os

        path = os.path.abspath(os.path.join(self.ckpt_dir, tag))
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, self.state.params, force=True)
        ckptr.wait_until_finished()

    def load(self, tag: str = "latest"):
        import orbax.checkpoint as ocp
        import os

        path = os.path.abspath(os.path.join(self.ckpt_dir, tag))
        ckptr = ocp.StandardCheckpointer()
        self.state = dataclasses.replace(
            self.state,
            params=ckptr.restore(path, self.state.params),
        )
        return self.state.params
