"""Multi-process (multi-host / DCN) mesh support.

The reference scales across hosts with torch.distributed process groups
(env:// rendezvous, one process per GPU). These tests cover the JAX
multi-controller equivalent (elvis_tpu.parallel.distributed): the
single-process degenerate path in-process, and a REAL two-process
multi-controller run (subprocesses, gloo collectives over localhost —
the same code path a TPU pod takes over DCN) as a slow test.
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestSingleProcess:
    def test_initialize_noop_without_config(self):
        from elvis_tpu.parallel.distributed import initialize_distributed

        assert initialize_distributed() is False

    def test_hybrid_mesh_degenerates_to_make_mesh(self):
        from elvis_tpu.parallel.distributed import make_hybrid_mesh

        mesh = make_hybrid_mesh(ici_axes=(("tensor", 2),))
        n = len(jax.devices())
        assert dict(mesh.shape) == {"data": n // 2, "tensor": 2}

    def test_process_local_batch_single(self):
        from elvis_tpu.parallel.distributed import make_hybrid_mesh, process_local_batch

        mesh = make_hybrid_mesh()
        n = len(jax.devices())
        x = np.arange(n * 4 * 4, dtype=np.float32).reshape(n, 4, 4)
        g = process_local_batch(x, mesh, "data")
        assert g.shape == x.shape
        np.testing.assert_allclose(np.asarray(g), x)


_WORKER = textwrap.dedent(
    """
    import sys, os
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from elvis_tpu.parallel.distributed import (
        initialize_distributed, make_hybrid_mesh, process_local_batch)
    assert initialize_distributed(f"localhost:{port}", nproc, pid)
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    assert jax.process_count() == nproc
    assert len(jax.devices()) == 4 * nproc
    mesh = make_hybrid_mesh(ici_axes=(("tensor", 2),))
    assert dict(mesh.shape) == {"data": 2 * nproc, "tensor": 2}, mesh.shape

    # per-process frames -> one global sharded array (multi-host input
    # pipeline); a cross-process collective must see every shard.
    local = np.full((4, 8, 8), float(pid + 1), np.float32)
    x = process_local_batch(local, mesh, "data")
    assert x.shape == (4 * nproc, 8, 8)

    @jax.jit
    def global_mean(a):
        return jnp.mean(a)

    got = float(global_mean(x))
    want = float(np.mean([p + 1.0 for p in range(nproc)]))
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # explicit DCN-crossing psum through shard_map over the data axis
    @jax.jit
    @lambda f: shard_map(f, mesh=mesh, in_specs=P("data", None, None),
                         out_specs=P())
    def data_psum(a):
        return jax.lax.psum(jnp.sum(a, axis=(0, 1, 2)), "data")

    total = float(data_psum(x))
    np.testing.assert_allclose(
        total, sum((p + 1.0) * 4 * 64 for p in range(nproc)), rtol=1e-6)
    if pid == 0:
        print("DIST_OK")
    """
)


@pytest.mark.slow
class TestTwoProcess:
    def test_global_mesh_and_collectives(self, tmp_path):
        worker = tmp_path / "worker.py"
        worker.write_text(_WORKER)
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = str(s.getsockname()[1])
        env = dict(os.environ, PYTHONPATH=REPO)
        env.pop("JAX_PLATFORMS", None)
        procs = [
            subprocess.Popen(
                [sys.executable, str(worker), str(i), "2", port],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            )
            for i in range(2)
        ]
        outs = [p.communicate(timeout=300)[0].decode() for p in procs]
        for p, o in zip(procs, outs):
            assert p.returncode == 0, o[-2000:]
        assert "DIST_OK" in outs[0], outs[0][-2000:]
