"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference had no tests at all (SURVEY.md §4); its multi-GPU paths were
only "tested" by running them. Here every sharded path is exercised on
fake CPU devices so CI needs neither a TPU slice nor codec binaries.
"""

import os

# Must be set before jax initializes its backends. Note: env JAX_PLATFORMS
# alone is not enough in this image (a preinstalled TPU plugin prepends
# itself), so we also force the config below.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
# No persistent XLA compile cache under tests: its write path
# (put_executable_and_time) segfaulted three full-suite runs; see
# elvis_tpu/utils/compile_cache.py. "off" is a hard opt-out there.
os.environ["ELVIS_TPU_COMPILE_CACHE"] = "off"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_mesh():
    assert jax.default_backend() == "cpu"
    assert len(jax.devices()) == 8


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def tiny_video(rng):
    """A small synthetic clip with structure: moving gradient + noise.

    (N, H, W, 3) uint8 — tiny enough for fast CPU jit, big enough to have
    distinct block content.
    """
    n, h, w = 5, 48, 64
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(n):
        base = (
            128
            + 60 * np.sin(2 * np.pi * (xx + 7 * t) / 32)
            + 40 * np.cos(2 * np.pi * yy / 24)
        )
        img = np.stack([base, np.roll(base, 3, axis=1), np.roll(base, -2, axis=0)], axis=-1)
        img = img + rng.normal(0, 6, size=img.shape)
        frames.append(np.clip(img, 0, 255).astype(np.uint8))
    return np.stack(frames, axis=0)
