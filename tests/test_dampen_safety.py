"""DCT-dampen restore + graceful-degradation policy + dampen pipeline branch."""

import numpy as np
import jax.numpy as jnp
import pytest

from elvis_tpu.degrade import dct_dampen
from elvis_tpu.restore import (
    get_restorer,
    restore_dct_dampen_inverse,
    safe_restore,
)


def _mse(a, b):
    return float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))


class TestDampenRestore:
    def test_inverse_recovers_moderate_dampening(self, tiny_video):
        frames = jnp.asarray(tiny_video.astype(np.float32))
        degraded, levels = dct_dampen(frames, jnp.full((5, 6, 8), 0.4), 8)
        restored = restore_dct_dampen_inverse(degraded, levels, 8)
        assert _mse(restored, frames) < _mse(degraded, frames) * 0.5

    def test_zero_level_identity(self, tiny_video):
        frames = jnp.asarray(tiny_video)
        out = restore_dct_dampen_inverse(frames, jnp.zeros((5, 6, 8), jnp.int32), 8)
        np.testing.assert_array_equal(np.asarray(out), tiny_video)

    def test_registered(self):
        assert get_restorer("dct_dampen", "inverse_filter") is restore_dct_dampen_inverse


class TestSafeRestore:
    def test_success_passthrough(self, tiny_video):
        out, err = safe_restore(lambda f: f + 0, jnp.asarray(tiny_video))
        assert err is None

    def test_failure_returns_input(self, tiny_video):
        def bad(f):
            raise RuntimeError("restorer exploded")

        frames = jnp.asarray(tiny_video)
        out, err = safe_restore(bad, frames)
        assert "restorer exploded" in err
        np.testing.assert_array_equal(np.asarray(out), tiny_video)


@pytest.mark.slow
class TestDampenPipelineBranch:
    def test_branch_produces_approach(self, tmp_path):
        from elvis_tpu.pipeline import APPROACHES, ElvisConfig, run_elvis

        cfg = ElvisConfig(
            reference_video="synthetic://moving?frames=5",
            width=96, height=64, block_size=8,
            target_bitrate_override=100_000,
            experiment_dir=str(tmp_path),
            enable_fvmd=False, enable_vmaf=False,
            generate_opencv_benchmarks=False,
            enable_dct_dampen=True,
        )
        results = run_elvis(cfg)
        assert APPROACHES.ELVIS_V2_DAMPEN in results
        r = results[APPROACHES.ELVIS_V2_DAMPEN]
        assert r["bitrate_mbps"] > 0
        assert 15 < r["foreground"]["psnr_mean"] <= 100
