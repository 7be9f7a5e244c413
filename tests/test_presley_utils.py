"""PRESLEY driver + timing utilities."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from elvis_tpu.presley import PresleyConfig, parse_and_update_config, run_presley
from elvis_tpu.utils import measure_performance, measure_time, silence_console_output


class TestTimingUtils:
    def test_measure_time_logs(self, tmp_path, capsys):
        log = tmp_path / "t.jsonl"

        @measure_time(log_path=str(log))
        def work(x):
            return x + 1

        assert work(1) == 2
        rec = json.loads(log.read_text().splitlines()[0])
        assert rec["name"] == "work" and rec["status"] == "ok"
        assert "measure_time" in capsys.readouterr().out

    def test_measure_time_records_errors(self, tmp_path):
        log = tmp_path / "t.jsonl"

        @measure_time(log_path=str(log))
        def boom():
            raise ValueError("x")

        with pytest.raises(ValueError):
            boom()
        rec = json.loads(log.read_text().splitlines()[0])
        assert rec["status"] == "error"

    def test_measure_performance_ok(self, tiny_video):
        rec = measure_performance(
            lambda f: jnp.asarray(f), tiny_video,
            reference_frames=tiny_video, label="identity",
        )
        assert rec["status"] == "ok" and rec["fps"] > 0
        assert rec["metrics"]["psnr"] == 100.0

    def test_measure_performance_exclude_knob(self, tiny_video):
        """metrics_to_exclude semantics (reference presley.py:448-531):
        lpips/fvmd are skipped by default, computed when un-excluded."""
        rec = measure_performance(
            lambda f: jnp.asarray(f), tiny_video,
            reference_frames=tiny_video, label="identity",
        )
        m = rec["metrics"]
        assert "lpips" not in m and "fvmd" not in m
        assert "lpips_error" not in m and "fvmd_error" not in m
        rec = measure_performance(
            lambda f: jnp.asarray(f), tiny_video,
            reference_frames=tiny_video, label="identity", exclude=("fvmd",),
        )
        m = rec["metrics"]
        assert "lpips" in m or "lpips_error" in m
        assert "fvmd" not in m and "fvmd_error" not in m

    def test_measure_performance_error_captured(self, tiny_video):
        def bad(f):
            raise RuntimeError("nope")

        rec = measure_performance(bad, tiny_video)
        assert rec["status"] == "error" and "nope" in rec["error"]
        assert rec["fps"] == 0.0

    def test_silence(self, capsys):
        with silence_console_output():
            print("hidden")
        print("visible")
        out = capsys.readouterr().out
        assert "hidden" not in out and "visible" in out


class TestPresleyConfig:
    def test_auto_argparse(self):
        cfg = parse_and_update_config(
            PresleyConfig(), ["--width", "320", "--quality", "low", "--alpha", "0.3"]
        )
        assert cfg.width == 320 and cfg.quality == "low" and cfg.alpha == 0.3

    def test_bool_toggle(self):
        cfg = parse_and_update_config(PresleyConfig(), ["--save_intermediate"])
        assert cfg.save_intermediate is False  # store_false toggle of True default


@pytest.mark.slow
class TestRunPresley:
    def test_end_to_end(self, tmp_path):
        cfg = PresleyConfig(
            reference_video="synthetic://moving?frames=6",
            width=96, height=64, max_frames=6, block_size=8,
            quality="medium", output_dir=str(tmp_path),
            shrink_methods=["row_only"], blur_max_rounds=3,
        )
        results = run_presley(cfg)
        methods = results["methods"]
        for key in ("baseline", "roi_nvc", "shrink_row_only_telea",
                    "shrink_row_only_propainter", "shrink_row_only_e2fgvi",
                    "downsample_lanczos", "downsample_lanczos_tb",
                    "downsample_realesrgan_naive",
                    "downsample_realesrgan_adaptive",
                    "downsample_scale_lanczos",
                    "blur_unsharp", "blur_deblur_net",
                    "blur_instantir_adaptive", "blur_instantir_naive"):
            assert key in methods, key
            assert methods[key]["status"] == "ok", methods[key]
            assert methods[key]["fps"] > 0
            assert "psnr" in methods[key]["metrics"]
        assert os.path.exists(tmp_path / "performance_metrics.json")
        assert methods["baseline"]["bitrate_kbps"] > 0
