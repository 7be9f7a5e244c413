"""Figures module + training CLI smoke tests."""

import os

import numpy as np
import pytest

from elvis_tpu.search.plots import generate_figures, load_runs, runs_to_dataframe


def _fake_runs(tmp_path, n=4):
    import json

    rng = np.random.default_rng(0)
    runs = []
    for i in range(n):
        metrics = {}
        for approach in ("Baseline", "PRESLEY QP", "ELVIS CV2"):
            metrics[approach] = {
                "foreground": {
                    "psnr_mean": 30 + rng.normal(), "ssim_mean": 0.9 + 0.02 * rng.normal(),
                    "mse_mean": 50.0, "lpips_mean": 0.1, "fvmd": 1.0,
                },
                "background": {
                    "psnr_mean": 32 + rng.normal(), "ssim_mean": 0.92, "mse_mean": 40.0,
                    "lpips_mean": 0.1, "fvmd": 1.0,
                },
                "bitrate_mbps": 0.5,
            }
        runs.append({
            "slug": f"run{i}", "status": "ok",
            "overrides": {"shrink_amount": 0.25 * (i + 1), "block_size": 8},
            "metrics": metrics,
        })
    with open(tmp_path / "runs_summary.json", "w") as f:
        json.dump(runs, f)
    return runs


class TestPlots:
    def test_load_and_frame(self, tmp_path):
        _fake_runs(tmp_path)
        runs = load_runs(str(tmp_path))
        assert len(runs) == 4
        df = runs_to_dataframe(runs)
        assert set(df.region) == {"foreground", "background"}
        assert "param_shrink_amount" in df.columns

    def test_generate_figures(self, tmp_path):
        _fake_runs(tmp_path)
        paths = generate_figures(str(tmp_path))
        assert len(paths) >= 4
        names = {os.path.basename(p) for p in paths}
        assert "fg_vs_bg_psnr_mean.png" in names
        assert "offset_vs_baseline_heatmap.png" in names
        assert "parameter_correlation.png" in names
        for p in paths:
            assert os.path.getsize(p) > 1000


@pytest.mark.slow
class TestTrainCli:
    def test_train_srnet_few_steps(self, tmp_path):
        from elvis_tpu.train.cli import main

        rc = main(["srnet", "--steps", "3", "--ckpt-dir", str(tmp_path)])
        assert rc == 0
        assert (tmp_path / "srnet").exists()

    def test_train_deblur_few_steps(self, tmp_path):
        from elvis_tpu.train.cli import main

        assert main(["deblur", "--steps", "2", "--ckpt-dir", str(tmp_path)]) == 0

    def test_train_inpaint_and_saliency(self, tmp_path):
        from elvis_tpu.train.cli import main

        assert main(["inpaint", "--steps", "2", "--ckpt-dir", str(tmp_path)]) == 0
        assert main(["saliency", "--steps", "2", "--ckpt-dir", str(tmp_path)]) == 0
