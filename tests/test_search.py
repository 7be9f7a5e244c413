"""Search drivers: validity filter, slugs, mini grid/random runs, pruner."""

import json
import os

import pytest

from elvis_tpu.search import grid_search, is_valid_overrides, random_search, slugify
from elvis_tpu.search.cleanup import cleanup_results


class TestValidity:
    def test_block_divides(self):
        assert is_valid_overrides({"width": 640, "height": 360, "block_size": 8})
        assert not is_valid_overrides({"width": 640, "height": 360, "block_size": 7})

    def test_aspect_ratio_bounds(self):
        # elvis_grid_search.py:120-149: ratio in [5/4, 21/9]
        assert not is_valid_overrides({"width": 360, "height": 360, "block_size": 8})
        assert not is_valid_overrides({"width": 1280, "height": 360, "block_size": 8})
        assert is_valid_overrides({"width": 840, "height": 360, "block_size": 8})


class TestSlug:
    def test_slug_conventions(self):
        s = slugify({"shrink_amount": 0.25, "reference_video": "a/b.mp4"})
        assert s == "shrink_amount-0p25_reference_video-a-bpmp4"


_MINI_GRID = {
    "reference_video": ["synthetic://moving?frames=4"],
    "width": [64],
    "height": [48],
    "block_size": [8],
    "shrink_amount": [0.25, 0.5],
    "target_bitrate_override": [100000],
    "enable_fvmd": [False],
    "enable_vmaf": [False],
    "generate_opencv_benchmarks": [False],
}


@pytest.mark.slow
class TestDrivers:
    def test_grid_search_end_to_end(self, tmp_path):
        summary = grid_search(_MINI_GRID, results_dir=str(tmp_path))
        assert len(summary) == 2
        assert all(e["status"] == "ok" for e in summary)
        assert (tmp_path / "runs_summary.json").exists()
        run_dirs = [d for d in tmp_path.iterdir() if d.is_dir() and d.name != "figures"]
        assert len(run_dirs) == 2
        for d in run_dirs:
            with open(d / "analysis_results.json") as f:
                data = json.load(f)
            assert "metrics" in data and "Baseline" in data["metrics"]
        # the driver rolls figures up like the reference notebook
        figures = list((tmp_path / "figures").glob("*.png"))
        assert any("fg_vs_bg" in f.name for f in figures)
        assert any("fps_by_resolution" in f.name for f in figures)
        assert any("task_time_stacked" in f.name for f in figures)

    def test_random_search_seeded_unique(self, tmp_path):
        summary = random_search(_MINI_GRID, runs=2, seed=3, results_dir=str(tmp_path))
        assert len(summary) == 2
        slugs = [e["slug"] for e in summary]
        assert len(set(slugs)) == 2

    def test_cleanup_prunes_and_renames(self, tmp_path):
        grid_search(
            {**_MINI_GRID, "shrink_amount": [0.25]}, results_dir=str(tmp_path)
        )
        # drop a junk artifact to prune
        run_dir = next(d for d in tmp_path.iterdir() if d.is_dir())
        (run_dir / "junk.bin").write_bytes(b"x" * 100)
        names = cleanup_results(str(tmp_path))
        assert names
        for d in tmp_path.iterdir():
            if d.is_dir():
                files = list(d.rglob("*"))
                assert all(
                    f.suffix.lower() in (".json", ".png") for f in files if f.is_file()
                )


@pytest.mark.slow
class TestRdCurve:
    def test_sweep_produces_monotone_curves(self, tmp_path):
        from elvis_tpu.search.rd_curve import plot_curves, rd_sweep

        out = tmp_path / "rd.json"
        curves = rd_sweep(
            "synthetic://moving?frames=5", 96, 64, qps=(28, 40),
            out_json=str(out),
        )
        assert out.exists()
        for label, pts in curves.items():
            assert len(pts) == 2, label
            lo, hi = sorted(pts, key=lambda p: p["kbps"])
            assert hi["psnr"] > lo["psnr"], label  # more bits, more quality
        png = tmp_path / "rd.png"
        plot_curves(curves, str(png))
        assert png.stat().st_size > 1000
