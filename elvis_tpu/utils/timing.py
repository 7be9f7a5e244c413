"""Timing, logging, and output-hygiene utilities.

Parity targets:
  * ``measure_time`` (reference utils.py:121-173) — decorator logging wall
    time per call, optionally appending JSON records to a log file;
  * ``measure_performance`` (reference presley.py:448-531) — wraps a
    restorer, reporting FPS plus optional quality metrics with status/
    error fields. Crucially this version is applied at CALL time, not at
    decoration time with module-level state (the reference's decorators
    capture module globals at import and run the whole pipeline on
    import, SURVEY.md §3.2 — a design explicitly not repeated);
  * ``_safe_print`` / ``_silence_console_output`` (elvis.py:356-411) —
    stdout hygiene around noisy libraries.

For deep profiling use ``jax.profiler.trace`` around any pipeline stage;
the per-stage wall clock lands in ``execution_times_seconds`` with the
reference's schema either way (SURVEY.md §5.1).
"""

from __future__ import annotations

import contextlib
import functools
import io
import json
import os
import sys
import time
from typing import Callable, Dict, Optional

__all__ = [
    "measure_time",
    "measure_performance",
    "safe_print",
    "silence_console_output",
]


def safe_print(*args, **kwargs) -> None:
    """Print resilient to a closed/replaced stdout (elvis.py:397-411)."""
    try:
        print(*args, **kwargs)
        sys.stdout.flush()
    except (ValueError, OSError):
        pass


@contextlib.contextmanager
def silence_console_output():
    """Mute stdout/stderr for noisy vendor calls (elvis.py:356-394)."""
    saved_out, saved_err = sys.stdout, sys.stderr
    try:
        sys.stdout = io.StringIO()
        sys.stderr = io.StringIO()
        yield
    finally:
        sys.stdout, sys.stderr = saved_out, saved_err


def measure_time(label: Optional[str] = None, log_path: Optional[str] = None):
    """Decorator: wall-time the call; optionally append a JSON record."""

    def deco(fn: Callable):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            name = label or fn.__name__
            t0 = time.time()
            try:
                result = fn(*args, **kwargs)
                status = "ok"
                return result
            except Exception:
                status = "error"
                raise
            finally:
                elapsed = time.time() - t0
                safe_print(f"[measure_time] {name}: {elapsed:.3f}s ({status})")
                if log_path:
                    os.makedirs(os.path.dirname(log_path) or ".", exist_ok=True)
                    with open(log_path, "a") as f:
                        f.write(json.dumps({"name": name, "seconds": elapsed,
                                            "status": status, "ts": time.time()}) + "\n")

        return wrapper

    return deco


def measure_performance(
    restore_fn: Callable,
    frames,
    *args,
    reference_frames=None,
    fg_masks=None,
    metrics: bool = True,
    label: Optional[str] = None,
    exclude=("lpips", "fvmd"),
    **kwargs,
) -> Dict:
    """Run a restorer and report FPS (+ optional quality metrics).

    Returns {'label', 'status', 'seconds', 'fps', 'frames',
    'error'?, 'metrics'?}; the restored frames are under 'output'.

    ``exclude``: expensive metrics skipped by name — the reference's
    ``metrics_to_exclude`` (presley.py:448-531). PSNR/SSIM/MSE always
    run; 'lpips' (the trained perceptual backbone) and 'fvmd' join the
    dict when removed from the exclusion list.
    """
    import numpy as np

    name = label or getattr(restore_fn, "__name__", "restorer")
    n = int(np.asarray(frames).shape[0])
    record: Dict = {"label": name, "frames": n}
    t0 = time.time()
    try:
        out = restore_fn(frames, *args, **kwargs)
        try:  # drain device async dispatch for an honest wall clock
            import jax

            jax.block_until_ready(out)
        except Exception:
            pass
        record["status"] = "ok"
        record["output"] = out
    except Exception as exc:
        record["status"] = "error"
        record["error"] = f"{type(exc).__name__}: {exc}"
        record["seconds"] = time.time() - t0
        record["fps"] = 0.0
        return record
    record["seconds"] = time.time() - t0
    record["fps"] = n / record["seconds"] if record["seconds"] > 0 else float("inf")

    if metrics and reference_frames is not None:
        import jax.numpy as jnp

        from elvis_tpu.metrics import masked_mse, masked_psnr, masked_ssim

        ref = jnp.asarray(np.asarray(reference_frames)).astype(jnp.float32)
        dec = jnp.asarray(np.asarray(out)).astype(jnp.float32)
        m: Dict = {
            "psnr": float(masked_psnr(ref, dec).mean()),
            "ssim": float(masked_ssim(ref, dec).mean()),
            "mse": float(masked_mse(ref, dec).mean()),
        }
        if fg_masks is not None:
            fg = jnp.asarray(np.asarray(fg_masks).astype(bool))
            m["fg_psnr"] = float(masked_psnr(ref, dec, fg).mean())
            m["bg_psnr"] = float(masked_psnr(ref, dec, ~fg).mean())
        excluded = {e.lower() for e in (exclude or ())}
        if "lpips" not in excluded:
            try:
                from elvis_tpu.metrics.perceptual import lpips_distance

                m["lpips"] = float(jnp.mean(lpips_distance(ref, dec)))
            except Exception as exc:  # no checkpoint / tiny frames
                m["lpips_error"] = f"{type(exc).__name__}: {exc}"
        if "fvmd" not in excluded:
            try:
                from elvis_tpu.metrics.fvmd import fvmd

                m["fvmd"] = float(fvmd(np.asarray(reference_frames),
                                       np.asarray(out)))
            except Exception as exc:
                m["fvmd_error"] = f"{type(exc).__name__}: {exc}"
        record["metrics"] = m
    return record
