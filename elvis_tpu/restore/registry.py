"""Restoration registry: pluggable restorers keyed by degradation type.

The reference hard-wires each restoration model behind its own function
family (ProPainter/E2FGVI/Telea for removal at elvis.py:1458/1693/4597,
Real-ESRGAN/Lanczos for downsample at elvis.py:2685/2773, InstantIR/unsharp
for blur at elvis.py:3000/2822), and its README describes a different set
(SinSR/SwinTormer/LaplacianVCAR) that never shipped. SURVEY.md §0 calls
for restoration backends as pluggable slots keyed by degradation type so
both generations fit one interface — this registry is that slot.

A restorer is ``fn(frames, maps, block_size, **kw) -> frames`` where
``maps`` is the strength-map sidecar of the matching degradation
(removal mask / downsample levels / blur rounds / dampen levels).
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

__all__ = ["register_restorer", "get_restorer", "available_restorers", "safe_restore"]

Restorer = Callable[..., object]

_REGISTRY: Dict[Tuple[str, str], Restorer] = {}


def register_restorer(degradation: str, name: str):
    """degradation in {'removal', 'downsample', 'blur', 'dct_dampen'}."""

    def deco(fn: Restorer) -> Restorer:
        _REGISTRY[(degradation, name)] = fn
        return fn

    return deco


def get_restorer(degradation: str, name: str) -> Restorer:
    try:
        return _REGISTRY[(degradation, name)]
    except KeyError:
        avail = sorted(n for d, n in _REGISTRY if d == degradation)
        raise KeyError(
            f"no restorer {name!r} for degradation {degradation!r}; available: {avail}"
        ) from None


def available_restorers(degradation: str | None = None):
    if degradation is None:
        return sorted(_REGISTRY)
    return sorted(n for d, n in _REGISTRY if d == degradation)


def safe_restore(fn: Restorer, frames, *args, **kwargs):
    """Run a restorer with the reference's graceful-degradation policy
    (SURVEY.md §5.3: tile restore falls back to input on exception,
    utils.py:251-254; UAV OOM falls back to input frames,
    utils.py:1565-1569): any failure returns the input frames untouched
    plus the error, never crashing the pipeline.

    Returns (frames_out, error_or_None).
    """
    try:
        out = fn(frames, *args, **kwargs)
        import jax

        jax.block_until_ready(out)
        return out, None
    except Exception as exc:  # noqa: BLE001 — the policy is catch-all
        return frames, f"{type(exc).__name__}: {exc}"
