#!/usr/bin/env python3
"""Sweep motion_hint pyramid configs against the analytic truth field
(r5 fg diagnosis): the disc's 11 px mean hint error comes from the
coarsest level locking mixed disc/background blocks onto the pan, with
finer levels' refine radius too small to recover the object's relative
motion. Measures bg/disc field error + dev coverage per config.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_hint_field.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.diag_inpaint_inversion import build_clip  # noqa: E402
from scripts.probe_fg_diag import true_motion_field  # noqa: E402


def main() -> int:
    import jax
    import jax.numpy as jnp

    from elvis_tpu.ops.motion import motion_field_from_hint, motion_hint

    b = 8
    clip, offs, fg_disc = build_clip()
    n = clip.shape[0]
    by, bx = clip.shape[1] // b, clip.shape[2] // b
    truef = true_motion_field(offs, by, bx, b)
    disc_b = np.zeros((n, by, bx), bool)
    for t in range(n):
        disc_b[t] = fg_disc[t].reshape(by, b, bx, b).mean(axis=(1, 3)) > 0.5
    cj = jnp.asarray(clip)

    for kw in (
        dict(radius=4, levels=4),   # shipped default
        dict(radius=4, levels=3),
        dict(radius=6, levels=3),
        dict(radius=8, levels=3),
        dict(radius=8, levels=2),
        dict(radius=4, levels=3, refine_radius=4),
        dict(radius=6, levels=3, refine_radius=4),
    ):
        gmv, dev = jax.jit(
            lambda f, kw=kw: motion_hint(f, b, **kw))(cj)
        mv = np.asarray(jax.jit(
            lambda g, d: motion_field_from_hint(g, d, by, bx))(gmv, dev))
        err = np.abs(mv - truef)
        e_bg = err[1:][~disc_b[1:]].mean()
        e_fg = err[1:][disc_b[1:]].mean()
        p95 = np.percentile(err[1:][disc_b[1:]], 95)
        nz = (np.abs(np.asarray(dev)).max(-1) > 0).mean()
        print(f"{kw}: bg {e_bg:.2f}  disc {e_fg:.2f}  disc_p95 {p95:.2f}  "
              f"dev_nz {nz:.3f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
