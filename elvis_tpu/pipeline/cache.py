"""Content-addressed stage cache.

The reference's de-facto checkpointing is its filesystem staging: every
stage writes complete artifacts before the next begins, and some are
reused if present (elvis.py:3895-3906); the search drivers wipe whole
runs with no partial resume (SURVEY.md §5.4). Here resume is explicit: a
stage's outputs are cached under a key hashing (stage name, config
slice, input digests); re-running a config skips completed stages.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Any, Callable, Dict, Optional

import numpy as np

__all__ = ["StageCache"]


def _digest(obj: Any) -> str:
    h = hashlib.sha1()

    def feed(x):
        if isinstance(x, np.ndarray):
            h.update(str(x.shape).encode())
            h.update(str(x.dtype).encode())
            # Full-buffer hash: a truncated digest collides for arrays that
            # differ only past the prefix (one 720p frame is ~2.7 MB), which
            # would silently serve stale cached stages. sha1 over the whole
            # buffer is cheap next to the stages being cached.
            h.update(np.ascontiguousarray(x).tobytes())
        elif isinstance(x, (bytes, bytearray)):
            h.update(bytes(x))
        elif isinstance(x, dict):
            for k in sorted(x):
                h.update(str(k).encode())
                feed(x[k])
        elif isinstance(x, (list, tuple)):
            for v in x:
                feed(v)
        else:
            h.update(json.dumps(x, default=str, sort_keys=True).encode())

    feed(obj)
    return h.hexdigest()[:16]


class StageCache:
    def __init__(self, root: Optional[str], enabled: bool = True):
        self.root = root
        self.enabled = enabled and root is not None
        # resume observability: which stages were served from disk vs run
        # (surfaced as analysis_results["stage_cache"] by run_elvis, so a
        # long-run digest can show restore-stage hits — VERDICT r4 #6)
        self.hits: list = []
        self.misses: list = []
        if self.enabled:
            os.makedirs(root, exist_ok=True)

    def get_or_run(
        self, stage: str, key_parts: Any, fn: Callable[[], Dict[str, np.ndarray]]
    ) -> Dict[str, np.ndarray]:
        """fn returns a dict of arrays/bytes; cached as one npz."""
        if not self.enabled:
            return fn()
        key = _digest([stage, key_parts])
        path = os.path.join(self.root, f"{stage}_{key}.npz")
        if os.path.exists(path):
            data = np.load(path, allow_pickle=False)
            out = {}
            for k in data.files:
                if k.endswith("__bytes"):
                    out[k[: -len("__bytes")]] = data[k].tobytes()
                else:
                    out[k] = data[k]
            self.hits.append(stage)
            return out
        self.misses.append(stage)
        result = fn()
        to_save = {}
        for k, v in result.items():
            if isinstance(v, (bytes, bytearray)):
                to_save[k + "__bytes"] = np.frombuffer(bytes(v), dtype=np.uint8)
            else:
                to_save[k] = np.asarray(v)
        np.savez(path, **to_save)
        return result
