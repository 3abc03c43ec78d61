"""Tracing/profiling helpers (SURVEY.md §5.1 — the reference has none).

Wraps jax.profiler for xplane traces viewable in tensorboard
(tensorboard-plugin-profile is installed in this image), plus lightweight
wall-clock scopes that respect the axon tunnel's async-execution quirk
(block via host materialization, not block_until_ready — see bench.py).
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Any, Dict, Iterator, Optional

import numpy as np


@contextlib.contextmanager
def xplane_trace(logdir: str) -> Iterator[None]:
    """Capture a device trace: ``with xplane_trace('/tmp/prof'): step()``.
    View with: tensorboard --logdir /tmp/prof (profile plugin)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def named_scope(name: str):
    """Annotate a region for the profiler: shows up in xplane timelines."""
    import jax

    return jax.named_scope(name)


def materialize(tree: Any) -> Any:
    """Force execution + host transfer of every array in a pytree (the only
    reliable synchronization on the axon tunnel backend)."""
    import jax

    return jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x, tree
    )


class StepTimer:
    """Rolling wall-clock stats for a hot loop; emits JSONL records."""

    def __init__(self, path: Optional[str] = None, window: int = 50):
        self.path = path
        self.window = window
        self._times: list = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self._times.append(time.perf_counter() - self._t0)
        if len(self._times) > self.window:
            self._times.pop(0)

    def stats(self) -> Dict[str, float]:
        arr = np.asarray(self._times)
        if arr.size == 0:
            return {}
        return {
            "p50_ms": float(np.percentile(arr, 50) * 1e3),
            "p90_ms": float(np.percentile(arr, 90) * 1e3),
            "mean_ms": float(arr.mean() * 1e3),
        }

    def emit(self, extra: Optional[Dict] = None) -> None:
        if not self.path:
            return
        rec = {**self.stats(), **(extra or {})}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
