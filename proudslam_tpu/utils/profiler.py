"""Phase profiler (reference `src/utils/profile_util.py:5-35`).

Named tick/tok wall timers with device synchronization on ``tok`` (the JAX
analog of ``torch.cuda.synchronize``: ``block_until_ready`` on a sync
token), verbose printing or accumulation, plus an optional context manager
hooking ``jax.profiler`` trace capture for deep dives.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List, Optional


class Profiler:
    def __init__(self, verbose: bool = False):
        self.verbose = verbose
        self.enabled = False
        self._start: Dict[str, float] = {}
        self.records: Dict[str, List[float]] = defaultdict(list)

    def enable(self):
        self.enabled = True

    def _sync(self, token=None):
        if token is not None:
            import jax
            jax.block_until_ready(token)

    def tick(self, name: str, token=None):
        if not self.enabled:
            return
        self._sync(token)
        self._start[name] = time.perf_counter()

    def tok(self, name: str, token=None):
        if not self.enabled or name not in self._start:
            return
        self._sync(token)
        dt = time.perf_counter() - self._start.pop(name)
        if self.verbose:
            print(f"[profiler] {name}: {dt * 1000:.2f} ms")
        else:
            self.records[name].append(dt)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, vals in self.records.items():
            out[name] = {
                "count": len(vals),
                "mean_ms": 1000 * sum(vals) / max(len(vals), 1),
                "total_s": sum(vals),
            }
        return out

    @contextlib.contextmanager
    def trace(self, log_dir: str):
        """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
        import jax
        jax.profiler.start_trace(log_dir)
        try:
            yield
        finally:
            jax.profiler.stop_trace()
