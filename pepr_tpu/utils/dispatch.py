"""Bounded async dispatch queue for remote-device batch work.

Dispatch-everything-then-collect keeps the device busy, but an
unbounded queue of outstanding executions both holds all result
buffers alive and has stalled the remote (tunneled) TPU client in
practice.  `BoundedDispatch` keeps at most `window` executions in
flight: results are consumed in dispatch order as new work is added.
"""

from __future__ import annotations

from collections import deque
from typing import Callable


class BoundedDispatch:
    def __init__(self, window: int = 16):
        self.window = window
        self._queue: deque = deque()

    def submit(self, tag, result) -> list:
        """Add a dispatched result; returns list of (tag, result)
        pairs that were forced out of the window (already computed or
        blocking until they are)."""
        self._queue.append((tag, result))
        done = []
        while len(self._queue) > self.window:
            done.append(self._pop())
        return done

    def _pop(self):
        tag, result = self._queue.popleft()
        import jax

        def materialize(x):
            import numpy as np
            return np.asarray(x)

        return tag, jax.tree_util.tree_map(materialize, result)

    def drain(self) -> list:
        out = []
        while self._queue:
            out.append(self._pop())
        return out
