"""Checkpoint/resume for pipeline runs.

The reference has no real checkpointing (SURVEY section 5: only the
`.clp` re-run file and ad-hoc intermediate dirs).  Here every
expensive stage persists its result in a run directory, so a run can
be resumed after interruption and long runs can execute as a sequence
of bounded slices (`deadline` support): stage 1 (homology/MCL/HMM),
alignments, concatenation, the full tree, each jackknife support
replicate (individually, with per-replicate seeds so resumption is
deterministic), and each refinement round.
"""

from __future__ import annotations

import os
import pickle
import time


class CheckpointStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, key: str) -> str:
        return os.path.join(self.root, key + ".pkl")

    def has(self, key: str) -> bool:
        return os.path.exists(self._path(key))

    def load(self, key: str):
        with open(self._path(key), "rb") as fh:
            return pickle.load(fh)

    def save(self, key: str, obj) -> None:
        tmp = self._path(key) + ".tmp"
        with open(tmp, "wb") as fh:
            pickle.dump(obj, fh, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, self._path(key))

    def cached(self, key: str, fn):
        """Load `key` if present, else compute fn(), save, return."""
        if self.has(key):
            return self.load(key)
        obj = fn()
        self.save(key, obj)
        return obj


class Deadline:
    """Soft wall-clock budget: stages poll `expired` and stop cleanly,
    leaving the checkpoint store resumable."""

    def __init__(self, seconds: float | None):
        self.t_end = (time.time() + seconds) if seconds is not None \
            else None

    @property
    def expired(self) -> bool:
        return self.t_end is not None and time.time() >= self.t_end

    def near(self, margin: float) -> bool:
        """True within `margin` seconds of the deadline — stop
        submitting new device work so in-flight results can still be
        drained and checkpointed before a hard kill."""
        return self.t_end is not None and \
            time.time() >= self.t_end - margin

    def remaining(self) -> float:
        if self.t_end is None:
            return float("inf")
        return max(self.t_end - time.time(), 0.0)


class Incomplete(Exception):
    """Raised when the deadline expires mid-run; the checkpoint store
    holds everything computed so far."""

    def __init__(self, stage: str):
        super().__init__(f"deadline expired during {stage}; resumable")
        self.stage = stage
