"""Optimization-loop checkpoint/resume + partial-render recovery.

The reference has no checkpointing (SURVEY §5: only a SIGHUP handler that
develops the partial film mid-render, mitsuba.cpp:93-96,141-145); for
production inverse-rendering runs this module provides:

  * `OptimizationCheckpointer` — orbax-backed save/restore of
    (step, params, opt_state) with retention, so a killed optimization
    resumes exactly (the elastic-recovery analog);
  * `install_partial_develop` — SIGHUP/SIGUSR1 handler that writes the
    latest developed frame to disk mid-run (the reference's behavior).
"""
from __future__ import annotations

import os
import signal
from typing import Any, Callable

import jax
import numpy as np


class OptimizationCheckpointer:
    """Save/restore inverse-rendering state (step, params pytree,
    optimizer state pytree)."""

    def __init__(self, directory: str, keep: int = 3):
        import orbax.checkpoint as ocp
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=keep))

    def save(self, step: int, params: Any, opt_state: Any) -> None:
        import orbax.checkpoint as ocp
        self._mgr.save(step, args=ocp.args.StandardSave(
            {"params": params, "opt_state": opt_state}))
        self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, params_like: Any, opt_state_like: Any,
                step: int | None = None):
        """Returns (step, params, opt_state); *_like provide the pytree
        structure/shapes (e.g. freshly initialized values)."""
        import orbax.checkpoint as ocp
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        out = self._mgr.restore(step, args=ocp.args.StandardRestore(
            {"params": params_like, "opt_state": opt_state_like}))
        return step, out["params"], out["opt_state"]

    def close(self):
        self._mgr.close()


def install_partial_develop(get_frame: Callable[[], np.ndarray],
                            path: str, signals=(signal.SIGHUP,
                                                signal.SIGUSR1)) -> None:
    """SIGHUP-develops-the-partial-film (mitsuba.cpp:93-96 semantics):
    `get_frame` returns the current (h, w, 3) image; on signal it is
    written to `path`."""
    def handler(signum, frame):
        try:
            from .io.image import write_image
            img = np.asarray(get_frame())
            write_image(path, img)
            print(f"[signal {signum}] partial render written to {path}",
                  flush=True)
        except Exception as e:       # never die inside a signal handler
            print(f"[signal {signum}] partial develop failed: {e}",
                  flush=True)

    for s in signals:
        signal.signal(s, handler)
