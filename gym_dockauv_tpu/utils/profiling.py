"""Profiling & NaN-guard utilities.

The reference's observability here was offline cProfile + tuna
(README.md:78-88) and a per-step wall-clock in the info dict
(docking3d.py:205,407); SB3's VecCheckNan existed but was unused.  The
TPU-native equivalents: `trace()` wraps a block in a jax.profiler trace
(viewable in TensorBoard/XProf), `StepsPerSecond` is the steps/s meter the
learners feed (`time/fps` log key), and `checkify_step` compiles an env step
with jax.experimental.checkify NaN/div-by-zero guards that report the
failing operation instead of silently propagating NaNs.
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Profile a block: `with trace('logs/trace'): model.learn(...)`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepsPerSecond:
    """Sliding-window throughput meter."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.steps0 = 0
        self.last_rate = 0.0

    def update(self, total_steps: int) -> float:
        now = time.perf_counter()
        dt = now - self.t0
        if dt > 0:
            self.last_rate = (total_steps - self.steps0) / dt
        self.t0, self.steps0 = now, total_steps
        return self.last_rate


def checkify_step(core, autoreset: bool = False):
    """Jitted env step with float checks (NaN, inf, div-by-zero).

    Returns fn(state, action) -> (err, (new_state, result)); call
    `err.throw()` to raise with the location of the first bad op.
    """
    from jax.experimental import checkify

    step = core.step_autoreset if autoreset else core.step
    checked = checkify.checkify(step, errors=checkify.float_checks)
    return jax.jit(checked)
