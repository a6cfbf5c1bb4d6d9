"""Profiling + duty-cycle measurement (SURVEY.md §5.1: first-class because
of the >=95% TPU duty-cycle target in BASELINE.json:5).

Two tools:
  * :func:`trace` — context manager around ``jax.profiler`` writing a
    TensorBoard-loadable trace directory.
  * :func:`measure_duty_cycle` — estimates the device-busy fraction of a
    steady-state training loop: device-only step time (every step blocked,
    batch resident on device) over pipelined wall time per step (real
    loader + async dispatch).  duty = t_device / t_wall.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir):
    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_device_step(step_fn, state, batch, key, steps=10, warmup=2):
    """Average per-step device time with the batch resident on device and
    every step blocked (no input pipeline, no overlap)."""
    batch = jax.device_put(batch)
    for _ in range(warmup):
        key, sub = jax.random.split(key)
        state, m = step_fn(state, batch, sub)
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    for _ in range(steps):
        key, sub = jax.random.split(key)
        state, m = step_fn(state, batch, sub)
    jax.block_until_ready(m)
    return (time.perf_counter() - t0) / steps, state


def measure_duty_cycle(step_fn, state, loader, key, max_steps=30):
    """Duty cycle of the real pipeline: loader -> H2D -> step, dispatched
    asynchronously.  Returns (duty, t_device, t_wall)."""
    first = next(iter(loader))
    t_dev, state = time_device_step(step_fn, state, first, key)

    n = 0
    t0 = time.perf_counter()
    m = None
    for batch in loader:
        if n >= max_steps:
            break
        key, sub = jax.random.split(key)
        state, m = step_fn(state, batch, sub)
        n += 1
    jax.block_until_ready(m)
    t_wall = (time.perf_counter() - t0) / max(n, 1)
    return min(t_dev / t_wall, 1.0), t_dev, t_wall
