"""Profiling + duty-cycle measurement (SURVEY.md §5.1: first-class because
of the >=95% TPU duty-cycle target in BASELINE.json:5).

Two tools:
  * :func:`trace` — context manager around ``jax.profiler`` writing a
    TensorBoard-loadable trace directory.
  * :func:`measure_duty_cycle` — estimates the device-busy fraction of a
    steady-state training loop: device-only step time (K steps fused into
    one program, batch resident on device, real value fetch) over pipelined
    wall time per step (real loader + async dispatch).  duty = t_dev/t_wall.
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


def _metric_scalar(m):
    """One scalar leaf of the step metrics — fetching its VALUE to host is
    the only reliable synchronization on this environment's tunneled TPU
    (jax.block_until_ready has been observed to return before the device
    finishes; see BASELINE.md round-2 timing methodology)."""
    if isinstance(m, dict) and "loss" in m:
        return m["loss"]
    return jax.tree.leaves(m)[0]


def time_device_step(step_fn, state, batch, key, steps=10, warmup=1):
    """Average per-step DEVICE time: ``steps`` train steps fused into ONE
    ``lax.scan`` program (single dispatch), ended by a real device->host
    value fetch.  Per-dispatch timing on this 1-core host pays ~100 ms of
    relay overhead per step and block_until_ready cannot be trusted, so
    the fused-program form is the honest device-only number."""
    batch = jax.device_put(batch)

    @jax.jit
    def run_k(state, batch, key):
        def body(carry, _):
            st, k = carry
            k, sub = jax.random.split(k)
            st, m = step_fn(st, batch, sub)
            return (st, k), _metric_scalar(m)

        (state, _), ms = jax.lax.scan(body, (state, key), None, length=steps)
        return state, ms[-1]

    for w in range(warmup):
        state, m = run_k(state, batch, jax.random.fold_in(key, w))
        float(m)
    t0 = time.perf_counter()
    state, m = run_k(state, batch, jax.random.fold_in(key, 1 + warmup))
    float(m)
    return (time.perf_counter() - t0) / steps, state


def measure_duty_cycle(step_fn, state, loader, key, max_steps=30):
    """Duty cycle of the real pipeline: loader -> H2D -> step, dispatched
    asynchronously.  Returns (duty, t_device, t_wall)."""
    first = next(iter(loader))
    t_dev, state = time_device_step(step_fn, state, first, key)
    # Warm the PER-DISPATCH step program too — it is a different program
    # from time_device_step's fused-K scan, and its ~2 min XLA compile
    # must not land inside the timed loop (it did before this warmup:
    # wall_step read ~20 s/step, all of it compile).
    state, m = step_fn(state, first, jax.random.fold_in(key, 0x7FFFFFFF))
    float(_metric_scalar(m))

    n = 0
    t0 = time.perf_counter()
    m = None
    for batch in loader:
        if n >= max_steps:
            break
        key, sub = jax.random.split(key)
        state, m = step_fn(state, batch, sub)
        n += 1
    if m is None:
        raise ValueError(
            "loader yielded no batches after the two warmup steps — pass a "
            "restartable loader (not an exhausted one-shot iterator)"
        )
    float(_metric_scalar(m))  # real sync: the state chain forces every step
    t_wall = (time.perf_counter() - t0) / n
    return min(t_dev / t_wall, 1.0), t_dev, t_wall


def measure_duty_cycle_fused(step_fn, state, loader, key, max_dispatches=8):
    """Duty cycle of the PRODUCTION K-steps-per-dispatch path
    (``Experiment(steps_per_dispatch=K)``): ``loader`` must be configured
    with ``group=K`` so it yields (K, B, ...) superbatches; each dispatch
    is one ``fuse_steps`` lax.scan program running K optimizer updates.
    Device-only reference time comes from :func:`time_device_step` on one
    constituent batch.  Returns (duty, t_device_per_step, t_wall_per_step).
    """
    from posetpu.train.step import fuse_steps

    def endless():
        while True:
            got = False
            for b in loader:
                got = True
                yield b
            if not got:
                raise ValueError(
                    "loader yielded no superbatches — an exhausted one-shot "
                    "iterator would spin here forever"
                )

    it = endless()
    first = next(it)
    k = jax.tree.leaves(first)[0].shape[0]
    single = jax.tree.map(lambda x: x[0], first)
    t_dev, state = time_device_step(step_fn, state, single, key)

    fused = jax.jit(fuse_steps(step_fn))
    state, key, m = fused(state, first, key)  # compile + warm
    float(_metric_scalar(m)[-1])

    n = 0
    steps = 0
    skipped = 0
    t0 = time.perf_counter()
    m = None
    while n < max_dispatches:
        b = next(it)
        bk = jax.tree.leaves(b)[0].shape[0]
        if bk != k:
            skipped += 1
            if skipped > 8 * max_dispatches:
                raise ValueError(
                    f"loader keeps yielding ragged superbatches (leading dim "
                    f"!= {k}); configure group=K with a dataset sized to "
                    "whole K*B groups"
                )
            # Ragged final group (dataset not a multiple of K*B): a second
            # scan length would recompile INSIDE the timed region and run
            # fewer than k steps — crediting it with k overstated both duty
            # and images/sec (ADVICE r3).  Skip it; its decode cost stays in
            # the wall time, which errs conservative (lower duty).
            continue
        state, key, m = fused(state, b, key)
        n += 1
        steps += bk
    float(_metric_scalar(m)[-1])  # the state chain forces every dispatch
    t_wall = (time.perf_counter() - t0) / max(steps, 1)
    return min(t_dev / t_wall, 1.0), t_dev, t_wall
