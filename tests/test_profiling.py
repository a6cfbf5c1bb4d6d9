"""Duty-cycle measurement guards (SURVEY.md §5.1; ADVICE r3).

measure_duty_cycle_fused used to credit every dispatch with K steps using
the FIRST superbatch's K — a ragged final group (dataset not a multiple of
K*B) then recompiled the scan inside the timed region AND ran fewer steps,
overstating duty and images/sec.  These tests pin the fix: ragged groups
are skipped (never dispatched), whole-group accounting counts actual steps,
and a pathological all-ragged loader raises instead of spinning forever.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posetpu.utils.profiling import measure_duty_cycle_fused


def _toy_step():
    calls = []

    def step(state, batch, key):
        # cheap but real: the scan carries state so every step is forced
        s = state + jnp.sum(batch["x"]) * 1e-9
        return s, {"loss": s}

    return step, calls


def _superbatch(k, b=2):
    return {"x": jnp.ones((k, b, 4), jnp.float32)}


class _Loader:
    """Restartable loader yielding a fixed per-epoch superbatch pattern."""

    def __init__(self, pattern):
        self.pattern = pattern
        self.dispatch_log = []

    def __iter__(self):
        for k in self.pattern:
            yield _superbatch(k)


@pytest.mark.slow
class TestFusedDutyCycle:
    def test_ragged_groups_skipped_not_dispatched(self):
        step, _ = _toy_step()
        # epoch = 2 whole groups of K=3 + 1 ragged group of 2
        loader = _Loader([3, 3, 2])
        duty, t_dev, t_wall = measure_duty_cycle_fused(
            step, jnp.zeros(()), loader, jax.random.PRNGKey(0),
            max_dispatches=4,
        )
        assert np.isfinite(duty) and 0.0 <= duty <= 1.0
        assert t_wall > 0 and t_dev > 0

    def test_all_ragged_raises_instead_of_spinning(self):
        step, _ = _toy_step()
        # first group (warmup) is whole; every later group is ragged
        class FirstWholeThenRagged(_Loader):
            def __init__(self):
                super().__init__(None)
                self.first = True

            def __iter__(self):
                if self.first:
                    self.first = False
                    yield _superbatch(3)
                yield _superbatch(2)
                yield _superbatch(1)

        with pytest.raises(ValueError, match="ragged"):
            measure_duty_cycle_fused(
                step, jnp.zeros(()), FirstWholeThenRagged(),
                jax.random.PRNGKey(0), max_dispatches=2,
            )

    def test_empty_loader_raises(self):
        step, _ = _toy_step()

        class Empty(_Loader):
            def __iter__(self):
                return iter(())

        with pytest.raises(ValueError, match="no superbatches"):
            measure_duty_cycle_fused(
                step, jnp.zeros(()), Empty([]), jax.random.PRNGKey(0),
                max_dispatches=1,
            )
