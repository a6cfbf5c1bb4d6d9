"""Backend-liveness probe + bench fail-fast behavior (SURVEY.md §5.3).

Round 3 lost its driver bench window to a wedged device tunnel: the first
backend call hung >6 min with no exception and bench.py's catch-all retried
into a second hang (BENCH_r03.json rc=124).  These tests pin the fix: the
probe bounds a dead backend to its deadline, OOM-only retry classification,
and the CLIs emitting structured fast diagnostics instead of hanging.
"""

import json
import os
import subprocess
import sys

import pytest

from posetpu.utils import probe as probe_mod
from posetpu.utils.probe import is_oom_error, probe_backend

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env(**extra):
    # NOTE: JAX_PLATFORMS in the env is pinned/ignored on this machine
    # (conftest.py); POSETPU_PROBE_PLATFORM steers the probe subprocess via
    # jax.config.update, and bench.py --cpu does the same in-process.
    env = dict(os.environ)
    env.pop("POSETPU_SKIP_PROBE", None)
    env.update(extra)
    return env


class TestProbeBackend:
    @pytest.mark.slow
    def test_ok_on_cpu(self, monkeypatch):
        monkeypatch.setenv("POSETPU_PROBE_PLATFORM", "cpu")
        ok, detail = probe_backend(deadline=180.0)
        assert ok, detail
        assert detail == ""

    def test_wedged_backend_bounded_by_deadline(self, monkeypatch):
        # A wedged tunnel hangs inside the runtime: simulate with a sleep
        # that far exceeds the deadline.  The probe must return (not hang)
        # right at the deadline with a one-line reason.
        monkeypatch.setattr(probe_mod, "_PROBE_SRC", "import time; time.sleep(60)")
        import time

        t0 = time.perf_counter()
        ok, detail = probe_backend(deadline=1.5)
        assert time.perf_counter() - t0 < 10
        assert not ok
        assert "timed out" in detail

    def test_failing_backend_reports_stderr_tail(self, monkeypatch):
        monkeypatch.setattr(
            probe_mod,
            "_PROBE_SRC",
            "raise RuntimeError('UNAVAILABLE: tunnel relay dead')",
        )
        ok, detail = probe_backend(deadline=30.0)
        assert not ok
        assert "UNAVAILABLE" in detail

    def test_silent_nonzero_exit_reports_code(self, monkeypatch):
        monkeypatch.setattr(
            probe_mod, "_PROBE_SRC", "import sys; sys.exit(7)"
        )
        ok, detail = probe_backend(deadline=30.0)
        assert not ok
        assert "7" in detail


class TestFetchWatchdog:
    """bench.watchdog: a MID-RUN wedge (probe passed, then a timed fetch
    hangs in runtime C++) must become the structured tpu_unavailable line
    + exit 3, never an rc=124 driver timeout (VERDICT r4 item 5)."""

    def test_wedged_fetch_emits_structured_line(self):
        # the wedge hangs where no exception reaches Python — a sleep in
        # the guarded region stands in for it; os._exit fires from the
        # watchdog's daemon timer so this must run in a subprocess
        r = subprocess.run(
            [
                sys.executable,
                "-c",
                "import bench, time\n"
                "with bench.watchdog(deadline=1.0, label='fake fetch'):\n"
                "    time.sleep(30)\n"
                "print('UNREACHED')\n",
            ],
            capture_output=True,
            text=True,
            timeout=20,
            cwd=REPO,
        )
        assert r.returncode == 3, (r.stdout, r.stderr)
        assert "UNREACHED" not in r.stdout
        line = json.loads(r.stdout.strip().splitlines()[-1])
        assert line["error"] == "tpu_unavailable"
        assert line["value"] is None
        assert "mid-run wedge" in line["detail"]
        assert "fake fetch" in line["detail"]

    def test_fast_fetch_passes_through(self):
        # normal completion: the timer is cancelled, nothing printed,
        # exceptions propagate unchanged
        import bench

        with bench.watchdog(deadline=30.0, label="ok"):
            pass
        with pytest.raises(ValueError):
            with bench.watchdog(deadline=30.0, label="err"):
                raise ValueError("propagates")


class TestOomClassification:
    def test_oom_errors_retryable(self):
        assert is_oom_error(RuntimeError("RESOURCE_EXHAUSTED: 12.3GiB > 8GiB"))
        assert is_oom_error(RuntimeError("Out of memory allocating buffer"))

    def test_outage_errors_not_retryable(self):
        # the exact round-3 failure string must NOT be classified retryable
        assert not is_oom_error(
            RuntimeError("Unable to initialize backend 'axon': UNAVAILABLE")
        )
        assert not is_oom_error(RuntimeError("DEADLINE_EXCEEDED"))


@pytest.mark.slow
class TestCliFailFast:
    """End-to-end: dead backend => structured diagnostic in well under 3 min.

    `POSETPU_PROBE_PLATFORM=no_such_backend` makes the probe subprocess fail
    fast at its first jit (unknown backend), standing in for the dead tunnel
    without needing one.
    """

    def test_bench_emits_structured_error_line(self):
        r = subprocess.run(
            [sys.executable, "bench.py", "--quick", "--probe-deadline", "60"],
            capture_output=True,
            text=True,
            timeout=120,
            cwd=REPO,
            env=_env(POSETPU_PROBE_PLATFORM="no_such_backend"),
        )
        assert r.returncode == 3, r.stderr
        line = json.loads(r.stdout.strip().splitlines()[-1])
        assert line["error"] == "tpu_unavailable"
        assert line["value"] is None
        assert line["vs_baseline"] is None
        assert line["metric"]
        assert line["detail"]

    def test_train_cli_exits_with_diagnostic(self):
        r = subprocess.run(
            [
                sys.executable,
                "-c",
                "from posetpu.train.cli import main; raise SystemExit("
                "main(['--config', 'hg2_mpii_mini', '--probe-deadline', '60']))",
            ],
            capture_output=True,
            text=True,
            timeout=120,
            cwd=REPO,
            env=_env(POSETPU_PROBE_PLATFORM="no_such_backend"),
        )
        assert r.returncode == 2, (r.stdout, r.stderr)
        assert "device unreachable" in r.stdout

    def test_bench_probe_passes_on_live_cpu_backend(self):
        # with a live backend the probe is transparent: --quick completes
        # and prints the normal metric line
        r = subprocess.run(
            [
                sys.executable, "bench.py", "--quick", "--cpu",
                "--probe-deadline", "120",
            ],
            capture_output=True,
            text=True,
            timeout=360,
            cwd=REPO,
            env=_env(),
        )
        assert r.returncode == 0, r.stderr
        line = json.loads(r.stdout.strip().splitlines()[-1])
        assert "error" not in line
        assert line["value"] > 0
