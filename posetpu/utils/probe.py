"""Backend-liveness probe (SURVEY.md §5.3 failure detection).

On this environment's tunneled TPU a wedged relay makes the very first
backend call (`jax.devices()` / any jit) hang for many minutes with no
exception — round 3 lost its entire driver bench window to exactly this
(BENCH_r03.json rc=124; docs/round3_notes.md).  The wedge is inside the
runtime's C++ so no in-process watchdog can interrupt it; the only robust
probe is a THROWAWAY SUBPROCESS under a hard deadline.  bench.py and
`posetpu-train` both call :func:`probe_backend` before touching the device
so an outage becomes a fast structured diagnostic instead of a silent hang.
"""

from __future__ import annotations

import subprocess
import sys

# Trivial but real: compiles one program on the default backend and fetches
# the value back to host (a D2H fetch is the only honest sync on the tunnel
# — see bench.py TIMING METHODOLOGY).  POSETPU_PROBE_PLATFORM forces a
# platform via jax.config.update — the JAX_PLATFORMS env var is NOT honored
# on this machine (a sitecustomize hook pins it; tests/conftest.py
# documents that config.update is the only working lever).
_PROBE_SRC = """
import os
import jax
_p = os.environ.get("POSETPU_PROBE_PLATFORM")
if _p:
    jax.config.update("jax_platforms", _p)
import jax.numpy as jnp
x = jax.jit(lambda a: (a @ a).sum())(jnp.ones((256, 256), jnp.bfloat16))
print("posetpu-probe-ok", float(x), jax.default_backend())
"""


def probe_backend(deadline: float = 120.0) -> tuple[bool, str]:
    """Check that the default jax backend can compile + run one program.

    Runs in a subprocess (inheriting the environment, so JAX_PLATFORMS etc.
    apply) so a wedged backend cannot hang the caller past ``deadline``
    seconds.  Returns ``(ok, detail)``; ``detail`` is a one-line reason when
    ``ok`` is False.
    """
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC],
            capture_output=True,
            text=True,
            timeout=deadline,
        )
    except subprocess.TimeoutExpired:
        return False, (
            f"backend probe timed out after {deadline:.0f}s "
            "(device tunnel unreachable or wedged)"
        )
    except OSError as e:  # no python subprocess possible — report, don't hang
        return False, f"backend probe could not launch: {e}"
    if r.returncode != 0:
        # the actual error, not jax's traceback-filtering banner or the
        # "-----" separators around it
        noise = ("JAX has removed its internal frames", "JAX_TRACEBACK_FILTERING")
        lines = [
            ln.strip()
            for ln in (r.stderr or "").strip().splitlines()
            if ln.strip()
            and any(c.isalnum() for c in ln)
            and not any(n in ln for n in noise)
        ]
        err = [ln for ln in lines if "Error" in ln or "UNAVAILABLE" in ln]
        pick = (err or lines)[-1] if (err or lines) else (
            f"probe exit code {r.returncode}"
        )
        return False, pick[:400]
    return True, ""


def is_oom_error(e: BaseException) -> bool:
    """True iff ``e`` is a device out-of-memory class failure — the ONLY
    class where retrying with a smaller batch makes sense.  Backend-init
    failures (UNAVAILABLE on a dead tunnel) must NOT be retried: the retry
    hangs again and turns an outage into a silent multi-minute timeout
    (that was BENCH_r03's rc=124)."""
    s = str(e)
    return "RESOURCE_EXHAUSTED" in s or "out of memory" in s.lower()
