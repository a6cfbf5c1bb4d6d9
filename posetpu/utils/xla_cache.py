"""Persistent XLA compilation cache (SURVEY.md §7 hard-part: compile cost).

The fused joint monolith costs ~10 minutes of XLA:TPU compile per process
(BASELINE.md re-adjudication section; config 4 measured 542 s) and even the
baseline 8-stack step ~2 min — paid again by EVERY fresh process on the
same program.  jax's persistent compilation cache amortizes that to one
compile per (program, toolchain) per machine: bench.py, posetpu-train, and
tools/evaluate.py all enable it by default so a re-run (or the driver's
bench after a builder warm-up) skips straight to execution.

Opt out with POSETPU_XLA_CACHE=0 or point POSETPU_XLA_CACHE_DIR elsewhere.
"""

from __future__ import annotations

import os


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Enable jax's on-disk compilation cache.  Returns the directory used,
    or None when disabled via POSETPU_XLA_CACHE=0.

    Must run before the first compilation (safe any time after import).
    Entries below 10 s of compile time are not persisted — tiny programs
    recompile faster than disk round-trips on this 1-core host.
    """
    if os.environ.get("POSETPU_XLA_CACHE") == "0":
        return None
    import jax

    cache_dir = (
        cache_dir
        or os.environ.get("POSETPU_XLA_CACHE_DIR")
        or os.path.join(
            os.path.expanduser("~"), ".cache", "posetpu", "xla"
        )
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    return cache_dir
