"""Test env: force JAX onto CPU with 8 virtual devices so shard_map
data-parallel tests run without TPU hardware (SURVEY.md §4.4).

NOTE (environment quirk): this machine pins ``JAX_PLATFORMS=axon`` through a
sitecustomize hook, so mutating os.environ here is NOT enough — the working
lever is ``jax.config.update`` before any computation.  Running tests on the
real chip is both slow (per-process TPU client/tunnel init) and numerically
different (TPU matmuls default to bf16), so CPU is mandatory for parity tests.
"""

import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
