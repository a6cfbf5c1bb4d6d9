"""Persistent XLA compilation cache knob (posetpu/utils/xla_cache.py)."""

import os

import pytest

from posetpu.utils.xla_cache import enable_persistent_cache


@pytest.fixture(autouse=True)
def _reset_cache_config():
    # the knob mutates process-global jax config; restore it so later tests
    # never write cache entries into a deleted tmp_path
    import jax

    before = jax.config.jax_compilation_cache_dir
    yield
    jax.config.update("jax_compilation_cache_dir", before)


class TestPersistentCache:
    def test_opt_out(self, monkeypatch):
        monkeypatch.setenv("POSETPU_XLA_CACHE", "0")
        assert enable_persistent_cache() is None

    def test_enables_and_creates_dir(self, tmp_path, monkeypatch):
        import jax

        monkeypatch.delenv("POSETPU_XLA_CACHE", raising=False)
        d = str(tmp_path / "xla_cache")
        got = enable_persistent_cache(d)
        assert got == d and os.path.isdir(d)
        assert jax.config.jax_compilation_cache_dir == d
        # threshold keeps tiny programs out of the disk round-trip
        assert jax.config.jax_persistent_cache_min_compile_time_secs == 10.0

    def test_env_dir_override(self, tmp_path, monkeypatch):
        monkeypatch.delenv("POSETPU_XLA_CACHE", raising=False)
        d = str(tmp_path / "env_dir")
        monkeypatch.setenv("POSETPU_XLA_CACHE_DIR", d)
        assert enable_persistent_cache() == d

    def test_round_trip_cache_hit(self, tmp_path, monkeypatch):
        # drop the persistence threshold so a tiny program lands on disk,
        # and verify a fresh entry appears (cache actually functional on
        # this jax build, not just configured)
        import jax
        import jax.numpy as jnp

        monkeypatch.delenv("POSETPU_XLA_CACHE", raising=False)
        d = str(tmp_path / "hit")
        before_size = jax.config.jax_persistent_cache_min_entry_size_bytes
        enable_persistent_cache(d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        try:
            f = jax.jit(lambda x: (x * 2.0 + 1.0).sum())
            float(f(jnp.ones((128, 128))))
            assert len(os.listdir(d)) >= 1
        finally:
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 10.0
            )
            jax.config.update(
                "jax_persistent_cache_min_entry_size_bytes", before_size
            )
