"""Persistent XLA compilation cache wiring (`utils/compile_cache.py`).

The cache turns 40–230 s cold compiles into millisecond loads across
processes; these tests pin the env-var contract and that enabling it
actually persists executables on the CPU backend.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avex_tpu.utils.compile_cache import enable_compilation_cache


@pytest.fixture()
def _restore_cache_config():
    yield
    jax.config.update("jax_compilation_cache_dir", None)


def test_disabled_by_env(monkeypatch, tmp_path):
    monkeypatch.setenv("AVEX_COMPILE_CACHE", "0")
    assert enable_compilation_cache(str(tmp_path)) is None
    assert not list(tmp_path.iterdir())


def test_env_dir_override(monkeypatch, tmp_path, _restore_cache_config):
    monkeypatch.setenv("AVEX_COMPILE_CACHE", "1")  # conftest disables globally
    monkeypatch.setenv("AVEX_COMPILE_CACHE_DIR", str(tmp_path / "xla"))
    assert enable_compilation_cache() == str(tmp_path / "xla")
    assert (tmp_path / "xla").is_dir()


def test_compiles_persist_to_disk(monkeypatch, tmp_path, _restore_cache_config):
    monkeypatch.setenv("AVEX_COMPILE_CACHE", "1")  # conftest disables globally
    cache_dir = enable_compilation_cache(str(tmp_path / "cache"))
    assert cache_dir is not None

    @jax.jit
    def fn(x):
        return jnp.tanh(x @ x.T) * 3.17

    # a shape unlikely to be compiled elsewhere in the suite
    fn(jnp.asarray(np.ones((7, 93), np.float32))).block_until_ready()
    entries = list((tmp_path / "cache").iterdir())
    assert entries, "no cache entry written for a fresh program"
