"""Tests for the CLI kernel-impl resolution and the persistent compile cache
helper (both new in round 3; every CLI entry point routes through them)."""
import jax

from on_device_image_captioning_tpu.config import resolve_kernel_impls
from on_device_image_captioning_tpu.utils.compile_cache import (
    enable_persistent_compilation_cache,
)


def test_resolve_auto_on_cpu_is_xla():
    # the suite pins the cpu backend (conftest), so 'auto' must resolve to
    # the reference-exact XLA impls rather than TPU-only Pallas kernels
    assert jax.default_backend() == "cpu"
    assert resolve_kernel_impls("auto", "auto") == ("xla", "xla")


def test_resolve_explicit_choices_pass_through():
    assert resolve_kernel_impls("fused", "pallas") == ("fused", "pallas")
    assert resolve_kernel_impls("xla", "pallas") == ("xla", "pallas")
    # mixed: only the 'auto' side is resolved
    att, dyn = resolve_kernel_impls("fused", "auto")
    assert att == "fused" and dyn == "xla"


def test_compile_cache_respects_already_set_config(monkeypatch):
    # conftest already pointed jax at <repo>/.jax_cache; the helper must not
    # clobber an explicit setting and reports the directory in use.
    # (hermetic vs the caller's shell: the helper checks the env var first,
    # so an exported JAX_COMPILATION_CACHE_DIR would shadow the config path)
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    before = jax.config.jax_compilation_cache_dir
    assert before  # set by conftest
    assert enable_persistent_compilation_cache() == before
    assert jax.config.jax_compilation_cache_dir == before


def test_compile_cache_defers_to_env_var(monkeypatch):
    # with JAX_COMPILATION_CACHE_DIR exported, jax reads it natively and the
    # helper must do nothing (returns None, config untouched)
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", "/tmp/some_cache")
    before = jax.config.jax_compilation_cache_dir
    assert enable_persistent_compilation_cache() is None
    assert jax.config.jax_compilation_cache_dir == before
