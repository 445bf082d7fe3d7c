"""Persistent XLA compilation cache for the CLI entry points.

The first compile of the full Swin-L graphs takes minutes (tens of minutes
over a tunneled TPU); persisting compiled executables makes every later
process — another recipe phase, a rerun, an eval hook — start in seconds.
bench.py and the scripts/ benchmarks have always enabled this; the CLIs go
through here so a plain `python -m ...cli.train` gets the same treatment
(the reference has no equivalent concern: torch eager has no whole-program
compile step).
"""
from __future__ import annotations

import os


def enable_persistent_compilation_cache() -> str | None:
    """Idempotently point jax at an on-disk compilation cache.

    Resolution order: JAX_COMPILATION_CACHE_DIR (jax reads it natively —
    nothing to do), an already-set jax config value, `<repo>/.jax_cache`
    when the package sits in a writable checkout, else
    `~/.cache/on_device_image_captioning_tpu/jax`. Returns the directory
    used (None when delegated to the env var)."""
    import jax

    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return None
    if jax.config.jax_compilation_cache_dir:
        return jax.config.jax_compilation_cache_dir
    pkg_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    cand = os.path.join(pkg_root, ".jax_cache")
    if not (os.path.isdir(cand) or os.access(pkg_root, os.W_OK)):
        cand = os.path.join(
            os.path.expanduser("~"), ".cache", "on_device_image_captioning_tpu",
            "jax",
        )
    try:
        os.makedirs(cand, exist_ok=True)
    except OSError:
        return None
    jax.config.update("jax_compilation_cache_dir", cand)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cand
