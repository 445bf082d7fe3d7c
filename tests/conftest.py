"""Test harness: force a 4-device virtual CPU mesh so multi-chip sharding tests
run without TPU hardware (mirrors how the reference fakes multi-process sharding
on one host — reference data/vizwiz_dataloader.py:318-360). 4 devices (not 8)
keeps SPMD-partitioned compiles affordable on this 1-core box; the driver's own
dryrun_multichip(8) check self-bootstraps its 8-device subprocess regardless."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force CPU even when a TPU tunnel is present
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4"
    ).strip()

# The environment's 'axon' TPU plugin overrides the JAX_PLATFORMS env var at import
# time, so pin the platform through the config API before any backend initializes
# (tunnel init takes minutes and would also break numeric parity via TPU matmul
# precision defaults).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the suite is compile-dominated on this 1-core
# box; repeat runs (CI, local iteration) skip most of the wall time
import pathlib as _pathlib  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    str(_pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pathlib
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
REFERENCE = pathlib.Path("/root/reference")
sys.path.insert(0, str(REPO))


def reference_available() -> bool:
    return REFERENCE.exists()


@pytest.fixture(scope="session")
def reference_path():
    """Path to the read-only reference repo; parity tests compare numerics against
    the reference model executed on CPU with shared random weights."""
    if not reference_available():
        pytest.skip("reference repo not mounted")
    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))
    return REFERENCE
