"""Test configuration: force a virtual 8-device CPU mesh so sharding tests run anywhere.

Mirrors the reference's approach of CPU-runnable end-to-end checks (SURVEY.md §4) while
adding the multi-device simulation the reference never had.

Note: this environment's sitecustomize may pre-register a TPU backend and force
`jax_platforms`; we override back to CPU via jax.config (env vars alone are not
enough once the plugin registered itself).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

# Persistent compilation cache: the suite compiles ~hundreds of CPU programs
# per run; cache hits make reruns minutes faster AND sidestep a rare XLA:CPU
# compiler segfault seen only after very long single-process compile sessions.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_cpu_tests")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Release compiled executables between test modules.

    A deterministic XLA:CPU compiler segfault fires after ~150 tests'
    worth of live compiled programs accumulate in one process (reproduced
    at the same position across runs; each crashing test passes in
    isolation). Dropping executables at module boundaries keeps the
    process under the threshold; the persistent compilation cache above
    makes the re-loads cheap."""
    yield
    jax.clear_caches()
