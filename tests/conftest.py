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

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
