"""Test configuration: force the CPU backend with 8 virtual devices.

This is the standard JAX recipe for testing pjit/shard_map sharding logic
without TPU pods (SURVEY.md §4).  Note: this machine's sitecustomize
registers a remote-TPU ("axon") backend on interpreter start and pins
JAX_PLATFORMS=axon, so we must override through jax.config *before* any
backend is initialized — plain env vars in conftest are too late.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
