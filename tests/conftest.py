"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding is exercised without TPU hardware (SURVEY.md §4).

The environment may pin JAX to a TPU backend programmatically (overriding
``JAX_PLATFORMS``), so we force the platform through ``jax.config`` after
import, before any backend is touched by tests.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent compilation cache: the big jitted train steps compile in
# minutes on CPU; cache them across test runs (-> <repo>/.jax_cache).
from maskflownet_tpu.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()
