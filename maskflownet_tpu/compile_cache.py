"""Persistent XLA compilation cache setup, shared by every entry point.

The chairs-stage train step takes minutes to compile on a CPU mesh or over
a tunneled TPU link; caching compiles across invocations makes benches,
tests, the driver entry points and subprocess test workers fast on repeat
runs. One helper so the directory layout and flags cannot drift between
call sites (they had, pre-round-3): CPU compiles go to ``.jax_cache/``
(shared with tests/conftest.py), accelerator compiles to
``.jax_cache_tpu/``, both under the repo root and gitignored.

Set ``MFN_NO_COMPILE_CACHE=1`` to disable (cold-compile measurements, or
to bypass a stale/corrupt cache dir).
"""

from __future__ import annotations

import os


def _platform_hint() -> str:
    """Best-effort platform name WITHOUT initializing the XLA backend.

    ``jax.default_backend()`` initializes the backend as a side effect,
    which breaks any later ``jax.distributed.initialize`` ("must be called
    before any JAX calls") -- the round-3 regression that killed the
    2-process real-model test. So: only query the live backend if one is
    already up; otherwise trust the ``jax_platforms`` config / env override
    (every CPU-mesh entry point in this repo sets one), defaulting to the
    accelerator subdirectory.
    """
    import jax
    from jax._src import xla_bridge

    if getattr(xla_bridge, "_backends", None):
        return jax.default_backend()          # already initialized: exact
    plats = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS") or ""
    return plats.split(",")[0].strip().lower()


def enable_compile_cache(root: str | None = None) -> None:
    """Route XLA compiles through the repo-local persistent cache.

    Safe to call at any point after importing jax -- including *before*
    ``jax.distributed.initialize`` (it never initializes the backend; see
    ``_platform_hint``). Call after any ``jax_platforms`` override so the
    platform hint picks the right subdirectory.
    """
    if os.environ.get("MFN_NO_COMPILE_CACHE"):
        return
    import jax

    if root is None:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sub = ".jax_cache" if _platform_hint() == "cpu" else ".jax_cache_tpu"
    jax.config.update("jax_compilation_cache_dir", os.path.join(root, sub))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
