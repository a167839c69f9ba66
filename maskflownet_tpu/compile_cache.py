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


def enable_compile_cache(root: str | None = None) -> None:
    """Route XLA compiles through the repo-local persistent cache.

    Call after importing jax (and after any ``jax_platforms`` override, so
    the backend query picks the right subdirectory).
    """
    if os.environ.get("MFN_NO_COMPILE_CACHE"):
        return
    import jax

    if root is None:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sub = ".jax_cache" if jax.default_backend() == "cpu" else ".jax_cache_tpu"
    jax.config.update("jax_compilation_cache_dir", os.path.join(root, sub))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
