"""enable_compile_cache must be distributed-safe: it may not initialize the
XLA backend (jax.distributed.initialize raises if any JAX backend call
happened first). Round-3 regression guard (VERDICT r3 W1): the helper used
``jax.default_backend()``, which initializes the backend as a side effect,
so calling it before ``initialize_distributed`` killed every multi-process
worker. These tests pin the contract in a fresh interpreter.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROBE = r"""
import os, sys
sys.path.insert(0, sys.argv[1])
os.environ.pop("MFN_NO_COMPILE_CACHE", None)
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
# the axon plugin overrides jax_platforms at import; pin it back the way
# every CPU entry point in this repo does (conftest, multiprocess workers)
jax.config.update("jax_platforms", "cpu")
from jax._src import xla_bridge
from maskflownet_tpu.compile_cache import enable_compile_cache

enable_compile_cache(sys.argv[1])
# the whole point: no backend may have been brought up by the helper
assert not getattr(xla_bridge, "_backends", None), \
    "enable_compile_cache initialized the XLA backend"
# and the cache config is actually in effect, pointed at the CPU subdir
assert jax.config.jax_compilation_cache_dir.endswith(".jax_cache"), \
    jax.config.jax_compilation_cache_dir
# once a backend IS up, the hint must track the live backend, not the env
del os.environ["JAX_PLATFORMS"]
jax.numpy.zeros(())                      # initializes the cpu backend
enable_compile_cache(sys.argv[1])
assert jax.config.jax_compilation_cache_dir.endswith(".jax_cache")
print("OK")
"""


def test_enable_compile_cache_leaves_backend_uninitialized():
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "MFN_NO_COMPILE_CACHE")}
    out = subprocess.run(
        [sys.executable, "-c", _PROBE, REPO], env=env,
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
    assert "OK" in out.stdout


def test_platform_hint_respects_env_without_backend():
    # in-process: the test session runs under JAX_PLATFORMS=cpu (conftest),
    # and a backend is already live here, so the hint must say "cpu" either
    # way -- this just exercises the non-subprocess path for coverage.
    from maskflownet_tpu.compile_cache import _platform_hint
    assert _platform_hint() == "cpu"
