"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is exercised on CPU (no TPU pod in CI); bench.py and the
driver's graft entry run on the real chip.  Env vars must be set before the
first jax import, hence this conftest.
"""

import os

# Hard override: the machine-global default is JAX_PLATFORMS=axon (one real
# TPU via a tunnel); unit tests must run on the virtual CPU mesh.  The axon
# PJRT plugin also gets stripped from the import path - merely importing it
# can stall for minutes when the TPU tunnel is contended.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PYTHONPATH"] = ":".join(
    p for p in os.environ.get("PYTHONPATH", "").split(":") if "axon" not in p
)
import sys  # noqa: E402

sys.path[:] = [p for p in sys.path if "axon" not in p]
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# A pytest plugin (e.g. jaxtyping) may import jax before this conftest runs,
# in which case JAX_PLATFORMS was already read from the old environment; the
# config update below still works as long as no backend has been created.
import sys  # noqa: E402

if "jax" in sys.modules:
    import jax

    jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the slow tier's wall time is dominated by
# recompiling the same sharded train/eval steps (~7 distinct multi-minute
# CPU compiles in test_mesh.py alone).  The cache is keyed by HLO hash, so it
# is always safe; re-runs of the suite skip every unchanged compile.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/diffphore_tpu/jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
if "jax" in sys.modules:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
