"""Test configuration: force pure-CPU JAX with 8 virtual devices.

The container pins JAX_PLATFORMS=axon and an axon sitecustomize imports jax
at interpreter startup, so the env var is already latched by the time
conftest runs; jax.config.update still works as long as no computation has
happened. Tests run on local CPU in f64 with a virtual 8-device mesh
(SURVEY.md §4 multi-host simulation pattern).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compile cache: the suite re-traces many identical programs
# (and the CLI test's subprocess recompiles everything) — cache across runs
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compilation_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
try:  # CPU executables are only cached when xla caches are enabled
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
except Exception:
    pass
