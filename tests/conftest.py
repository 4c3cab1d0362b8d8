"""Test configuration: run the suite on a virtual 8-device CPU mesh.

The reference renderer's only machine-checked signal was fail-fast CUDA error
macros (reference cutil.h:24-52); it had no tests at all (SURVEY.md §4). This
suite is the testing pyramid the reference lacked. Sharding tests use JAX's
standard fake-backend trick: 8 virtual CPU devices, so `shard_map`/`pjit`
paths are exercised without TPU hardware.
"""
import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
# Persistent compile cache: XLA:CPU compiles of the bounce scan dominate the
# suite's wall clock; cache them across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/tpupt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
