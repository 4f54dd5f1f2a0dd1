"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Real TPU hardware is single-chip in CI; multi-chip sharding is validated on
virtual CPU devices exactly as the driver's ``dryrun_multichip`` does.

Note: the axon TPU plugin force-appends itself to ``jax_platforms`` even when
``JAX_PLATFORMS=cpu`` is exported, so the platform must be pinned via
``jax.config`` *after* importing jax.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# single-core CI box: persistent compilation cache is essential
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
