"""Test config: force CPU platform with 8 virtual devices so multi-chip
sharding logic is exercised without TPU hardware (the driver separately
dry-runs the multichip path).

Performance notes for this environment (single CPU core):
  * eager (op-by-op) execution pays a fresh XLA compile per primitive —
    tests must jit whole functions;
  * the persistent compilation cache makes repeat runs cheap;
  * 'rbg' PRNG compiles far faster than threefry for param init.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_default_prng_impl", "rbg")
jax.config.update("jax_compilation_cache_dir", "/tmp/aniportrait_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
