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

# force: the environment presets JAX_PLATFORMS=axon (the TPU tunnel);
# tests must run on the local CPU backend with virtual devices.
os.environ["JAX_PLATFORMS"] = "cpu"
# keep transformers from importing TensorFlow/Flax integrations: TF's
# threadpools deadlock on this 1-core host and its oneDNN init perturbs
# torch CPU numerics (breaks parity tolerances)
os.environ["USE_TF"] = "0"
os.environ["USE_TORCH"] = "1"
os.environ.setdefault("TRANSFORMERS_NO_ADVISORY_WARNINGS", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_default_prng_impl", "rbg")
# NOTE: XLA:CPU on this host lowers f32 matmuls to bf16 (oneDNN fast-math) —
# ~1e-1 abs error on a 256x256 matmul.  Numerical-parity tests scope
# `jax.default_matmul_precision("highest")` around their computations;
# shape/behaviour tests keep the fast default.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
