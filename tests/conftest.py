"""Test config: force the LOCAL CPU backend with 8 virtual devices so
multi-chip sharding logic is exercised without TPU hardware.

Environment landmine: this image's sitecustomize registers the 'axon' TPU
PJRT plugin and EAGERLY initialises it in every interpreter, with XLA
compiles routed through a remote-compile HTTP service (slow, size-limited).
Setting JAX_PLATFORMS before importing jax is NOT enough — the backend is
already live.  The reliable sequence is: set the config, then clear the
initialised backends so jax re-resolves to CPU.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# keep transformers from importing TensorFlow integrations (slow, thread-heavy)
os.environ["USE_TF"] = "0"
os.environ["USE_TORCH"] = "1"

import jax

jax.config.update("jax_platforms", "cpu")
try:
    import jax.extend.backend as _jeb

    _jeb.clear_backends()
except Exception:
    pass
assert jax.devices()[0].platform == "cpu", (
    "tests must run on the CPU backend; axon plugin still active: "
    f"{jax.devices()}"
)

jax.config.update("jax_default_prng_impl", "rbg")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
