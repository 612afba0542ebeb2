"""Common JAX runtime setup for entry points."""

from __future__ import annotations


def setup(cache_dir: str = "/root/repo/.jax_cache", prng: str = "rbg"):
    """Enable the persistent compilation cache + cheap PRNG.
    Call before building models."""
    import jax

    jax.config.update("jax_default_prng_impl", prng)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    except Exception:
        pass
