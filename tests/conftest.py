"""Test configuration: force a virtual 8-device CPU mesh so sharding tests run anywhere.

Mirrors the reference's (absent) hermetic test setup; see SURVEY.md §4 for why we add
CPU-backend multi-device tests that the reference lacks.
"""
import os

# Must be set before jax is imported anywhere. The environment may preset
# JAX_PLATFORMS=axon (a TPU tunnel); tests must run hermetically on CPU, so
# force-override rather than setdefault.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: this box has a single CPU core, so XLA compiles
# dominate test wall-clock; the cache removes recompiles both across runs and
# for re-jitted-but-identical programs within one run.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".cache", "jax_compilation")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
