"""Test harness config: run everything on a virtual 8-device CPU mesh.

SURVEY.md §4 ("Multi-node without a cluster"): sharding logic is tested on
a host-platform device mesh so no TPU is needed.

NOTE: the axon TPU plugin in this image overrides JAX_PLATFORMS at import
time, so the platform must be forced via jax.config AFTER importing jax.
"""

import os

import jax

jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/panic3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert jax.default_backend() == "cpu" and len(jax.devices()) == 8
