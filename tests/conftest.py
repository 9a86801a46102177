"""Test configuration: run everything on a virtual 8-device CPU mesh.

This exercises the jax.sharding multi-chip code paths without TPU hardware
(SURVEY.md §4: CPU-mesh tests for the DP path).
"""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
xla_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in xla_flags:
  os.environ['XLA_FLAGS'] = (
      xla_flags + ' --xla_force_host_platform_device_count=8').strip()

# The environment's sitecustomize forces the 'axon' TPU platform regardless
# of JAX_PLATFORMS; override it through the config API.
import jax  # noqa: E402
jax.config.update('jax_platforms', 'cpu')
# Persistent compilation cache: re-runs skip the ~16 min of CPU compiles.
# Tests get their OWN cache dir (.jax_cache_cpu), never the .jax_cache a
# concurrent TPU job writes to: reading a half-written entry segfaults in
# jax's executable deserialization (two full-suite runs died this way at
# the exact moments the tracked e2e run was compiling its eval jits). The
# env var also routes the in-process CLI mains the suite invokes
# (config.config_from_args honors it).
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), '.jax_cache_cpu')
os.environ['EPOS_JAX_CACHE_DIR'] = _cache_dir
jax.config.update('jax_compilation_cache_dir', _cache_dir)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
