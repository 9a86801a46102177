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
# NO persistent compilation cache for tests: XLA:CPU executable
# DESERIALIZATION reproducibly aborts/segfaults on the large RANSAC
# while-loop executables in this jaxlib — even reading back an entry the
# SAME process wrote moments earlier (verified on a fresh empty cache
# dir; the read happens when a later jit wrapper traces to identical HLO
# and hits the persistent cache instead of recompiling). Suites pay the
# cold compiles (~10 extra minutes) in exchange for never dying mid-run.
# The empty env var also keeps the in-process CLI mains the suite invokes
# from re-enabling the cache (config.config_from_args honors it); TPU
# entry points keep using .jax_cache, whose reads have never faulted.
os.environ['EPOS_JAX_CACHE_DIR'] = ''
