"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding/pjit paths are
validated on host devices (the standard JAX pattern for testing multi-chip
code without a pod).

The environment presets JAX_PLATFORMS=axon (a real-TPU tunnel registered
from sitecustomize), and the axon registration overrides env vars — so the
platform must be forced via jax.config after import.
"""

import os
import sys

flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
