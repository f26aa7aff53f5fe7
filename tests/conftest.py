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

# IMGCOMP_TEST_TPU=1 keeps the real backend so the @tpu_only tests (Mosaic
# regressions CPU interpret mode cannot catch) run on hardware; everything
# else in the suite still passes there, just slowly. Default: CPU-8.
if os.environ.get('IMGCOMP_TEST_TPU') != '1':
    jax.config.update('jax_platforms', 'cpu')

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import gc  # noqa: E402

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        'markers',
        'tpu_only: needs the real TPU backend (run with IMGCOMP_TEST_TPU=1; '
        'skipped on the CPU mesh — interpret mode cannot catch Mosaic-level '
        'regressions such as the planar KS=4 step blocking)')


def pytest_collection_modifyitems(config, items):
    if os.environ.get('IMGCOMP_TEST_TPU') == '1':
        return
    skip = pytest.mark.skip(reason='tpu_only: set IMGCOMP_TEST_TPU=1 on '
                                   'real hardware')
    for item in items:
        if 'tpu_only' in item.keywords:
            item.add_marker(skip)


@pytest.fixture(autouse=True, scope='module')
def _free_compiled_executables_between_modules():
    """The interpret-mode Pallas kernels trace to very large XLA graphs;
    dozens of per-(shape, batch, precision) executables accumulating in one
    pytest process have caused compiler OOM segfaults. Drop every compile
    cache when a test module finishes."""
    yield
    from imgcomp_cvpr_tpu.coding import pallas_kernel as pk
    from imgcomp_cvpr_tpu.coding import planar_kernel as plk
    pk.make_forward.cache_clear()
    pk.make_reverse.cache_clear()
    plk.make_plane_forward.cache_clear()
    plk.make_plane_reverse.cache_clear()
    jax.clear_caches()
    gc.collect()
