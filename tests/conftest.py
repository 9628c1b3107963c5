"""Test config: force an 8-virtual-device CPU JAX platform.

Must run before anything imports jax, hence module-level in conftest.
"""
import os

os.environ['JAX_PLATFORMS'] = 'cpu'   # force: the shell env may point at a TPU
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ.setdefault('JAX_ENABLE_X64', '0')
# Gather-kernel tile height: production default is 256 (chip-measured, see
# gather_gemm.TV); interpret-mode kernel cost scales with the static TV
# unroll, so the suite pins the small tile.  Kernel logic is TV-agnostic —
# test_tile_gating runs a TV=128 subprocess pass to pin that.
os.environ.setdefault('PCDET_GATHER_TV', '64')

# persistent compilation cache: XLA CPU compiles are slow on small hosts;
# cache them across test runs.
_cache_dir = os.path.join(os.path.dirname(__file__), '..', '.jax_cache')
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', os.path.abspath(_cache_dir))
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES', '0')

# The machine image's sitecustomize registers a TPU-tunnel backend ("axon")
# and force-sets jax_platforms before conftest runs; override back to CPU so
# the unit suite never rides the tunnel.
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')


import pytest


@pytest.fixture(autouse=True)
def _reset_bn_groups():
    """BN_GROUPS is a process-global the train CLI sets (per-device BN);
    CLI e2e tests must not leak it into later BN-parity tests."""
    from pcdet_tpu.models import layers
    layers.set_bn_groups(1)
    yield
