"""Test configuration: fp64 CPU JAX with an 8-device virtual mesh.

TPU v5e's fp64 is emulated/slow and the reference's golden tolerances (2-7
decimals, MetPy-derived) need fp64, so correctness tests run on the CPU
backend with x64 enabled; multi-chip sharding tests use
xla_force_host_platform_device_count=8 (something the reference, dask-bound,
never had).  The benchmark (bench.py) runs fp32 on real TPU hardware instead.
"""

import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if 'host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax

# The axon TPU plugin overrides the JAX_PLATFORMS env var, so force the CPU
# backend through the config API as well.
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

# Persistent compilation cache: the expensive whole-pipeline CPU compiles
# repeat identically across suite runs — cache them (gitignored dir).
# Entries under 2 s stay uncached to keep lookup/write overhead below the
# win (validated by benchmarks/deploy_tpu_smoke.py; see deploy.py).
from xarray_parcel_tpu import deploy

deploy.enable_compilation_cache(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), '.xla_cache'),
    min_compile_time_secs=2.0)
