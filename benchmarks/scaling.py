"""Scaling sweep: surface-based CAPE/CIN columns/sec vs grid size.

Equivalent of the reference's ``benchmark_cape``
(reference: modules/parcel_test.py:586-619), which sweeps 2^2…101^2-column
grids over xarray-persist / xarray-load / MetPy-serial.  Here the arms are
the fused Pallas kernel and the unfused XLA path (the serial arm lives in
tests/serial_oracle.py and is ~6 orders of magnitude off; its rate from the
reference's own hardware is the vs_serial anchor).

Run on the TPU:  python benchmarks/scaling.py
Prints one JSON line per (grid, arm).
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_columns
    from bench import synthetic
    from xarray_parcel_tpu import adiabat, cape, fused, pipeline
    from xarray_parcel_tpu.utils import columns_per_second

    tables = adiabat.load_moist_adiabat_lookups(dtype=jnp.float32)
    tables = jax.tree_util.tree_map(jax.device_put, tables)

    arms = {
        'fused_pallas': jax.jit(lambda p, t, td: fused.fused_surface_cape_cin(
            p, t, td, tables=tables)[0]['cape']),
        'xla': jax.jit(lambda p, t, td: cape.surface_based_cape_cin(
            p, t, td, tables=tables)[0]['cape']),
    }
    # The deployment path (full conv_properties, fused kernels) only at the
    # two largest grids — each grid size is a fresh ~2 min remote compile.
    pipe = jax.jit(lambda dat: pipeline.conv_properties_fused(
        dat, tables=tables))

    for n in (2, 4, 8, 16, 32, 64, 101, 256, 512, 1024):
        B = n * n
        p, t, td = (jnp.asarray(v) for v in _synthetic_columns((B,)))
        for arm, f in arms.items():
            rate, sec = columns_per_second(f, p, t, td, iters=3)
            print(json.dumps({'grid': f'{n}x{n}', 'columns': B, 'arm': arm,
                              'columns_per_sec': round(rate, 1),
                              'sec_per_iter': round(sec, 6)}), flush=True)
        if n in (256, 512):
            dat = {k: jnp.asarray(v) for k, v in synthetic(B).items()}
            # One jitted program -> one-leaf sync; per-leaf syncing pays
            # a serialized tunnel round trip per output variable.
            rate, sec = columns_per_second(pipe, dat, columns=B, iters=3,
                                           single_program=True)
            print(json.dumps({'grid': f'{n}x{n}', 'columns': B,
                              'arm': 'pipeline_fused',
                              'columns_per_sec': round(rate, 1),
                              'sec_per_iter': round(sec, 6)}), flush=True)


if __name__ == '__main__':
    main()
