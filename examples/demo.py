"""End-to-end demo: the reference's demo-notebook flow as a script.

Mirrors parcel_functions_demo.ipynb (reference): build/load the adiabat
tables, run the full convection-diagnostics pipeline on a gridded dataset,
derive storm proxies, validate the vector results against the exact-ODE
oracle backend, and report throughput.

Run on any backend:  python examples/demo.py  [--grid 15]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def synthetic_dataset(n, L=60, seed=42):
    """A physically plausible (n, n, L) grid standing in for the Aus400
    subset the reference demos on (its test_data.nc is not redistributed)."""
    rng = np.random.default_rng(seed)
    p = np.linspace(1009.0, 120.0, L)
    p = np.broadcast_to(p, (n, n, L)) + rng.normal(0, 0.4, (n, n, L))
    p = -np.sort(-p, axis=-1)
    t = 303.0 - 78.0 * (1.0 - (p / 1009.0) ** 0.3) + rng.normal(
        0, 1.8, (n, n, L))
    td = t - (np.abs(rng.normal(1.6, 1.6, (n, n, L))) + 0.2 +
              17.0 * (1.0 - p / 1009.0) ** 2)
    e = 6.112 * np.exp(17.67 * (td - 273.15) / (td - 29.65))
    w = 0.6219569100577033 * e / (p - e)
    q = w / (1.0 + w)
    h = 44330.0 * (1.0 - (p / 1013.25) ** 0.19)
    return {
        'pressure': p, 'temperature': t, 'specific_humidity': q,
        'height_asl': h,
        'surface_wind_u': rng.normal(3, 2, (n, n)),
        'surface_wind_v': rng.normal(0, 2, (n, n)),
        'wind_u': rng.normal(8, 5, (n, n, L)),
        'wind_v': rng.normal(2, 5, (n, n, L)),
        'wind_height_above_surface': h - h[..., :1],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--grid', type=int, default=15,
                    help='grid edge length (reference demos on 15x15)')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from xarray_parcel_tpu import adiabat, api, pipeline
    from xarray_parcel_tpu.utils import compare_results, time_function

    print(f'backend: {jax.default_backend()}')
    t0 = time.perf_counter()
    tables = api.load_moist_adiabat_lookups()
    print(f'adiabat tables ready in {time.perf_counter() - t0:.1f}s '
          f'({tables.curves.shape[0]} curves x {tables.curves.shape[1]} '
          f'pressures)')

    dat = {k: jnp.asarray(v) for k, v in
           synthetic_dataset(args.grid).items()}
    cols = args.grid * args.grid

    # Full pipeline (the reference's headline demo, its cell 23).
    run = jax.jit(lambda d: pipeline.conv_properties(d, tables=tables))
    out, sec = time_function(run, dat)
    out, sec = time_function(run, dat)          # steady state
    print(f'\nconv_properties: {len(out)} variables, {cols} columns in '
          f'{sec:.4f}s ({cols / sec:.0f} columns/sec)')
    for k in ('mu_cape', 'mu_cin', 'mixed_100_cape', 'mu_lifted_index',
              'freezing_level'):
        v = np.asarray(out[k])
        print(f'  {k:24s} mean={np.nanmean(v):9.2f} max={np.nanmax(v):9.2f}')

    proxies = pipeline.storm_proxies(out)
    active = {k: int(np.asarray(v).sum()) for k, v in proxies.items()
              if np.asarray(v).dtype == bool}
    print(f'\nstorm proxies (active columns of {cols}): {active}')

    # Oracle validation (the reference's progressive-substitution check,
    # its cells 25-27): table backend vs exact-ODE moist lapse.
    oracle = jax.jit(lambda d: pipeline.conv_properties(
        d, tables=tables, moist_lapse=adiabat.moist_lapse_integrate))
    ref, _ = time_function(oracle, dat)
    print('\ntable backend vs exact-ODE oracle:')
    reports = compare_results(out, ref, tolerance=0.5)
    worst = max(reports, key=lambda r: r['max_abs_diff'])
    print(f'worst variable: {worst["name"]} '
          f'(max abs diff {worst["max_abs_diff"]:.3g})')


if __name__ == '__main__':
    main()
