"""Generate the committed regression archive (tier-3 tests).

The reference archives full-pipeline outputs to NetCDF and diffs new runs
against them to catch cross-version drift
(reference: environment_changes_eval.ipynb, historic_results/*.nc).  Here the
archive is an .npz holding both the synthetic input grid and every
conv_properties + storm_proxies output, produced on the fp64 CPU backend.

Regenerate (only when output semantics intentionally change):
    python tests/make_regression_archive.py
"""

import os

import numpy as np

ARCHIVE = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'data',
                       'regression_conv_properties.npz')


def make_inputs(ny=6, nx=6, L=40, seed=20260816):
    rng = np.random.default_rng(seed)
    p = np.linspace(1009.0, 140.0, L)
    p = np.broadcast_to(p, (ny, nx, L)) + rng.normal(0, 0.3, (ny, nx, L))
    p = -np.sort(-p, axis=-1)
    t = 302.0 - 77.0 * (1.0 - (p / 1009.0) ** 0.3) + rng.normal(
        0, 1.5, (ny, nx, L))
    td = t - (np.abs(rng.normal(1.5, 1.5, (ny, nx, L))) + 0.2 +
              16.0 * (1.0 - p / 1009.0) ** 2)
    e = 6.112 * np.exp(17.67 * (td - 273.15) / (td - 29.65))
    w = 0.6219569100577033 * e / (p - e)
    q = w / (1.0 + w)
    h = 44330.0 * (1.0 - (p / 1013.25) ** 0.19)
    # One all-NaN-poisoned column to pin the masking semantics.
    t = t.copy()
    t[0, 0, 5] = np.nan
    return {
        'pressure': p, 'temperature': t, 'specific_humidity': q,
        'height_asl': h,
        'surface_wind_u': rng.normal(3, 2, (ny, nx)),
        'surface_wind_v': rng.normal(0, 2, (ny, nx)),
        'wind_u': rng.normal(8, 5, (ny, nx, L)),
        'wind_v': rng.normal(2, 5, (ny, nx, L)),
        'wind_height_above_surface': h - h[..., :1],
    }


def compute(inputs):
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)
    import jax.numpy as jnp
    from xarray_parcel_tpu import adiabat, pipeline

    tables = adiabat.load_moist_adiabat_lookups()
    dat = {k: jnp.asarray(v) for k, v in inputs.items()}
    out = pipeline.conv_properties(dat, tables=tables)
    out.update(pipeline.storm_proxies(out))
    return {k: np.asarray(v) for k, v in out.items()}


def main():
    inputs = make_inputs()
    out = compute(inputs)
    os.makedirs(os.path.dirname(ARCHIVE), exist_ok=True)
    np.savez_compressed(ARCHIVE,
                        **{f'in_{k}': v for k, v in inputs.items()},
                        **{f'out_{k}': v for k, v in out.items()})
    print(f'wrote {ARCHIVE}: {len(out)} output variables')


if __name__ == '__main__':
    main()
