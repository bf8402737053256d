"""Dataset-surface demo: the reference's per-function notebook flow.

Mirrors parcel_functions_demo.ipynb cells 13-21 (reference) on the
xarray-shaped surface: per-function calls (lcl, profile, lfc_el, the three
CAPE variants, diagnostics) with DataArrays, then the one-call pipeline +
storm proxies — including the out-of-core streamed run.  Works with real
xarray when installed, else with the vendored xr_lite stub.

Run on any backend:  python examples/xarray_demo.py  [--grid 8]
"""

import argparse
import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from demo import synthetic_dataset  # noqa: E402  (shared synthetic grid)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--grid', type=int, default=8)
    args = ap.parse_args()

    import xarray_parcel_tpu.xarray_api as parcel
    try:
        import xarray as xr
    except ImportError:
        from xarray_parcel_tpu import xr_lite as xr
        print('(xarray not installed; using the vendored xr_lite stub)')

    parcel.load_moist_adiabat_lookups()

    n = args.grid
    raw = synthetic_dataset(n)
    dims3 = ('latitude', 'longitude', 'model_level_number')
    dat = xr.Dataset(
        {k: ((dims3 if np.ndim(v) == 3 else dims3[:2]), v)
         for k, v in raw.items()},
        coords={'latitude': np.arange(n) * 0.1,
                'longitude': np.arange(n) * 0.1})
    print(f'grid: {n}x{n} columns x {dat.dims["model_level_number"]} levels')

    # --- per-function flow (demo nb cells 13-21) ---
    import jax.numpy as jnp
    from xarray_parcel_tpu import thermo
    dew = thermo.dewpoint_from_specific_humidity(
        jnp.asarray(dat['pressure'].values),
        jnp.asarray(dat['temperature'].values),
        jnp.asarray(dat['specific_humidity'].values))
    dat['dewpoint'] = (dims3, np.asarray(dew))

    def sfc(name):
        da = dat[name]
        axis = da.dims.index('model_level_number')
        return xr.DataArray(np.asarray(da.values).take(0, axis=axis),
                            dims=tuple(d for d in da.dims
                                       if d != 'model_level_number'))

    lcls = parcel.lcl(sfc('pressure'), sfc('temperature'), sfc('dewpoint'))
    print('lcl_pressure mean:',
          float(np.nanmean(np.asarray(lcls.lcl_pressure))))

    prof = parcel.parcel_profile_with_lcl(
        dat['pressure'], dat['temperature'], dat['dewpoint'],
        sfc('pressure'), sfc('temperature'), sfc('dewpoint'))
    print('profile levels:', prof.temperature.values.shape[-1])

    sol = parcel.lfc_el(prof['pressure'], prof['virtual_temperature'],
                        prof['environment_virtual_temperature'],
                        prof['lcl_pressure'],
                        prof['lcl_virtual_temperature'])
    print('columns with an LFC:',
          int(np.isfinite(np.asarray(sol.lfc_pressure)).sum()), '/', n * n)

    res, _ = parcel.surface_based_cape_cin(dat['pressure'],
                                           dat['temperature'],
                                           dat['dewpoint'])
    mu, _, _ = parcel.most_unstable_cape_cin(
        dat['pressure'], dat['temperature'], dat['dewpoint'],
        depth=250.0, prefix='mu')
    ml, _, _ = parcel.mixed_layer_cape_cin(
        dat['pressure'], dat['temperature'], dat['dewpoint'], depth=100.0)
    print('surface/mu/mixed-100 CAPE means:',
          [round(float(np.nanmean(np.asarray(x))), 1)
           for x in (res.cape, mu.mu_cape, ml.cape)])

    li = parcel.lifted_index(prof)
    wb = parcel.wet_bulb_temperature_fast(dat['temperature'],
                                          dat['dewpoint'])
    shear = parcel.wind_shear(dat['surface_wind_u'], dat['surface_wind_v'],
                              dat['wind_u'], dat['wind_v'],
                              dat['wind_height_above_surface'])
    print('LI mean:', round(float(np.nanmean(np.asarray(li.lifted_index))),
                            2),
          ' fast-wet-bulb mean:', round(float(np.nanmean(np.asarray(wb))),
                                        1),
          ' shear mean:', round(float(np.nanmean(
              np.asarray(shear.shear_magnitude))), 1))

    # --- the one-call pipeline + proxies (demo nb cells 23/30) ---
    out = parcel.conv_properties(dat)
    proxies = parcel.storm_proxies(out)
    print('pipeline variables:', len(out.data_vars),
          ' proxies:', len(proxies.data_vars))
    print('mu_cape attrs:', out.mu_cape.attrs)

    # --- out-of-core streamed run must match ---
    streamed = parcel.conv_properties(dat, stream_columns=max(4, n * n // 4))
    diff = float(np.nanmax(np.abs(np.asarray(streamed.mu_cape) -
                                  np.asarray(out.mu_cape))))
    print('streamed vs direct max |d mu_cape|:', diff)
    # Bitwise equality is pinned on the CPU backend (test_stream_map); on
    # an fp32 accelerator the chunked shapes compile to differently fused
    # programs and may differ by ~1 ulp of a few-hundred-J/kg CAPE.
    assert diff < 1e-3


if __name__ == '__main__':
    main()
