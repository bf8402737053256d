"""xarray shim tests (skipped when xarray is not installed, as in this CI
image — the shim is import-gated; the compute core never needs xarray)."""

import numpy as np
import pytest

from xarray_parcel_tpu import xarray_api

xr = pytest.importorskip('xarray')


@pytest.fixture(scope='module')
def dat():
    from xarray_parcel_tpu import adiabat
    adiabat.load_moist_adiabat_lookups()
    ny, nx, L = 3, 4, 40
    rng = np.random.default_rng(0)
    p = np.broadcast_to(np.linspace(1005., 200., L), (ny, nx, L)).copy()
    t = 300.0 - 70.0 * (1.0 - (p / 1005.0) ** 0.3) + rng.normal(
        0, 1, (ny, nx, L))
    q = 0.014 * (p / 1005.0) ** 3 + 1e-5
    h = 44330.0 * (1.0 - (p / 1013.25) ** 0.19)
    dims = ('latitude', 'longitude', 'model_level_number')
    return xr.Dataset(
        {'pressure': (dims, p), 'temperature': (dims, t),
         'specific_humidity': (dims, q), 'height_asl': (dims, h),
         'surface_wind_u': (dims[:2], rng.normal(3, 1, (ny, nx))),
         'surface_wind_v': (dims[:2], rng.normal(0, 1, (ny, nx))),
         'wind_u': (dims, rng.normal(8, 3, (ny, nx, L))),
         'wind_v': (dims, rng.normal(1, 3, (ny, nx, L))),
         'wind_height_above_surface': (dims, h - h[..., :1])},
        coords={'latitude': np.arange(ny) * 1.0,
                'longitude': np.arange(nx) * 1.0,
                'model_level_number': np.arange(1, L + 1)})


def test_conv_properties_dataset_roundtrip(dat):
    out = xarray_api.conv_properties(dat)
    assert isinstance(out, xr.Dataset)
    assert out.mu_cape.dims == ('latitude', 'longitude')
    assert 'units' in out.mu_cape.attrs
    assert np.isfinite(np.asarray(out.mu_cape)).all()
    proxies = xarray_api.storm_proxies(out)
    assert 'proxy_Craven2004' in proxies


def test_surface_cape_fused_vs_unfused(dat):
    dat2 = dat.copy()
    from xarray_parcel_tpu import thermo
    import jax.numpy as jnp
    dew = thermo.dewpoint_from_specific_humidity(
        jnp.asarray(dat.pressure.values), jnp.asarray(dat.temperature.values),
        jnp.asarray(dat.specific_humidity.values))
    dat2['dewpoint'] = (dat.pressure.dims, np.asarray(dew))
    a = xarray_api.surface_based_cape_cin(dat2, fused=True)
    b = xarray_api.surface_based_cape_cin(dat2, fused=False)
    np.testing.assert_allclose(np.asarray(a.cape), np.asarray(b.cape),
                               atol=1e-6)


def test_vert_dim_position_irrelevant(dat):
    # Vertical dim first instead of last must give identical results.
    transposed = dat.transpose('model_level_number', 'latitude', 'longitude')
    out1 = xarray_api.conv_properties(dat)
    out2 = xarray_api.conv_properties(transposed)
    np.testing.assert_allclose(np.asarray(out1.mu_cape),
                               np.asarray(out2.mu_cape), atol=1e-6)
