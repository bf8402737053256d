"""Contract tests for the Dataset/DataArray subset the boundary relies on.

``xarray_parcel_tpu.xarray_api`` is written against the small structural
subset of xarray's public API that the reference exercises (reference:
modules/parcel_functions.py passim).  In environments without xarray the
vendored :mod:`xarray_parcel_tpu.xr_lite` provides that subset.  This module
pins each behavior the boundary depends on to xarray's DOCUMENTED semantics,
and runs the SAME assertions against real xarray whenever it is importable —
so a divergence between the shim and xarray shows up here, not in a
migrating user's pipeline.

Boundary dependencies pinned below (where each is used):

- Dataset construction from ``(dims, data[, attrs])`` tuples, including a
  bare-string dims spec            (xarray_api._lift, every test fixture)
- ``ds[name]`` data_vars-before-coords precedence, KeyError for unknown
  names, and ``in`` covering both  (from_dataset, storm_proxies)
- iteration over a Dataset yields data-variable names
                                   (_dataset_pipeline variable selection)
- ``da.transpose(*complete_permutation)`` == np.transpose with the matching
  axes; bare ``transpose()`` reverses dims
                                   (_lower / from_dataset — these only ever
                                   pass COMPLETE permutations, the one form
                                   real xarray accepts without ``...``)
- ``assign_coords`` returns a new object, source unchanged
                                   (_lift attaches output coords)
- ``ds.copy()`` + ``__setitem__`` isolation: mutating the copy leaves the
  original untouched               (test fixtures; reference notebook flow)
- ``coords[d]`` exposing ``.values`` / ``np.asarray``
                                   (_coords_of, _vert_coord_of)
- DataArray ``dims``/``shape``/``values``/``attrs``/``name`` and
  ``np.asarray(da)``               (everywhere)

Known, DELIBERATE shim restrictions (not divergences the boundary hits):
xr_lite keeps coords on the Dataset only — variable DataArrays don't carry
them — which xarray_api handles explicitly (xarray_api._fields_of Dataset-
level coord fallback, _lift_da construction-time coords); and xr_lite's
``transpose`` tolerates partial dim lists where xarray requires ``...`` —
the boundary only issues complete permutations.
"""

import numpy as np
import pytest

import xarray_parcel_tpu.xr_lite as xr_lite

BACKENDS = [pytest.param(xr_lite, id='xr_lite')]
try:                                    # pragma: no cover - env-dependent
    import xarray
    BACKENDS.append(pytest.param(xarray, id='xarray'))
except ImportError:
    pass


@pytest.fixture(params=BACKENDS)
def xr(request):
    return request.param


def _ds(xr):
    rng = np.random.default_rng(7)
    return xr.Dataset(
        {'temperature': (('y', 'x', 'lev'), rng.normal(280, 5, (2, 3, 4)),
                         {'units': 'K'}),
         'pressure': ('lev', np.linspace(1000., 700., 4))},
        coords={'y': np.arange(2.), 'x': np.arange(3.),
                'lev': np.arange(4)})


def test_construction_from_tuples(xr):
    ds = _ds(xr)
    assert tuple(ds['temperature'].dims) == ('y', 'x', 'lev')
    # A bare-string dims spec means a 1-tuple.
    assert tuple(ds['pressure'].dims) == ('lev',)
    assert ds['temperature'].attrs == {'units': 'K'}
    assert ds['temperature'].shape == (2, 3, 4)
    assert dict(ds.dims)['lev'] == 4


def test_getitem_precedence_and_membership(xr):
    ds = _ds(xr)
    # Data variables and coords are both reachable; unknown names KeyError.
    assert np.asarray(ds['pressure']).shape == (4,)
    assert np.asarray(ds['x']).tolist() == [0.0, 1.0, 2.0]
    with pytest.raises(KeyError):
        ds['nope']
    # `in` covers data_vars AND coords (xarray: __contains__ spans both).
    assert 'temperature' in ds and 'x' in ds and 'nope' not in ds


def test_iteration_yields_data_var_names(xr):
    ds = _ds(xr)
    assert sorted(ds) == ['pressure', 'temperature']
    assert sorted(ds.data_vars) == ['pressure', 'temperature']


def test_transpose_complete_permutation(xr):
    ds = _ds(xr)
    da = ds['temperature']
    out = da.transpose('lev', 'y', 'x')
    assert tuple(out.dims) == ('lev', 'y', 'x')
    np.testing.assert_array_equal(np.asarray(out),
                                  np.transpose(np.asarray(da), (2, 0, 1)))
    # Bare transpose() reverses the dims.
    rev = da.transpose()
    assert tuple(rev.dims) == ('lev', 'x', 'y')
    # Identity permutation is a no-op in values.
    same = da.transpose('y', 'x', 'lev')
    np.testing.assert_array_equal(np.asarray(same), np.asarray(da))


def test_assign_coords_returns_new_object(xr):
    ds = _ds(xr)
    out = ds.assign_coords({'z': np.arange(5.)})
    assert 'z' in out.coords and 'z' not in ds.coords
    np.testing.assert_array_equal(np.asarray(out.coords['z'].values),
                                  np.arange(5.))
    # Existing coords survive the assign.
    assert 'x' in out.coords


def test_copy_isolation(xr):
    ds = _ds(xr)
    cp = ds.copy()
    cp['extra'] = (('lev',), np.ones(4))
    assert 'extra' in cp and 'extra' not in ds
    # Variables in the copy keep values equal to the source's.
    np.testing.assert_array_equal(np.asarray(cp['temperature']),
                                  np.asarray(ds['temperature']))


def test_coords_expose_values(xr):
    ds = _ds(xr)
    c = ds.coords['lev']
    assert np.asarray(c.values if hasattr(c, 'values') else c).tolist() == \
        [0, 1, 2, 3]


def test_dataarray_surface(xr):
    da = xr.DataArray(np.arange(6.).reshape(2, 3), dims=('a', 'b'),
                      attrs={'units': 'K'}, name='t')
    assert da.name == 't' and da.dims == ('a', 'b')
    assert da.shape == (2, 3) and da.attrs['units'] == 'K'
    np.testing.assert_array_equal(np.asarray(da),
                                  np.arange(6.).reshape(2, 3))
    np.testing.assert_array_equal(da.values, np.asarray(da))


def test_boundary_round_trip(xr, monkeypatch):
    """The actual boundary functions work identically over either backend:
    from_dataset lowers a mixed-dims Dataset, _lift raises results back with
    attrs and coords — the end-to-end contract a migrating user hits."""
    from xarray_parcel_tpu import xarray_api
    monkeypatch.setattr(xarray_api, 'xr', xr)
    rng = np.random.default_rng(3)
    L = 5
    ds = xr.Dataset(
        {'pressure': (('model_level_number',), np.linspace(1000., 500., L)),
         'temperature': (('latitude', 'longitude', 'model_level_number'),
                         rng.normal(280, 5, (2, 3, L))),
         'surface_wind_u': (('longitude',), rng.normal(0, 1, 3))},
        coords={'latitude': np.arange(2.), 'longitude': np.arange(3.),
                'model_level_number': np.arange(L)})
    fields, batch_dims = xarray_api.from_dataset(
        ds, variables=['pressure', 'temperature', 'surface_wind_u'])
    assert batch_dims == ('latitude', 'longitude')
    # Trailing-aligned subset-dim variables keep their natural shape.
    assert fields['pressure'].shape == (L,)
    assert fields['surface_wind_u'].shape == (3,)
    assert fields['temperature'].shape == (2, 3, L)
    out = xarray_api.to_dataset(
        {'cape': np.zeros((2, 3)), 'track': np.zeros((2, 3, L))},
        batch_dims, coords={d: ds.coords[d] for d in batch_dims})
    assert tuple(out['cape'].dims) == ('latitude', 'longitude')
    assert tuple(out['track'].dims) == ('latitude', 'longitude',
                                        'model_level_number')
    assert out['cape'].attrs.get('units') == 'J kg$^{-1}$'
    np.testing.assert_array_equal(np.asarray(out.coords['latitude'].values),
                                  np.arange(2.))
