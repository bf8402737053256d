"""xarray ingest/egress shim — the reference-shaped Dataset interface.

The reference is an xarray library: every entry point takes DataArrays with a
named vertical dimension (default ``model_level_number``) and returns
Datasets with ``long_name``/``units`` attrs (reference:
modules/parcel_functions.py passim).  This module is the boundary between
that world and the TPU core: it moves the vertical dim to the trailing axis,
lowers to (optionally mesh-sharded) ``jax.Array``s, runs the jitted pipeline,
and lifts results back to xarray objects with the same variable names and
attrs the reference emits.

xarray is an optional dependency (the compute core never imports it); all
public functions raise a clear ImportError if it is missing.

Typical switch from the reference::

    import xarray_parcel_tpu.xarray_api as parcel
    parcel.load_moist_adiabat_lookups()
    out = parcel.conv_properties(dat)          # dat: the same Dataset
    proxies = parcel.storm_proxies(out)

(reference: modules/parcel_functions.py:1951-2100, 2323-2407).
"""

import functools

import jax
import numpy as np

from . import native
from . import pipeline as _pipeline
from .adiabat import load_moist_adiabat_lookups  # noqa: F401  (re-export)
from .fieldset import attrs_for

try:
    import xarray as xr
    HAVE_XARRAY = True
except ImportError:         # pragma: no cover - exercised only without xarray
    xr = None
    HAVE_XARRAY = False

DEFAULT_VERT_DIM = 'model_level_number'

# Input variables that carry the vertical dim (everything else is per-column
# surface data, e.g. surface winds).
_LEVEL_VARS = ('pressure', 'temperature', 'specific_humidity', 'dewpoint',
               'height_asl', 'wind_u', 'wind_v',
               'wind_height_above_surface')


def _require_xarray():
    if not HAVE_XARRAY:
        raise ImportError(
            'xarray is required for xarray_parcel_tpu.xarray_api; install '
            'xarray or use the array API (xarray_parcel_tpu.api) directly.')


def from_dataset(dat, vert_dim=DEFAULT_VERT_DIM, variables=None, mesh=None):
    """Lower a Dataset to a dict of jax arrays (vertical dim trailing).

    Returns ``(fields, batch_dims)`` where ``batch_dims`` is the ordered
    tuple of non-vertical dims (used by :func:`to_dataset` to lift results
    back).  With ``mesh`` the leading batch dim is sharded over it
    (the TPU analogue of the reference's dask chunking,
    reference: modules/parcel_functions.py:561-592).
    """
    _require_xarray()
    names = variables or [v for v in _LEVEL_VARS if v in dat] + \
        [v for v in ('surface_wind_u', 'surface_wind_v') if v in dat]
    batch_dims = tuple(d for d in dat[names[0]].dims if d != vert_dim)

    fields = {}
    for name in names:
        da = dat[name]
        # Every variable is put in the SAME batch-dim order (variables may
        # legally carry differently ordered dims in xarray).
        order = tuple(d for d in batch_dims if d in da.dims)
        if da.dims == (vert_dim,) + order and da.ndim > 1:
            # Native repack: leading level axis -> trailing, f32 (native/).
            fields[name] = native.levels_to_last(np.asarray(da.values))
        else:
            da = da.transpose(*order, *((vert_dim,) if vert_dim in da.dims
                                        else ()))
            fields[name] = native.repack_to_f32(np.asarray(da.values))

    if mesh is not None:
        from .parallel import shard_batch
        fields = shard_batch(fields, mesh, batch_dims=1)
    else:
        fields = {k: jax.numpy.asarray(v) for k, v in fields.items()}
    return fields, batch_dims


def to_dataset(result, batch_dims, coords=None):
    """Lift a dict of (batch…) arrays to a Dataset with reference attrs."""
    _require_xarray()
    data_vars = {}
    for name, arr in result.items():
        arr = np.asarray(jax.device_get(arr))
        dims = batch_dims[:arr.ndim]
        data_vars[name] = (dims, arr, attrs_for(name))
    ds = xr.Dataset(data_vars)
    if coords is not None:
        ds = ds.assign_coords({k: v for k, v in coords.items()
                               if k in ds.dims})
    return ds


def _dataset_pipeline(fn):
    @functools.wraps(fn)
    def wrapper(dat, vert_dim=DEFAULT_VERT_DIM, tables=None, mesh=None,
                **kwargs):
        _require_xarray()
        fields, batch_dims = from_dataset(dat, vert_dim=vert_dim, mesh=mesh)
        run = jax.jit(functools.partial(fn, tables=tables, **kwargs))
        out = run(fields)
        coords = {d: dat.coords[d] for d in batch_dims if d in dat.coords}
        return to_dataset(out, batch_dims, coords=coords)
    return wrapper


conv_properties = _dataset_pipeline(_pipeline.conv_properties)
min_conv_properties = _dataset_pipeline(_pipeline.min_conv_properties)


def storm_proxies(conv, vert_dim=DEFAULT_VERT_DIM):
    """Storm proxies from a conv_properties Dataset
    (reference: modules/parcel_functions.py:2323-2407)."""
    _require_xarray()
    fields = {k: jax.numpy.asarray(np.asarray(conv[k].values))
              for k in conv.data_vars}
    out = jax.jit(_pipeline.storm_proxies)(fields)
    batch_dims = tuple(conv[list(conv.data_vars)[0]].dims)
    coords = {d: conv.coords[d] for d in batch_dims if d in conv.coords}
    return to_dataset(out, batch_dims, coords=coords)


def surface_based_cape_cin(dat, vert_dim=DEFAULT_VERT_DIM, tables=None,
                           fused=True, **kwargs):
    """Surface-based CAPE/CIN from a Dataset with pressure / temperature /
    dewpoint (reference: modules/parcel_functions.py:1477-1514).  With
    ``fused`` the Pallas production kernel is used (no profile output)."""
    _require_xarray()
    fields, batch_dims = from_dataset(
        dat, vert_dim=vert_dim,
        variables=['pressure', 'temperature', 'dewpoint'])
    if fused:
        from .fused import fused_surface_cape_cin
        res, sol = jax.jit(functools.partial(
            fused_surface_cape_cin, tables=tables, **kwargs))(
            fields['pressure'], fields['temperature'], fields['dewpoint'])
        res = dict(res, **sol)
    else:
        from .cape import surface_based_cape_cin as _sb
        res, _ = jax.jit(functools.partial(_sb, tables=tables, **kwargs))(
            fields['pressure'], fields['temperature'], fields['dewpoint'])
    coords = {d: dat.coords[d] for d in batch_dims if d in dat.coords}
    return to_dataset(res, batch_dims, coords=coords)
