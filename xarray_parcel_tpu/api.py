"""Reference-compatible API facade.

One namespace mirroring the public surface of the reference's
``parcel_functions`` module (reference: modules/parcel_functions.py), so a
user of the reference finds every entry point under the same name — operating
on jax arrays (batch dims leading, level axis last) instead of DataArrays
with a ``vert_dim``.  Where the reference returns a Dataset, these return a
dict/FieldSet keyed by the same variable names; ``prefix`` kwargs rename keys
exactly as the reference does.
"""

import jax.numpy as jnp
import numpy as np

from . import adiabat, thermo
from .adiabat import (AdiabatTables, load_moist_adiabat_lookups, moist_lapse,
                      moist_lapse_integrate)
from .cape import cape_cin, cape_cin_base, lfc_el
from .cape import surface_based_cape_cin as _sb_cape_cin
from .diagnostics import (deep_convective_index as _dci,
                          freezing_level_height, isobar_temperature,
                          lapse_rate, lifted_index as _lifted_index,
                          melting_level_height, significant_hail_parameter,
                          wet_bulb_temperature, wind_shear)
from .fieldset import FieldSet, annotate, attrs_for
from .lcl import lcl
from .ops import (bound_pressure, compact_left, find_intersections,
                  get_layer, insert_level, interp1d, linear_interp,
                  log_interp, trapz, trap_around_zeros)
from .parcels import (from_most_unstable_parcel, mix_layer, mixed_layer,
                      mixed_parcel, most_unstable_parcel)
from .parcels import (mixed_layer_cape_cin as _ml_cape_cin,
                      most_unstable_cape_cin as _mu_cape_cin)
from .pipeline import (conv_properties, conv_properties_fused,
                       min_conv_properties, min_conv_properties_fused,
                       storm_proxies)
from .thermo import (dewpoint_from_specific_humidity, mixing_ratio,
                     virtual_temperature, wet_bulb_temperature_fast)

# The reference's name for the left-compaction primitive.
shift_out_nans = compact_left

# The reference's interp1d_numba equivalent (a jitted device kernel; the
# reference name advertises its numba implementation so the neutral name is
# kept; reference: modules/parcel_functions.py:23-37).
interp1d_numba = interp1d

# Table-grid snapping helper (reference: modules/parcel_functions.py:358).
round_to = adiabat.round_to

# Table builder under the reference's names (moist_adiabat_lookup is the
# raw builder, moist_adiabat_tables the cached wrapper; reference:
# modules/parcel_functions.py:318-356, 447-523).
moist_adiabat_tables = AdiabatTables.build
moist_adiabat_lookup = AdiabatTables.build


def lookup_tables_loaded():
    """True when the default adiabat tables are loaded
    (reference: modules/parcel_functions.py:56-61 — the assert guard)."""
    return adiabat._DEFAULT_TABLES is not None


def dry_lapse(pressure, parcel_temperature, parcel_pressure=None):
    """Dry adiabat; parcel pressure defaults to the column maximum
    (NaN-skipping, as the reference's xarray .max;
    reference: modules/parcel_functions.py:291-316)."""
    from .ops import nanmax
    pressure = jnp.asarray(pressure)
    if parcel_pressure is None:
        parcel_pressure = nanmax(pressure)
    pt = jnp.asarray(parcel_temperature)
    pp = jnp.asarray(parcel_pressure)
    if pt.ndim < pressure.ndim:
        pt = pt[..., None]
    if pp.ndim < pressure.ndim:
        pp = pp[..., None]
    return thermo.dry_lapse(pressure, pt, pp)


def _rename(res, prefix):
    if prefix is None:
        return res
    return type(res)({f'{prefix}_{k}': v for k, v in res.items()})


def surface_based_cape_cin(pressure, temperature, dewpoint, prefix=None,
                           **kwargs):
    res, profile = _sb_cape_cin(pressure, temperature, dewpoint, **kwargs)
    return _rename(annotate(res), prefix), annotate(profile)


def most_unstable_cape_cin(pressure, temperature, dewpoint, depth=300.0,
                           prefix=None, **kwargs):
    res, profile, parcel = _mu_cape_cin(pressure, temperature, dewpoint,
                                        depth=depth, **kwargs)
    return (_rename(annotate(res), prefix), annotate(profile),
            annotate(parcel))


def mixed_layer_cape_cin(pressure, temperature, dewpoint, depth=100.0,
                         prefix=None, **kwargs):
    res, profile, parcel = _ml_cape_cin(pressure, temperature, dewpoint,
                                        depth=depth, **kwargs)
    return (_rename(annotate(res), prefix), annotate(profile),
            annotate(parcel))


def lifted_index(profile, prefix=None, description=None):
    res = _rename(_lifted_index(profile), prefix)
    key = f'{prefix}_lifted_index' if prefix else 'lifted_index'
    return annotate(res, {key: description} if description else None)


def deep_convective_index(pressure, temperature, dewpoint, lifted_index,
                          prefix=None, description=None):
    res = _rename(_dci(pressure, temperature, dewpoint, lifted_index),
                  prefix)
    key = f'{prefix}_dci' if prefix else 'dci'
    return annotate(res, {key: description} if description else None)


def parcel_profile(pressure, parcel_pressure, parcel_temperature,
                   parcel_dewpoint, **kwargs):
    from .profile import parcel_profile as _pp
    return annotate(_pp(pressure, parcel_pressure, parcel_temperature,
                        parcel_dewpoint, **kwargs))


def parcel_profile_with_lcl(pressure, temperature, dewpoint, parcel_pressure,
                            parcel_temperature, parcel_dewpoint, **kwargs):
    from .profile import parcel_profile_with_lcl as _ppl
    return annotate(_ppl(pressure, temperature, dewpoint, parcel_pressure,
                         parcel_temperature, parcel_dewpoint, **kwargs))


def add_lcl_to_profile(profile, environment=None, interpolator='log'):
    from .profile import add_lcl_to_profile as _al
    return annotate(_al(profile, environment=environment,
                        interpolator=interpolator))


def valid_data(dat, strict=True):
    """Validate the reference's input invariants on concrete arrays: pressure
    strictly decreasing along the level axis (NaN padding allowed at the top)
    (reference: modules/parcel_functions.py:2308-2321).

    Host-side check via the native C++ ingest runtime (not jittable);
    returns the per-column validity mask, raising on any invalid column when
    ``strict``.

    .. note:: the return value is a boolean *array* (one entry per column),
       not a scalar — ``if valid_data(d, strict=False):`` is ambiguous for
       multi-column input; use ``valid_data(d, strict=False).all()``.
    """
    from . import native
    p = np.asarray(dat['pressure'] if isinstance(dat, dict) else dat)
    ok = native.validate_columns(p)
    if strict and not np.all(ok):
        # An explicit raise, not an assert: the contract must survive
        # ``python -O``.
        raise ValueError(
            'Pressures must decrease with increasing level number.')
    return ok
