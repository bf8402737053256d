"""Parcel selection: mixed-layer and most-unstable parcels, plus the
corresponding CAPE/CIN wrappers.

TPU-native equivalents of reference: modules/parcel_functions.py:102-289
(layer mixing, most-unstable search) and :1517-1697 (subsetting wrappers).
The reference's variable-length subsetting (``dropna`` + ``shift_out_nans``)
becomes fixed-shape left-compaction: columns keep a static level count with
NaN padding at the top, which every downstream op already treats as missing.
"""

import jax.numpy as jnp

from . import thermo
from .cape import cape_cin
from .ops import get_layer, insert_level, nanmax, nanmin, trapz


def mixed_layer(fields, depth=100.0):
    """Mass-weighted (mean-value-theorem) average of each variable over the
    surface-based layer of the given depth
    (reference: modules/parcel_functions.py:137-162)."""
    layer = get_layer(fields, depth=depth, interpolate=True)
    p = layer['pressure']
    pressure_depth = jnp.abs(nanmin(p) - nanmax(p))
    return {k: trapz(v, p) / pressure_depth for k, v in layer.items()
            if k != 'pressure'}


def conserved_fields(pressure, temperature, dewpoint):
    """The mixing-conserved per-level fields (theta, mixing ratio) — compute
    once and share when mixing several depths of the same columns (the
    pipeline mixes 100 and 50 hPa layers of identical inputs)."""
    return {'theta': thermo.potential_temperature(pressure, temperature),
            'mixing_ratio': thermo.saturation_mixing_ratio(pressure,
                                                           dewpoint)}


def mixed_parcel(pressure, temperature, dewpoint, depth=100.0,
                 conserved=None):
    """Fully mix a surface-based layer: conserve theta and mixing ratio,
    return the parcel's pressure/temperature/dewpoint
    (reference: modules/parcel_functions.py:229-289).
    ``conserved``: optional precomputed :func:`conserved_fields`."""
    pressure = jnp.asarray(pressure)
    parcel_start_pressure = pressure[..., 0]

    if conserved is None:
        conserved = conserved_fields(pressure, temperature, dewpoint)

    mixed = mixed_layer({'pressure': pressure, **conserved}, depth=depth)

    temp = mixed['theta'] * thermo.exner_function(parcel_start_pressure)
    vap = thermo.vapor_pressure(parcel_start_pressure, mixed['mixing_ratio'])
    dew = thermo.dewpoint(vap)
    return {'pressure': parcel_start_pressure, 'temperature': temp,
            'dewpoint': dew}


def most_unstable_parcel(pressure, temperature, dewpoint, depth=300.0):
    """The max-theta-e parcel in the surface-based layer of given depth;
    ties take the first (lowest) level
    (reference: modules/parcel_functions.py:102-135)."""
    layer = get_layer({'pressure': pressure, 'temperature': temperature,
                       'dewpoint': dewpoint}, depth=depth, interpolate=False)
    eq = thermo.equivalent_potential_temperature(
        layer['pressure'], layer['temperature'], layer['dewpoint'])
    max_eq = nanmax(eq)
    pres = nanmax(layer['pressure'], where=eq == max_eq[..., None])
    sel = layer['pressure'] == pres[..., None]
    return {k: nanmax(v, where=sel) for k, v in layer.items()}


def from_most_unstable_parcel(pressure, temperature, dewpoint, depth=300.0):
    """Subset columns to levels at/above the most unstable parcel
    (reference: modules/parcel_functions.py:1517-1555).

    Returns (fields dict with (…, L) NaN-masked columns, parcel dict).
    The reference left-shifts the subset so the parcel sits at index 0; here
    the sub-parcel prefix simply stays NaN — every downstream op (splice,
    crossing set, LFC/EL first-level rules, integration) is first-valid-
    index aware, and skipping the per-column shift network saves ~40
    full-field passes per solve.
    """
    parcel = most_unstable_parcel(pressure, temperature, dewpoint,
                                  depth=depth)
    keep = pressure <= parcel['pressure'][..., None]
    return {
        'pressure': jnp.where(keep, pressure, jnp.nan),
        'temperature': jnp.where(keep, temperature, jnp.nan),
        'dewpoint': jnp.where(keep, dewpoint, jnp.nan),
    }, parcel


def mix_layer(pressure, temperature, dewpoint, depth=100.0, conserved=None):
    """Replace the lowest ``depth`` hPa with the fully-mixed parcel as the
    new bottom level (reference: modules/parcel_functions.py:1604-1649).

    Returns (fields dict with (…, L+1) columns — a NaN prefix over the
    mixed-away levels, then the parcel, then the kept levels — and the mixed
    parcel dict).  The reference compacts the kept levels down to index 0;
    here the parcel is spliced in place via the leading-NaN-aware
    ``insert_level`` (one splice instead of a per-column shift network).
    ``conserved``: optional precomputed :func:`conserved_fields`.
    """
    pressure = jnp.asarray(pressure)
    mp = mixed_parcel(pressure, temperature, dewpoint, depth=depth,
                      conserved=conserved)

    keep = pressure < (nanmax(pressure) - depth)[..., None]
    masked = {
        'pressure': jnp.where(keep, pressure, jnp.nan),
        'temperature': jnp.where(keep, jnp.broadcast_to(temperature,
                                                        pressure.shape),
                                 jnp.nan),
        'dewpoint': jnp.where(keep, jnp.broadcast_to(dewpoint,
                                                     pressure.shape),
                              jnp.nan),
    }
    return insert_level(masked, mp), mp


def most_unstable_cape_cin(pressure, temperature, dewpoint, depth=300.0,
                           **kwargs):
    """CAPE/CIN for the most-unstable parcel in the lowest ``depth`` hPa
    (reference: modules/parcel_functions.py:1557-1602).

    Returns (cape_cin dict, profile dict, parcel dict).
    """
    fields, parcel = from_most_unstable_parcel(pressure, temperature,
                                               dewpoint, depth=depth)
    res, profile = cape_cin(fields['pressure'], fields['temperature'],
                            fields['dewpoint'],
                            parcel_temperature=parcel['temperature'],
                            parcel_pressure=parcel['pressure'],
                            parcel_dewpoint=parcel['dewpoint'], **kwargs)
    return res, profile, parcel


def mixed_layer_cape_cin(pressure, temperature, dewpoint, depth=100.0,
                         conserved=None, **kwargs):
    """CAPE/CIN for the fully-mixed lowest ``depth`` hPa parcel
    (reference: modules/parcel_functions.py:1651-1697).

    Returns (cape_cin dict, profile dict, parcel dict).
    """
    fields, mp = mix_layer(pressure, temperature, dewpoint, depth=depth,
                           conserved=conserved)
    res, profile = cape_cin(fields['pressure'], fields['temperature'],
                            fields['dewpoint'],
                            parcel_temperature=mp['temperature'],
                            parcel_pressure=mp['pressure'],
                            parcel_dewpoint=mp['dewpoint'], **kwargs)
    return res, profile, mp
