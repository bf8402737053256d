"""LFC/EL solver and CAPE/CIN integration.

TPU-native equivalents of the reference's convection solvers
(reference: modules/parcel_functions.py:1066-1515).  All selection logic is
expressed as NaN-aware masked reductions over the fixed-length crossing set,
reproducing the reference's rules exactly:

* LFC = bottom-most (highest-pressure) increasing parcel/environment crossing
  above the LCL, with USAF1990 LCL-substitution rules;
* EL = top-most (lowest-pressure) decreasing crossing, which must be above
  the LCL and requires the parcel to be colder than the environment at the
  top of the sounding;
* CAPE/CIN = Rd * trapezoid of (T_parcel - T_env) d ln p between LFC→EL and
  surface→LFC, with exact rectangle areas added around buoyancy
  zero-crossings and a gap mask preventing double counting;
* the virtual-temperature correction (reference's recommended default) picks
  the virtual-temperature track for both parcel and environment.
"""

import jax.numpy as jnp

from . import constants as c
from .ops import (find_intersections, nanmax, nanmin, nansum,
                  trap_around_zeros, trapz)
from .profile import parcel_profile_with_lcl


def lfc_el(pressure, parcel_temperature, temperature, lcl_pressure,
           lcl_temperature, intersections=None):
    """Level of free convection and equilibrium level.

    Inputs are (…, L) profile tracks (already including the LCL level when
    called from cape_cin) and (…) LCL state.  Returns dict with
    lfc_pressure/lfc_temperature/el_pressure/el_temperature
    (reference: modules/parcel_functions.py:1066-1198).
    ``intersections``: optional precomputed
    ``find_intersections(p, pt, t, log_x=True)`` (shared with the CAPE
    integrator by ``cape_cin``).
    """
    p = jnp.asarray(pressure)
    pt = jnp.asarray(parcel_temperature)
    t = jnp.asarray(temperature)
    p, pt, t = jnp.broadcast_arrays(p, pt, t)
    lcl_p = jnp.asarray(lcl_pressure)
    lcl_t = jnp.asarray(lcl_temperature)

    ints = (intersections if intersections is not None else
            find_intersections(p, pt, t, log_x=True))

    # Crossing set ignoring the first level: identical except gap 0 is
    # unavailable (reference recomputes on a slice and reindexes :1107-1112).
    def drop_first(d):
        out = {}
        for k, v in d.items():
            first_nan = jnp.full(v.shape[:-1] + (1,), jnp.nan, v.dtype)
            out[k] = jnp.concatenate([first_nan, v[..., 1:]], axis=-1)
        return out

    ints_above = drop_first(ints)

    # Where parcel and environment share the exact first-level value, use the
    # crossing set that ignores that point (reference :1114-1120).
    same_first = (t[..., 0] == pt[..., 0])[..., None]
    ints_sel = {k: jnp.where(same_first, ints_above[k], ints[k])
                for k in ints}

    # LFC: bottom-most increasing crossing above the LCL.
    above_lcl = ints_sel['increasing_x'] < lcl_p[..., None]
    lfc_p = nanmax(ints_sel['increasing_x'], where=above_lcl)
    lfc_t = nanmax(ints_sel['increasing_y'],
                   where=ints_sel['increasing_x'] == lfc_p[..., None])

    # EL: top-most decreasing crossing (always from the above-first set;
    # the temperature match must use the SAME set, else a gap-0 decreasing
    # crossing with same_first=False could match the wrong y).
    el_p = nanmin(ints_above['decreasing_x'])
    el_t = nanmax(ints_above['decreasing_y'],
                  where=ints_above['decreasing_x'] == el_p[..., None])

    # EL existence: parcel colder than environment at the top of the sounding
    # and EL above the LCL (reference :1141-1155).
    temps_available = ~jnp.isnan(pt) & ~jnp.isnan(t)
    top_p = nanmin(p, where=temps_available)
    at_top = p == top_p[..., None]
    top_prof = nanmax(pt, where=at_top)
    top_env = nanmax(t, where=at_top)
    el_exists = (top_prof <= top_env) & (el_p < lcl_p)
    el_p = jnp.where(el_exists, el_p, jnp.nan)
    el_t = jnp.where(el_exists, el_t, jnp.nan)

    # LCL substitution rules (USAF1990; reference :1160-1185).
    lfc_missing = jnp.isnan(nanmax(ints_sel['increasing_x']))
    above = p < lcl_p[..., None]
    # (pt > t is False for NaN pairs, so plain & matches the reference's
    # where().any(); boolean select ops do not lower inside Pallas.)
    pos_parcel = jnp.any(above & (pt > t), axis=-1)
    no_lfc_pos_parcel = pos_parcel & lfc_missing

    exists_but_na = ~lfc_missing & jnp.isnan(lfc_p)
    lfc_below_el_above = exists_but_na & (el_p < lcl_p)

    replace_with_lcl = no_lfc_pos_parcel | lfc_below_el_above
    lfc_p = jnp.where(replace_with_lcl, lcl_p, lfc_p)
    lfc_t = jnp.where(replace_with_lcl, lcl_t, lfc_t)

    return {'lfc_pressure': lfc_p, 'lfc_temperature': lfc_t,
            'el_pressure': el_p, 'el_temperature': el_t}


def cape_cin_base(pressure, temperature, lfc_pressure, el_pressure,
                  parcel_temperature, pos_cape_neg_cin=True,
                  post_zero_cin=False, intersections=None,
                  **unused_kwargs):
    """CAPE and CIN from a parcel track and LFC/EL pressures.

    (reference: modules/parcel_functions.py:1291-1392).  ``pos_cape_neg_cin``
    counts only positive (negative) buoyancy toward CAPE (CIN) — the
    reference's deliberate deviation from MetPy; ``post_zero_cin`` clamps
    positive CIN to zero (MetPy-style).
    """
    p = jnp.asarray(pressure)
    t = jnp.asarray(temperature)
    pt = jnp.asarray(parcel_temperature)
    p, t, pt = jnp.broadcast_arrays(p, t, pt)
    lfc_p = jnp.asarray(lfc_pressure)[..., None]

    # Missing EL -> top of sounding (reference :1329-1330).
    el = jnp.asarray(el_pressure)
    el_p = jnp.where(jnp.isnan(el), nanmin(p), el)[..., None]

    diff = pt - t
    log_p = jnp.log(p)

    areas, gap_mask = trap_around_zeros(p, diff, log_x=True, start=0,
                                        intersections=intersections)
    area_x = jnp.exp(areas['x'])
    area = areas['area']

    # CAPE: positive buoyancy between LFC and EL.
    in_cape = (p <= lfc_p) & (p >= el_p)
    diff_cape = jnp.where(in_cape, diff, jnp.nan)
    lp_cape = jnp.where(in_cape, log_p, jnp.nan)
    a_cape = (area_x <= lfc_p) & (area_x >= el_p)
    if pos_cape_neg_cin:
        a_cape = a_cape & (area > 0)
    cape = c.Rd * trapz(diff_cape, lp_cape, mask=gap_mask,
                        only_positive=pos_cape_neg_cin)
    cape = cape + c.Rd * nansum(area, where=a_cape)

    # CIN: negative buoyancy between surface and LFC.
    in_cin = p >= lfc_p
    diff_cin = jnp.where(in_cin, diff, jnp.nan)
    lp_cin = jnp.where(in_cin, log_p, jnp.nan)
    a_cin = area_x >= lfc_p
    if pos_cape_neg_cin:
        a_cin = a_cin & (area < 0)
    cin = c.Rd * trapz(diff_cin, lp_cin, mask=gap_mask,
                       only_negative=pos_cape_neg_cin)
    cin = cin + c.Rd * nansum(area, where=a_cin)

    if post_zero_cin:
        cin = jnp.where(cin <= 0, cin, 0.0)

    return {'cape': cape, 'cin': cin}


def cape_cin(pressure, temperature, dewpoint, parcel_temperature,
             parcel_pressure, parcel_dewpoint,
             virtual_temperature_correction=True, lcl_interp='log',
             tables=None, moist_lapse=None, **kwargs):
    """Full CAPE/CIN: profile with LCL -> LFC/EL -> integration.

    Returns (cape_cin dict, merged profile dict).  The virtual-temperature
    correction (default on, the reference's recommended deviation from MetPy
    <= 1.4.1; reference: modules/parcel_functions.py:1394-1475) runs the
    LFC/EL search and integration on the virtual-temperature tracks.
    """
    profile = parcel_profile_with_lcl(
        pressure, temperature, dewpoint, parcel_pressure,
        parcel_temperature, parcel_dewpoint, lcl_interp=lcl_interp,
        tables=tables, moist_lapse=moist_lapse)

    if virtual_temperature_correction:
        parcel_track = profile['virtual_temperature']
        env_track = profile['environment_virtual_temperature']
        lcl_track_t = profile['lcl_virtual_temperature']
    else:
        parcel_track = profile['temperature']
        env_track = profile['environment_temperature']
        lcl_track_t = profile['lcl_temperature']

    # One crossing set serves both the LFC/EL selection and the exact-area
    # integration (the curves are identical: zero crossings of
    # parcel - env are crossings of parcel vs env).
    pp, ptr, env = jnp.broadcast_arrays(profile['pressure'], parcel_track,
                                        env_track)
    ints = find_intersections(pp, ptr, env, log_x=True)
    sol = lfc_el(profile['pressure'], parcel_track, env_track,
                 profile['lcl_pressure'], lcl_track_t, intersections=ints)
    res = cape_cin_base(profile['pressure'], env_track,
                        sol['lfc_pressure'], sol['el_pressure'],
                        parcel_track, intersections=ints, **kwargs)
    merged = dict(profile)
    merged.update(sol)
    return res, merged


def surface_based_cape_cin(pressure, temperature, dewpoint, **kwargs):
    """CAPE/CIN for a parcel launched from the lowest level
    (reference: modules/parcel_functions.py:1477-1514)."""
    pressure = jnp.asarray(pressure)
    temperature = jnp.asarray(temperature)
    dewpoint = jnp.asarray(dewpoint)
    return cape_cin(pressure, temperature, dewpoint,
                    parcel_temperature=temperature[..., 0],
                    parcel_pressure=pressure[..., 0],
                    parcel_dewpoint=dewpoint[..., 0], **kwargs)
