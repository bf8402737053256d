"""Serial per-column CAPE/CIN oracle — the tier-2 integration-test reference.

Plays the role of the reference's MetPy-backed serial oracles
(reference: modules/parcel_test.py:68-248): an *independent* implementation
of the surface-based CAPE/CIN algorithm in plain NumPy + SciPy, computed one
column at a time with Python control flow.  Deliberately different numerics
from the vectorised library:

* moist lapse: ``scipy.integrate.solve_ivp`` (adaptive RK45) instead of the
  library's fixed-step ``lax.scan`` RK4;
* LCL: ``scipy.optimize.fixed_point`` instead of a fixed-count fori loop;
* profile/LFC/EL/CAPE: explicit per-column lists, ``np.insert`` and Python
  branch logic instead of fixed-shape masked reductions.

Shared with the library are only the physical formulas (Bolton e_s, the
pseudoadiabatic lapse rate, Poisson dry lapse, Doswell-Rasmussen virtual
temperature) — those *define* MetPy-1.4.1 semantics, which both sides must
implement.
"""

import numpy as np
from scipy.integrate import solve_ivp
from scipy.optimize import fixed_point

R = 8.314462618
Rd = R / 28.96546e-3
Rv = R / 18.015268e-3
Cp = 3.5 * Rd
kappa = Rd / Cp
eps = Rd / Rv
Lv = 2.50084e6
E0 = 6.112


def es(t):
    return E0 * np.exp(17.67 * (t - 273.15) / (t - 29.65))


def dewpoint_from_e(e):
    val = np.log(e / E0)
    return 273.15 + 243.5 * val / (17.67 - val)


def mixing_ratio_from_e(e, p):
    return eps * e / (p - e)


def sat_mixing_ratio(p, t):
    return mixing_ratio_from_e(es(t), p)


def mixing_ratio_rh_route(t, td, p):
    # MetPy 1.4.1 approximate RH route (w = RH * w_s), as the reference uses.
    return (es(td) / es(t)) * sat_mixing_ratio(p, t)


def virtual_temperature(t, w):
    return t * (1.0 + 0.608 * w)


def dry_lapse(p, t0, p0):
    return t0 * (p / p0) ** kappa


def moist_lapse_rate(p, t):
    rs = sat_mixing_ratio(p, t)
    return ((Rd * t + Lv * rs) /
            (Cp + (Lv * Lv * rs * eps / (Rd * t * t)))) / p


def moist_lapse(pressures, t0, p0):
    """Adaptive-step integration of the pseudoadiabat from (p0, t0) to each
    of ``pressures`` (descending)."""
    out = np.empty(len(pressures))
    t, p = float(t0), float(p0)
    for i, pk in enumerate(pressures):
        if pk != p:
            sol = solve_ivp(moist_lapse_rate, (p, pk), [t], method='RK45',
                            rtol=1e-10, atol=1e-10)
            t, p = float(sol.y[0, -1]), float(pk)
        out[i] = t
    return out


def lcl(p0, t0, td0):
    """MetPy-1.4.1 iterative LCL via scipy fixed_point."""
    w = mixing_ratio_from_e(es(td0), p0)

    def iterate(p):
        e = p * w / (eps + w)
        td = dewpoint_from_e(e)
        return p0 * (td / t0) ** (1.0 / kappa)

    lcl_p = float(fixed_point(iterate, p0, xtol=1e-9, maxiter=500))
    lcl_t = float(dewpoint_from_e(lcl_p * w / (eps + w)))
    return lcl_p, lcl_t


def log_interp_point(x, coords, at):
    """The reference's duplicate-aware log-pressure interpolation at a single
    target, serial form (reference: modules/parcel_functions.py:1758-1828)."""
    lc, lat = np.log(coords), np.log(at)
    above = lc[lc >= lat]
    below = lc[lc <= lat]
    if len(above) == 0 or len(below) == 0:
        return np.nan
    cb, ca = above.min(), below.max()
    xb = x[lc == cb].mean()
    xa = x[lc == ca].mean()
    if xb == xa:
        return xb
    return xb + (xa - xb) * (lat - cb) / (ca - cb)


def surface_cape_cin_column(pressure, temperature, dewpoint,
                            virtual_temperature_correction=True):
    """Surface-based CAPE/CIN for one column, fully serial.

    Mirrors the algorithm of reference: modules/parcel_functions.py
    (parcel_profile_with_lcl -> lfc_el -> cape_cin_base) with Python control
    flow.  Returns (cape, cin, lfc_pressure, el_pressure).
    """
    p = np.asarray(pressure, float)
    res = cape_cin_column(p, temperature, dewpoint,
                          p[0], np.asarray(temperature, float)[0],
                          np.asarray(dewpoint, float)[0],
                          virtual_temperature_correction)
    return res['cape'], res['cin'], res['lfc'], res['el']


def cape_cin_column(pressure, temperature, dewpoint, p0, t0, td0,
                    virtual_temperature_correction=True):
    """CAPE/CIN for one column and an arbitrary parcel (p0, t0, td0),
    fully serial.  The column must start at/above the parcel level (the
    caller slices/builds it, as the reference's subsetting wrappers do).

    Returns a dict with cape/cin/lfc/el plus the spliced profile tracks
    (``pp`` pressures, ``parcel_t`` real parcel temperatures, ``env_t``
    environment temperatures) for the lifted-index oracle.
    """
    p = np.asarray(pressure, float)
    t = np.asarray(temperature, float)
    td = np.asarray(dewpoint, float)
    p0, t0, td0 = float(p0), float(t0), float(td0)

    # --- parcel profile with LCL spliced in ---
    lcl_p, lcl_t = lcl(p0, t0, td0)
    prof = np.where(p >= lcl_p, dry_lapse(p, t0, p0),
                    moist_lapse(p, lcl_t, lcl_p))

    # insertion index: levels with coord >= new coord stay below
    k = int(np.sum(p >= lcl_p))
    pp = np.insert(p, k, lcl_p)
    prof = np.insert(prof, k, lcl_t)
    t_env = np.insert(t, k, log_interp_point(t, p, lcl_p))
    td_env = np.insert(td, k, log_interp_point(td, p, lcl_p))

    # virtual-temperature tracks
    w0 = mixing_ratio_rh_route(t0, td0, p0)
    # At the LCL slot itself (pp == lcl_p) the saturated branch applies
    # (the reference switches on pressure <= lcl_p,
    # reference: modules/parcel_functions.py:758-777).
    w_parcel = np.where(pp > lcl_p, w0, sat_mixing_ratio(pp, prof))
    prof_v = virtual_temperature(prof, w_parcel)
    env_v = virtual_temperature(t_env, mixing_ratio_rh_route(t_env, td_env,
                                                             pp))
    lcl_w = mixing_ratio_rh_route(lcl_t, lcl_t, lcl_p)
    lcl_vt = virtual_temperature(lcl_t, lcl_w)

    if virtual_temperature_correction:
        track_parcel, track_env, track_lcl_t = prof_v, env_v, lcl_vt
    else:
        track_parcel, track_env, track_lcl_t = prof, t_env, lcl_t

    # --- LFC / EL (reference :1066-1198) ---
    lx = np.log(pp)
    d = track_parcel - track_env
    crossings = []           # (log_p, direction) at the after-index level
    for i in range(len(pp) - 1):
        if np.sign(d[i]) != np.sign(d[i + 1]):
            cx = (d[i + 1] * lx[i] - d[i] * lx[i + 1]) / (d[i + 1] - d[i])
            crossings.append((np.exp(cx), np.sign(d[i + 1]), i))

    use = crossings
    if d[0] == 0.0:          # equal first level: ignore gap 0
        use = [c for c in crossings if c[2] >= 1]

    inc = [c[0] for c in use if c[1] > 0 and c[0] < lcl_p]
    lfc_p = max(inc) if inc else np.nan

    dec = [c[0] for c in crossings if c[2] >= 1 and c[1] < 0]
    el_p = min(dec) if dec else np.nan
    finite = ~np.isnan(track_parcel) & ~np.isnan(track_env)
    top = np.min(pp[finite])
    top_colder = (track_parcel[pp == top][-1] <= track_env[pp == top][-1])
    if not (top_colder and el_p < lcl_p):
        el_p = np.nan

    # LCL substitution rules
    any_inc = any(c[1] > 0 for c in use)
    above = pp < lcl_p
    pos_parcel = np.any(track_parcel[above] > track_env[above])
    if (not any_inc and pos_parcel) or \
       (any_inc and np.isnan(lfc_p) and el_p < lcl_p):
        lfc_p = lcl_p

    # --- CAPE/CIN (reference :1291-1392) ---
    el_eff = np.min(pp) if np.isnan(el_p) else el_p

    # zero-crossing rectangles (reference trap_around_zeros :1200-1289)
    rects = []               # (position_exp, area)
    gap_has_cross = np.zeros(len(pp) - 1, bool)
    for i in range(len(pp) - 1):
        if np.sign(d[i]) != np.sign(d[i + 1]) and np.isfinite(d[i]) and \
           np.isfinite(d[i + 1]):
            cx = (d[i + 1] * lx[i] - d[i] * lx[i + 1]) / (d[i + 1] - d[i])
            gap_has_cross[i] = True
            for xa, ya in ((lx[i], d[i]), (lx[i + 1], d[i + 1])):
                dxr = xa - cx
                rects.append((np.exp(xa - dxr / 2.0),
                              (ya / 2.0) * abs(dxr)))

    def trapz_between(p_hi, p_lo, positive=None):
        total = 0.0
        for i in range(len(pp) - 1):
            if gap_has_cross[i]:
                continue
            if pp[i] <= p_hi and pp[i + 1] >= p_lo:
                a = abs(lx[i + 1] - lx[i]) * 0.5 * (d[i] + d[i + 1])
                if np.isnan(a):
                    continue
                if positive is True and a <= 0:
                    continue
                if positive is False and a >= 0:
                    continue
                total += a
        return total

    profile = {'pp': pp, 'parcel_t': prof, 'env_t': t_env}
    if np.isnan(lfc_p):
        return {'cape': 0.0, 'cin': 0.0, 'lfc': lfc_p, 'el': el_p,
                **profile}

    cape = trapz_between(lfc_p, el_eff, positive=True)
    cape += sum(a for (x, a) in rects if el_eff <= x <= lfc_p and a > 0)
    cin = trapz_between(np.inf, lfc_p, positive=False)
    cin += sum(a for (x, a) in rects if x >= lfc_p and a < 0)
    return {'cape': Rd * cape, 'cin': Rd * cin, 'lfc': lfc_p, 'el': el_p,
            **profile}


# ---------------------------------------------------------------------------
# Extended serial oracles: the reference's full serial-vs-vector comparison
# set (reference: modules/parcel_test.py:276-414) — most-unstable and
# mixed-layer CAPE/CIN, lifted index, DCI, wet bulbs and shear, each computed
# one column at a time with Python control flow and scipy backends.
# ---------------------------------------------------------------------------

P0_REF = 1000.0


def theta_e_bolton(p, t, td):
    """Bolton (1980) equivalent potential temperature, MetPy-1.4.1 form."""
    e = es(td)
    r = mixing_ratio_from_e(e, p)
    t_l = 56.0 + 1.0 / (1.0 / (td - 56.0) + np.log(t / td) / 800.0)
    th_l = t * (P0_REF / (p - e)) ** kappa * (t / t_l) ** (0.28 * r)
    return th_l * np.exp(r * (1.0 + 0.448 * r) * (3036.0 / t_l - 1.78))


def linear_interp_point(x, coords, at):
    """Duplicate-aware single-target linear interpolation, serial form
    (reference: modules/parcel_functions.py:1758-1811)."""
    above = coords[coords >= at]
    below = coords[coords <= at]
    if len(above) == 0 or len(below) == 0:
        return np.nan
    cb, ca = above.min(), below.max()
    xb = x[coords == cb].mean()
    xa = x[coords == ca].mean()
    if xb == xa:
        return xb
    return xb + (xa - xb) * (at - cb) / (ca - cb)


def most_unstable_index(p, t, td, depth=300.0):
    """Index of the max-theta-e level in the surface-based layer (ties take
    the lowest level; non-interpolated layer top snaps to the nearest
    level, ties to larger pressure — reference :102-135, :208-227)."""
    bottom = np.nanmax(p)
    target = bottom - depth
    diffs = np.abs(p - target)
    top = p[diffs == np.nanmin(diffs)].max()
    sel = (p <= bottom) & (p >= top)
    eq = np.where(sel, theta_e_bolton(p, t, td), np.nan)
    cands = sel & (eq == np.nanmax(eq))
    return int(np.argmax(cands))      # first True = largest pressure


def most_unstable_cape_cin_column(p, t, td, depth=300.0,
                                  virtual_temperature_correction=True):
    """Serial most-unstable CAPE/CIN: subset the column at/above the
    max-theta-e parcel, launch from it (reference :1517-1602)."""
    p = np.asarray(p, float)
    t = np.asarray(t, float)
    td = np.asarray(td, float)
    k = most_unstable_index(p, t, td, depth=depth)
    res = cape_cin_column(p[k:], t[k:], td[k:], p[k], t[k], td[k],
                          virtual_temperature_correction)
    res['parcel_pressure'] = p[k]
    res['parcel_dewpoint'] = td[k]
    return res


def mixed_parcel_column(p, t, td, depth=100.0):
    """Serial fully-mixed parcel: mass-weighted theta / mixing-ratio means
    over the surface layer (interpolated top), evaluated at the surface
    pressure (reference :137-162, :229-289)."""
    p = np.asarray(p, float)
    theta = t * (P0_REF / p) ** kappa
    w = sat_mixing_ratio(p, td)       # conserved: w_s at the dewpoint
    bottom = np.nanmax(p)
    top = bottom - depth

    theta_top = log_interp_point(theta, p, top)
    w_top = log_interp_point(w, p, top)
    sel = (p <= bottom) & (p >= top)
    pl = np.concatenate([p[sel], [top]])
    thetal = np.concatenate([theta[sel], [theta_top]])
    wl = np.concatenate([w[sel], [w_top]])

    def mixed(v):
        total = 0.0
        for i in range(len(pl) - 1):
            total += 0.5 * (v[i] + v[i + 1]) * abs(pl[i + 1] - pl[i])
        return total / (pl.max() - pl.min())

    p0 = p[0]
    temp = mixed(thetal) * (p0 / P0_REF) ** kappa
    wm = mixed(wl)
    vap = p0 * wm / (eps + wm)
    return p0, temp, dewpoint_from_e(vap)


def mixed_layer_cape_cin_column(p, t, td, depth=100.0,
                                virtual_temperature_correction=True):
    """Serial mixed-layer CAPE/CIN: the mixed parcel replaces the lowest
    ``depth`` hPa as the new bottom level (reference :1604-1697)."""
    p = np.asarray(p, float)
    t = np.asarray(t, float)
    td = np.asarray(td, float)
    p0, mt, mtd = mixed_parcel_column(p, t, td, depth=depth)
    keep = p < (np.nanmax(p) - depth)
    pp = np.concatenate([[p0], p[keep]])
    tt = np.concatenate([[mt], t[keep]])
    tdd = np.concatenate([[mtd], td[keep]])
    res = cape_cin_column(pp, tt, tdd, p0, mt, mtd,
                          virtual_temperature_correction)
    res['parcel_pressure'] = p0
    res['parcel_dewpoint'] = mtd
    return res


def lifted_index_column(profile):
    """Galway lifted index from a spliced serial profile
    (reference :1722-1756)."""
    return (log_interp_point(profile['env_t'], profile['pp'], 500.0) -
            log_interp_point(profile['parcel_t'], profile['pp'], 500.0))


def dci_column(p, t, td, lifted_index):
    """Kunz DCI from the original column (reference :1830-1870)."""
    t850 = log_interp_point(np.asarray(t, float), np.asarray(p, float),
                            850.0)
    td850 = log_interp_point(np.asarray(td, float), np.asarray(p, float),
                             850.0)
    return (t850 - 273.15) + (td850 - 273.15) - lifted_index


def wet_bulb_exact_point(p, t, td):
    """Exact wet bulb for one (p, T, Td) point: lift dry to the LCL, bring
    back moist (Normand's rule; reference :389-445)."""
    lcl_p, lcl_t = lcl(p, t, td)
    return moist_lapse(np.array([p]), lcl_t, lcl_p)[0]


def wet_bulb_fast_point(t, td):
    """Knox one-third rule (reference :364-387)."""
    return t - (t - td) / 3.0


def wind_shear_column(su, sv, wu, wv, height, shear_height=6000.0):
    """Bulk shear between the surface wind and the wind linearly
    interpolated at ``shear_height`` (reference :2216-2259)."""
    hu = linear_interp_point(np.asarray(wu, float),
                             np.asarray(height, float), shear_height)
    hv = linear_interp_point(np.asarray(wv, float),
                             np.asarray(height, float), shear_height)
    du, dv = hu - su, hv - sv
    return {'shear_u': du, 'shear_v': dv,
            'shear_magnitude': np.hypot(du, dv),
            'positive_shear': bool(np.hypot(hu, hv) > np.hypot(su, sv))}


def lapse_rate_column(p, t, h, from_p=700.0, to_p=500.0):
    """Environmental lapse rate [K/km] between two isobars
    (reference :2102-2135)."""
    p = np.asarray(p, float)
    t_from = log_interp_point(np.asarray(t, float), p, from_p)
    h_from = log_interp_point(np.asarray(h, float), p, from_p)
    t_to = log_interp_point(np.asarray(t, float), p, to_p)
    h_to = log_interp_point(np.asarray(h, float), p, to_p)
    return (t_to - t_from) / ((h_to - h_from) / 1000.0)


def isobar_temperature_column(p, t, isobar=500.0):
    """Temperature at an isobar (reference :2193-2214)."""
    return log_interp_point(np.asarray(t, float), np.asarray(p, float),
                            isobar)


def freezing_level_height_column(t, h):
    """Height of the lowest 0 C crossing of ``t`` against ``h``
    (reference :2137-2160): linear crossing position in each sign-change
    gap, minimum over gaps."""
    t = np.asarray(t, float)
    h = np.asarray(h, float)
    d = t - 273.15
    xs = []
    for i in range(len(t) - 1):
        if np.sign(d[i]) != np.sign(d[i + 1]) and np.isfinite(d[i]) and \
           np.isfinite(d[i + 1]):
            xs.append((d[i + 1] * h[i] - d[i] * h[i + 1]) /
                      (d[i + 1] - d[i]))
    return min(xs) if xs else np.nan


def melting_level_height_fast_column(t, td, h):
    """Height of the 0 C fast-wet-bulb isotherm (reference :2162-2191)."""
    wb = np.asarray(t, float) - (np.asarray(t, float) -
                                 np.asarray(td, float)) / 3.0
    return freezing_level_height_column(wb, np.asarray(h, float))
