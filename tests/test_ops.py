"""Unit tests for the vertical-column ops layer (reference L2 equivalents)."""

import jax
import jax.numpy as jnp
import numpy as np
from numpy.testing import assert_almost_equal, assert_array_almost_equal

from xarray_parcel_tpu import ops


def test_nan_reductions():
    x = jnp.array([[1.0, jnp.nan, 3.0], [jnp.nan, jnp.nan, jnp.nan]])
    assert_array_almost_equal(np.asarray(ops.nanmax(x)), [3.0, np.nan])
    assert_array_almost_equal(np.asarray(ops.nanmin(x)), [1.0, np.nan])
    assert_array_almost_equal(np.asarray(ops.nansum(x)), [4.0, 0.0])
    assert_array_almost_equal(np.asarray(ops.nanmean(x)), [2.0, np.nan])
    w = jnp.array([[True, True, False], [True, True, True]])
    assert_array_almost_equal(np.asarray(ops.nanmax(x, where=w)),
                              [1.0, np.nan])


def test_linear_interp_basic_and_duplicates():
    coords = jnp.array([1000.0, 900.0, 800.0, 700.0])
    x = jnp.array([10.0, 20.0, 30.0, 40.0])
    assert_almost_equal(float(ops.linear_interp(x, coords, 850.0)), 25.0, 10)
    # Exact match passes through.
    assert_almost_equal(float(ops.linear_interp(x, coords, 800.0)), 30.0, 10)
    # Duplicate coords average their values.
    coords2 = jnp.array([1000.0, 900.0, 900.0, 700.0])
    x2 = jnp.array([10.0, 20.0, 40.0, 50.0])
    assert_almost_equal(float(ops.linear_interp(x2, coords2, 800.0)),
                        (30.0 + 50.0) / 2.0, 10)
    # Out of range -> NaN without extrapolation.
    assert np.isnan(float(ops.linear_interp(x, coords, 1100.0)))
    # With extrapolation: line through the two largest coords.
    assert_almost_equal(float(ops.linear_interp(x, coords, 1100.0,
                                                extrapolate=True)), 0.0, 10)
    assert_almost_equal(float(ops.linear_interp(x, coords, 600.0,
                                                extrapolate=True)), 50.0, 10)


def test_log_interp_matches_log_space():
    coords = jnp.array([1000.0, 500.0])
    x = jnp.array([0.0, 1.0])
    got = float(ops.log_interp(x, coords, 700.0))
    want = (np.log(700.0) - np.log(1000.0)) / (np.log(500.0) - np.log(1000.0))
    assert_almost_equal(got, want, 10)


def test_interp1d_matches_numpy():
    rng = np.random.default_rng(0)
    xp = np.sort(rng.uniform(0, 10, size=(5, 32)), axis=-1)
    fp = rng.normal(size=(5, 32))
    at = rng.uniform(-1, 11, size=(5, 7))
    got = np.asarray(ops.interp1d(jnp.array(at), jnp.array(xp), jnp.array(fp)))
    want = np.stack([np.interp(at[i], xp[i], fp[i]) for i in range(5)])
    assert_array_almost_equal(got, want, 12)


def test_find_intersections_linear():
    # a = x, b = 4 - x cross at x = 2, y = 2 (increasing crossing of a over b).
    x = jnp.array([0.0, 1.0, 3.0, 4.0])
    a = x
    b = 4.0 - x
    ints = ops.find_intersections(x, a, b)
    ix = np.asarray(ints['all_x'])
    iy = np.asarray(ints['all_y'])
    assert_array_almost_equal(ix, [np.nan, 2.0, np.nan])
    assert_array_almost_equal(iy, [np.nan, 2.0, np.nan])
    assert_array_almost_equal(np.asarray(ints['increasing_x']),
                              [np.nan, 2.0, np.nan])
    assert np.all(np.isnan(np.asarray(ints['decreasing_x'])))


def test_find_intersections_log():
    # In log-x space: a - b linear in log x, crossing at log x = mid.
    x = jnp.array([100.0, 10.0, 1.0])
    a = jnp.array([1.0, -1.0, -3.0])
    b = jnp.zeros(3)
    ints = ops.find_intersections(x, a, b, log_x=True)
    ix = np.asarray(ints['all_x'])
    # crossing halfway in log space between 100 and 10 -> sqrt(1000)
    assert_almost_equal(ix[0], np.sqrt(1000.0), 8)
    assert np.isnan(ix[1])


def test_trapz_and_masks():
    x = jnp.array([0.0, 1.0, 2.0, 3.0])
    y = jnp.array([0.0, 1.0, -1.0, 2.0])
    # full trapezoid: .5*(0+1) + .5*(1-1) + .5*(-1+2) = 1.0
    assert_almost_equal(float(ops.trapz(y, x)), 1.0, 12)
    mask = jnp.array([True, False, True])
    assert_almost_equal(float(ops.trapz(y, x, mask=mask)), 1.0, 12)
    assert_almost_equal(float(ops.trapz(y, x, only_positive=True)), 1.0, 12)
    assert_almost_equal(float(ops.trapz(y, x, only_negative=True)), 0.0, 12)
    # NaN gap skipped
    y2 = jnp.array([0.0, jnp.nan, -1.0, 2.0])
    assert_almost_equal(float(ops.trapz(y2, x)), 0.5, 12)


def test_gap_areas_window_selection_matches_masked_trapz():
    # The equivalence cape_cin_base relies on: selecting gaps whose BOTH
    # endpoints lie in a window over precomputed gap areas equals running
    # trapz on NaN-masked track copies.
    rng = np.random.default_rng(3)
    x = jnp.asarray(np.sort(rng.uniform(0, 10, (5, 12)), axis=-1))
    y = jnp.asarray(rng.normal(0, 2, (5, 12)))
    y = y.at[0, 3].set(jnp.nan).at[2, 0].set(jnp.nan)
    lo_w, hi_w = 2.0, 8.0
    in_win = (x >= lo_w) & (x <= hi_w)

    areas, valid = ops.gap_areas(y, x)
    assert np.all(np.isfinite(np.asarray(areas)))  # invalid gaps -> 0, not NaN
    assert not bool(valid[0, 2]) and not bool(valid[0, 3])
    win_gap = in_win[:, :-1] & in_win[:, 1:]
    for kw in ({}, {'only_positive': True}, {'only_negative': True}):
        got = ops.select_areas(areas, valid & win_gap, **kw)
        want = ops.trapz(jnp.where(in_win, y, jnp.nan),
                         jnp.where(in_win, x, jnp.nan), **kw)
        assert_array_almost_equal(np.asarray(got), np.asarray(want), 12)
    # trapz == gap_areas + select_areas by construction
    assert_array_almost_equal(
        np.asarray(ops.select_areas(areas, valid)),
        np.asarray(ops.trapz(y, x)), 12)


def test_trap_around_zeros_rectangles():
    # y crosses zero between x=1 (y=1) and x=2 (y=-1) at x=1.5.
    x = jnp.array([0.0, 1.0, 2.0, 3.0])
    y = jnp.array([1.0, 1.0, -1.0, -1.0])
    areas, gap_mask = ops.trap_around_zeros(x, y, log_x=False)
    area = np.asarray(areas['area'])
    pos = np.asarray(areas['x'])
    # Before rectangle: height y/2 = .5, width |1 - 1.5| = .5 -> .25 at x 1.25
    # After rectangle: height -.5, width .5 -> -.25 at x 1.75
    valid = ~np.isnan(area)
    assert valid.sum() == 2
    assert_array_almost_equal(np.sort(area[valid]), [-0.25, 0.25], 12)
    assert_array_almost_equal(np.sort(pos[valid]), [1.25, 1.75], 12)
    assert_array_almost_equal(np.asarray(gap_mask), [True, False, True])


def test_insert_level_golden():
    # reference: modules/unit_tests.py:1388-1411 (test_insert_level)
    fields = {
        'pressure': jnp.array([[1000.0, 900.0, 800.0, 700.0],
                               [1000.0, 900.0, 800.0, 700.0]]),
        'temperature': jnp.ones((2, 4)),
    }
    level = {'pressure': jnp.array([1000.0, 600.0]),
             'temperature': jnp.array([1.5, 2.0])}
    res = ops.insert_level(fields, level)
    assert_array_almost_equal(np.asarray(res['pressure']),
                              [[1000, 1000, 900, 800, 700],
                               [1000, 900, 800, 700, 600]])
    assert_array_almost_equal(np.asarray(res['temperature']),
                              [[1, 1.5, 1, 1, 1], [1, 1, 1, 1, 2]])


def test_insert_level_nan_handling():
    fields = {
        'pressure': jnp.array([1000.0, 900.0, jnp.nan, jnp.nan]),
        'temperature': jnp.array([1.0, 2.0, 3.0, 4.0]),
    }
    level = {'pressure': 950.0, 'temperature': 9.0}
    res = ops.insert_level(fields, level)
    assert_array_almost_equal(np.asarray(res['pressure']),
                              [1000.0, 950.0, 900.0, np.nan, np.nan])
    # values at NaN-pressure slots are NaN'd (fill round-trip semantics)
    assert_array_almost_equal(np.asarray(res['temperature']),
                              [1.0, 9.0, 2.0, np.nan, np.nan])
    # NaN insertion coord floods with level values
    res2 = ops.insert_level(fields, {'pressure': jnp.nan,
                                     'temperature': jnp.nan})
    assert np.all(np.isnan(np.asarray(res2['pressure'])))
    assert np.all(np.isnan(np.asarray(res2['temperature'])))


def test_insert_level_interior_nan_stays_sorted():
    # An interior NaN-pressure slot must not shift the insertion short:
    # the new level lands one past the LAST valid level >= it, keeping the
    # VALID subsequence descending (an unsorted splice double-counts the
    # inverted span in the downstream area integration).
    fields = {
        'pressure': jnp.array([1000.0, jnp.nan, 900.0, 800.0]),
        'temperature': jnp.array([1.0, jnp.nan, 3.0, 4.0]),
    }
    res = ops.insert_level(fields, {'pressure': 850.0, 'temperature': 9.0})
    assert_array_almost_equal(np.asarray(res['pressure']),
                              [1000.0, np.nan, 900.0, 850.0, 800.0])
    assert_array_almost_equal(np.asarray(res['temperature']),
                              [1.0, np.nan, 3.0, 9.0, 4.0])
    # Insertion above the interior NaN keeps it in place too.
    res2 = ops.insert_level(fields, {'pressure': 950.0, 'temperature': 9.0})
    assert_array_almost_equal(np.asarray(res2['pressure']),
                              [1000.0, 950.0, np.nan, 900.0, 800.0])


def test_compact_left():
    fields = {
        'pressure': jnp.array([[jnp.nan, jnp.nan, 800.0, 700.0],
                               [1000.0, 900.0, 800.0, 700.0]]),
        'temperature': jnp.array([[jnp.nan, jnp.nan, 3.0, 4.0],
                                  [1.0, 2.0, 3.0, 4.0]]),
    }
    out = ops.compact_left(fields, 'pressure')
    assert_array_almost_equal(np.asarray(out['pressure']),
                              [[800, 700, np.nan, np.nan],
                               [1000, 900, 800, 700]])
    assert_array_almost_equal(np.asarray(out['temperature']),
                              [[3, 4, np.nan, np.nan], [1, 2, 3, 4]])


def test_bound_pressure():
    p = jnp.array([1000.0, 900.0, 800.0, 700.0])
    assert_almost_equal(float(ops.bound_pressure(p, 850.0)), 900.0, 12)  # tie -> larger
    assert_almost_equal(float(ops.bound_pressure(p, 840.0)), 800.0, 12)
    assert_almost_equal(float(ops.bound_pressure(p, 860.0)), 900.0, 12)


def test_get_layer():
    fields = {'pressure': jnp.array([1000.0, 900.0, 800.0, 700.0]),
              'temperature': jnp.array([20.0, 15.0, 10.0, 5.0])}
    layer = ops.get_layer(fields, depth=150.0)
    p = np.asarray(layer['pressure'])
    t = np.asarray(layer['temperature'])
    # inserted top at 850 hPa, levels below 850 NaN-masked
    assert_array_almost_equal(p, [1000.0, 900.0, 850.0, np.nan, np.nan])
    assert_almost_equal(t[2],
                        15.0 - 5.0 * (np.log(850/900) / np.log(800/900)), 10)
    # no-interpolation variant snaps to the nearest level
    layer2 = ops.get_layer(fields, depth=160.0, interpolate=False)
    assert_array_almost_equal(np.asarray(layer2['pressure']),
                              [1000.0, 900.0, 800.0, np.nan])


def test_ops_jit_and_vmap():
    x = jnp.linspace(0.0, 3.0, 4)
    y = jnp.array([1.0, 1.0, -1.0, -1.0])

    @jax.jit
    def f(x, y):
        areas, mask = ops.trap_around_zeros(x, y, log_x=False)
        return ops.nansum(areas['area']) + ops.trapz(y, x, mask=mask)

    batch = jax.vmap(f, in_axes=(None, 0))(x, jnp.stack([y, -y]))
    assert batch.shape == (2,)
    assert_almost_equal(float(f(x, y)), float(batch[0]), 12)


def test_api_dry_lapse_nan_padded_column():
    # Default parcel pressure must skip NaN padding (reference .max(dim)).
    from xarray_parcel_tpu import api
    p = jnp.array([1000., 900., 800., jnp.nan])
    out = np.asarray(api.dry_lapse(p, 300.0))
    assert not np.isnan(out[:3]).any() and np.isnan(out[3])
    assert abs(out[0] - 300.0) < 1e-6


def test_insert_level_leading_nans():
    # Masked sub-parcel prefix: the splice offsets past leading NaNs so the
    # column stays sorted (parcels.py's uncompacted subset columns).
    fields = {
        'pressure': jnp.array([jnp.nan, jnp.nan, 900.0, 800.0, 700.0]),
        'temperature': jnp.array([jnp.nan, jnp.nan, 2.0, 3.0, 4.0]),
    }
    res = ops.insert_level(fields, {'pressure': 850.0, 'temperature': 9.0})
    assert_array_almost_equal(
        np.asarray(res['pressure']),
        [np.nan, np.nan, 900.0, 850.0, 800.0, 700.0])
    assert_array_almost_equal(
        np.asarray(res['temperature']),
        [np.nan, np.nan, 2.0, 9.0, 3.0, 4.0])
    # Insertion below every kept level lands right after the NaN prefix.
    res2 = ops.insert_level(fields, {'pressure': 950.0, 'temperature': 8.0})
    assert_array_almost_equal(
        np.asarray(res2['pressure']),
        [np.nan, np.nan, 950.0, 900.0, 800.0, 700.0])


def test_masked_prefix_solve_equals_compacted():
    # The uncompacted (leading-NaN) parcel subset must solve identically to
    # the reference-style left-compacted form: first-valid-index semantics
    # in lfc_el/insert_level replace the per-column shift network.
    from xarray_parcel_tpu import adiabat, cape
    tables = adiabat.load_moist_adiabat_lookups()
    levels = jnp.array([959., 931.3, 779.2, 751.3, 724.3, 700., 269.])
    temps = jnp.array([22.2, 20.9, 14.6, 12., 9.4, 7., -38.]) + 273.15
    dews = jnp.array([19., 18.1, -11.2, -10.8, -10.4, -10., -53.2]) + 273.15

    # Parcel launched from level 2; mask out the two levels below it.
    keep = jnp.arange(levels.shape[0]) >= 2
    masked = {k: jnp.where(keep, v, jnp.nan)
              for k, v in (('pressure', levels), ('temperature', temps),
                           ('dewpoint', dews))}
    compacted = ops.compact_left(masked, 'pressure')

    kwargs = dict(parcel_pressure=levels[2], parcel_temperature=temps[2],
                  parcel_dewpoint=dews[2], tables=tables)
    res_m, sol_m = cape.cape_cin(masked['pressure'], masked['temperature'],
                                 masked['dewpoint'], **kwargs)
    res_c, sol_c = cape.cape_cin(compacted['pressure'],
                                 compacted['temperature'],
                                 compacted['dewpoint'], **kwargs)
    for k in ('cape', 'cin'):
        assert_array_almost_equal(np.asarray(res_m[k]), np.asarray(res_c[k]),
                                  6)
    for k in ('lfc_pressure', 'el_pressure', 'lfc_temperature',
              'el_temperature'):
        assert_array_almost_equal(np.asarray(sol_m[k]), np.asarray(sol_c[k]),
                                  6)


def test_axis0_ops_match_axis_minus1():
    """Every column op is axis-general: running it with the level axis
    leading (the fused kernel's columns-on-lanes layout) must reproduce the
    default trailing-axis results exactly."""
    import jax.numpy as jnp
    from xarray_parcel_tpu.ops import (find_intersections, insert_level,
                                       interp_many, trap_around_zeros,
                                       trapz)

    rng = np.random.default_rng(21)
    B, L = 12, 24
    p = -np.sort(-(np.linspace(1000.0, 200.0, L)[None, :] +
                   rng.normal(0, 1, (B, L))), axis=-1)
    a = 280.0 + rng.normal(0, 8, (B, L))
    b = 280.0 + rng.normal(0, 8, (B, L))
    p[2, :3] = np.nan                       # leading-NaN prefix
    a[5, -2] = np.nan
    pj, aj, bj = jnp.asarray(p), jnp.asarray(a), jnp.asarray(b)
    pt, at_, bt = pj.T, aj.T, bj.T

    def eq(x, y, msg):
        x, y = np.asarray(x), np.asarray(y)
        np.testing.assert_array_equal(np.isnan(x), np.isnan(y),
                                      err_msg=f'NaN: {msg}')
        np.testing.assert_allclose(np.nan_to_num(x), np.nan_to_num(y),
                                   atol=1e-12, err_msg=msg)

    i0 = find_intersections(pj, aj, bj, log_x=True)
    i1 = find_intersections(pt, at_, bt, log_x=True, axis=0)
    for k in i0:
        eq(i0[k], i1[k].T, f'find_intersections {k}')

    at_target = jnp.asarray(850.0 + rng.normal(0, 5, (B,)))
    m0 = interp_many((aj, bj), pj, at_target, log=True)
    m1 = interp_many((at_, bt), pt, at_target, log=True, axis=0)
    eq(m0[0], m1[0], 'interp_many a')
    eq(m0[1], m1[1], 'interp_many b')

    lvl_p = jnp.asarray(900.0 + rng.normal(0, 5, (B,)))
    lvl_a = jnp.asarray(285.0 + rng.normal(0, 2, (B,)))
    f0 = insert_level({'pressure': pj, 'a': aj},
                      {'pressure': lvl_p, 'a': lvl_a})
    f1 = insert_level({'pressure': pt, 'a': at_},
                      {'pressure': lvl_p, 'a': lvl_a}, axis=0)
    eq(f0['pressure'], f1['pressure'].T, 'insert_level pressure')
    eq(f0['a'], f1['a'].T, 'insert_level a')

    y = aj - bj
    t0 = trapz(y, jnp.log(pj))
    t1 = trapz(y.T, jnp.log(pt), axis=0)
    eq(t0, t1, 'trapz')

    ar0, gm0 = trap_around_zeros(pj, y, log_x=True)
    ar1, gm1 = trap_around_zeros(pt, y.T, log_x=True, axis=0)
    for k in ar0:
        eq(ar0[k], ar1[k].T, f'trap_around_zeros {k}')
    np.testing.assert_array_equal(np.asarray(gm0), np.asarray(gm1).T)


def test_axis0_cape_solvers_match():
    import jax.numpy as jnp
    from xarray_parcel_tpu.cape import cape_cin_base, lfc_el

    rng = np.random.default_rng(22)
    B, L = 10, 30
    p = -np.sort(-(np.linspace(1005.0, 250.0, L)[None, :] +
                   rng.normal(0, 1, (B, L))), axis=-1)
    t = 300.0 - 72.0 * (1.0 - (p / 1005.0) ** 0.3) + rng.normal(
        0, 1.5, (B, L))
    pt_track = t + rng.normal(1.0, 2.0, (B, L))
    lcl_p = np.full((B,), 940.0) + rng.normal(0, 5, (B,))
    lcl_t = 292.0 + rng.normal(0, 2, (B,))
    args0 = (jnp.asarray(p), jnp.asarray(pt_track), jnp.asarray(t),
             jnp.asarray(lcl_p), jnp.asarray(lcl_t))
    argsT = (args0[0].T, args0[1].T, args0[2].T, args0[3], args0[4])

    s0 = lfc_el(*args0)
    s1 = lfc_el(*argsT, axis=0)
    for k in s0:
        a, b = np.asarray(s0[k]), np.asarray(s1[k])
        np.testing.assert_array_equal(np.isnan(a), np.isnan(b), err_msg=k)
        np.testing.assert_allclose(np.nan_to_num(a), np.nan_to_num(b),
                                   atol=1e-12, err_msg=k)

    r0 = cape_cin_base(args0[0], args0[2], s0['lfc_pressure'],
                       s0['el_pressure'], args0[1])
    r1 = cape_cin_base(argsT[0], argsT[2], s1['lfc_pressure'],
                       s1['el_pressure'], argsT[1], axis=0)
    for k in r0:
        np.testing.assert_allclose(np.asarray(r0[k]), np.asarray(r1[k]),
                                   atol=1e-9, err_msg=k)


def test_notnan_matches_isnan_complement():
    # notnan(x) = (x == x) must equal ~isnan for every IEEE class.
    import numpy as np
    from xarray_parcel_tpu.ops import notnan
    x = jnp.array([0.0, -0.0, 1.5, -1e38, jnp.inf, -jnp.inf, jnp.nan])
    np.testing.assert_array_equal(np.asarray(notnan(x)),
                                  ~np.isnan(np.asarray(x)))
