"""Thermodynamic formula tests against MetPy-1.4.1-derived truths.

Truth values are taken from the reference's golden tests
(reference: modules/unit_tests.py, themselves ported from MetPy's
test_thermo.py) and from scipy-independent closed-form checks.
"""

import numpy as np
from numpy.testing import assert_almost_equal, assert_array_almost_equal

from xarray_parcel_tpu import constants as c
from xarray_parcel_tpu import thermo


def test_constants():
    assert_almost_equal(c.Rd, 287.047490977, 6)
    assert_almost_equal(c.kappa, 2.0 / 7.0, 15)
    assert_almost_equal(c.epsilon, 0.6219569100577033, 12)


def test_dry_lapse():
    # reference: modules/unit_tests.py:154-158
    levels = np.array([1000.0, 900.0, 864.89])
    temps = thermo.dry_lapse(levels, 303.15, 1000.0)
    assert_array_almost_equal(np.asarray(temps),
                              np.array([303.15, 294.16, 290.83]), 2)


def test_dry_lapse_2_levels():
    # reference: modules/unit_tests.py:160-164 — pins kappa = 2/7 exactly.
    temps = thermo.dry_lapse(np.array([1000.0, 500.0]), 293.0, 1000.0)
    assert_array_almost_equal(np.asarray(temps), [293.0, 240.3583], 4)


def test_saturation_vapor_pressure():
    # Bolton: e_s(273.15 K) = 6.112 hPa by construction.
    assert_almost_equal(float(thermo.saturation_vapor_pressure(273.15)),
                        6.112, 10)
    # MetPy test_thermo truth: e_s(25 C) ~ 31.7 hPa
    assert_almost_equal(float(thermo.saturation_vapor_pressure(298.15)),
                        31.7, 1)


def test_dewpoint_roundtrip():
    t = np.linspace(233.15, 313.15, 9)
    e = thermo.saturation_vapor_pressure(t)
    assert_array_almost_equal(np.asarray(thermo.dewpoint(e)), t, 9)


def test_mixing_ratio_and_vapor_pressure_roundtrip():
    p, t = 850.0, 288.15
    ws = thermo.saturation_mixing_ratio(p, t)
    e = thermo.vapor_pressure(p, ws)
    assert_almost_equal(float(e), float(thermo.saturation_vapor_pressure(t)), 10)


def test_potential_temperature_exner():
    theta = thermo.potential_temperature(900.0, 293.0)
    back = theta * thermo.exner_function(900.0)
    assert_almost_equal(float(back), 293.0, 10)
    # MetPy truth: theta(800 hPa, 273 K) = 290.96 K
    assert_almost_equal(float(thermo.potential_temperature(800.0, 273.0)),
                        290.96, 2)


def test_virtual_temperature():
    # Doswell-Rasmussen form with the reference's default epsilon = 0.608.
    assert_almost_equal(float(thermo.virtual_temperature(300.0, 0.01)),
                        300.0 * 1.00608, 10)


def test_equivalent_potential_temperature():
    # MetPy golden truth: theta_e(1000 hPa, 293 K, Td 280 K) = 311.18586 K,
    # asserted at MetPy's own 3-decimal tolerance.
    the = thermo.equivalent_potential_temperature(1000.0, 293.0, 280.0)
    assert_almost_equal(float(the), 311.18586467284007, 3)


def test_specific_humidity_chain_roundtrip():
    q = 0.012
    w = thermo.mixing_ratio_from_specific_humidity(q)
    assert_almost_equal(float(thermo.specific_humidity_from_mixing_ratio(w)),
                        q, 12)


def test_dewpoint_from_specific_humidity():
    # MetPy 1.4.1 truth: Td(1013.25 hPa, 20 C, q=0.012) ~ 16.973 C (approx RH
    # route; later MetPy versions differ slightly).
    td = thermo.dewpoint_from_specific_humidity(1013.25, 293.15, 0.012)
    assert_almost_equal(float(td) - 273.15, 16.973, 1)


def test_moist_lapse_rate_sign_and_magnitude():
    # Pseudoadiabatic rate at 1000 hPa, 293 K: ~0.04 K/hPa (between dry
    # ~0.084 K/hPa and zero), positive (T falls as p falls).
    r = float(thermo.moist_lapse_rate(1000.0, 293.0))
    assert 0.03 < r < 0.06


def test_wet_bulb_fast():
    wb = thermo.wet_bulb_temperature_fast(300.0, 291.0)
    assert_almost_equal(float(wb), 297.0, 12)


def test_mixing_ratio_fused_equals_rh_route():
    # mixing_ratio is algebraically fused (eps*svp(td)/(p - svp(t))); it
    # must equal the unfused MetPy-1.4.1 chain rh * w_s to rounding.
    import numpy as np
    rng = np.random.default_rng(7)
    t = 233.0 + 80.0 * rng.random(256)
    td = t - 25.0 * rng.random(256)
    p = 150.0 + 900.0 * rng.random(256)
    fused = thermo.mixing_ratio(t, td, p)
    rh = thermo.relative_humidity_from_dewpoint(t, td)
    chain = thermo.mixing_ratio_from_relative_humidity(p, t, rh)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(chain),
                               rtol=1e-12)
