"""Multi-crossing LFC/EL fuzz: vector vs serial oracle on zigzag soundings.

The hardest logic in the library is ``cape.lfc_el``'s crossing selection
(bottom-most increasing below the LCL, top-most decreasing, LCL
substitution and existence rules — reference: modules/parcel_functions.py
:1066-1198).  The golden tests pin a handful of hand-built cases (incl.
the reference's 38-level ``multiple_intersections`` sounding) and the
integration tier uses smooth convective grids where multiple crossings
are incidental.  This fuzz generates environments that deliberately
OSCILLATE around the parcel's own track, forcing 3+ increasing and
decreasing crossings per column, and checks the vectorised solver picks
the same crossings (and integrates the same areas) as the independent
serial oracle.

Columns whose distinct crossings sit closer than 8 hPa are excluded by
construction-time filtering: the reference itself documents multi-LFC
ambiguity flipping the selected branch under ulp-level numeric
differences (its vector-vs-serial LFC diffs reach 135 hPa from exactly
this, demo notebook cell 23) — branch stability for near-coincident
crossings is not a contract either implementation makes.

Runs with the exact-ODE backend so the two sides are logic-identical
(table approximation error excluded), with the virtual-temperature
correction OFF so the oracle's returned real-temperature tracks are the
ones its selection logic used (letting the filter count crossings from
oracle state, not re-derived ones).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xarray_parcel_tpu import adiabat, cape, parcels

import serial_oracle as oracle

L = 44


def _zigzag_column(rng, depression=(1.0, 6.0)):
    """One sounding whose environment oscillates around the parcel track.

    ``depression`` bounds the surface dewpoint depression: small values
    put the LCL near the surface (crossings are all candidates); large
    values (e.g. 9-15 K) lift the LCL 150-250 hPa up so the zigzag
    crosses the DRY track below it, forcing ``lfc_el``'s above-LCL
    exclusion / LCL-substitution rules to fire."""
    p = np.linspace(1009.0, 190.0, L) + rng.normal(0, 0.4, L)
    p = -np.sort(-p)
    t0 = 295.0 + rng.uniform(-4.0, 6.0)
    td0 = t0 - rng.uniform(*depression)

    # The parcel's own (real-temperature) track via the oracle's physics.
    lcl_p, lcl_t = oracle.lcl(p[0], t0, td0)
    track = np.where(p >= lcl_p, oracle.dry_lapse(p, t0, p[0]),
                     oracle.moist_lapse(p, lcl_t, lcl_p))

    # Environment = track + a slow zigzag (well-separated sign changes)
    # + small noise; dewpoint follows with a positive depression.
    n_waves = rng.integers(2, 5)
    phase = rng.uniform(0, 2 * np.pi)
    amp = rng.uniform(1.2, 3.0)
    x = np.linspace(0, n_waves * np.pi, L)
    t_env = track + amp * np.sin(x + phase) + rng.normal(0, 0.08, L)
    td_env = t_env - (np.abs(rng.normal(2.0, 1.5, L)) + 0.3)
    return p, t_env, td_env, t0, td0


def _crossing_stats(res):
    """(#increasing, #decreasing, min pairwise gap) of the oracle's spliced
    real-temperature tracks (= the tracks its selection used: vtc off)."""
    pp, d = res['pp'], res['parcel_t'] - res['env_t']
    lx = np.log(pp)
    xs, dirs = [], []
    for i in range(len(pp) - 1):
        if np.sign(d[i]) != np.sign(d[i + 1]):
            cx = (d[i + 1] * lx[i] - d[i] * lx[i + 1]) / (d[i + 1] - d[i])
            xs.append(float(np.exp(cx)))
            dirs.append(1 if d[i + 1] > 0 else -1)
    inc = sum(1 for s in dirs if s > 0)
    dec = sum(1 for s in dirs if s < 0)
    gap = (np.min(np.diff(np.sort(xs))) if len(xs) > 1 else np.inf)
    return inc, dec, float(gap)


def _increasing_crossings(res):
    """Pressures of all increasing crossings of the oracle's spliced
    tracks (candidates BEFORE the above-LCL exclusion is applied)."""
    pp, d = res['pp'], res['parcel_t'] - res['env_t']
    lx = np.log(pp)
    xs = []
    for i in range(len(pp) - 1):
        if np.sign(d[i]) != np.sign(d[i + 1]) and d[i + 1] > 0:
            cx = (d[i + 1] * lx[i] - d[i] * lx[i + 1]) / (d[i + 1] - d[i])
            xs.append(float(np.exp(cx)))
    return xs


@pytest.fixture(scope='module')
def fuzz_set():
    rng = np.random.default_rng(20260820)
    tables = adiabat.load_moist_adiabat_lookups()
    del tables  # ensures the module-default guard is satisfied downstream
    cols, serial = [], []
    attempts = 0
    while len(cols) < 24 and attempts < 400:
        attempts += 1
        p, t, td, t0, td0 = _zigzag_column(rng)
        res = oracle.cape_cin_column(p, t, td, p[0], t0, td0,
                                     virtual_temperature_correction=False)
        inc, dec, gap = _crossing_stats(res)
        if inc < 2 or dec < 2 or gap < 8.0:
            continue        # not adversarial enough / ambiguous by design
        cols.append((p, t, td, t0, td0))
        serial.append(res)
    assert len(cols) == 24, f'only {len(cols)} usable columns in {attempts}'
    return cols, serial


@pytest.fixture(scope='module')
def deep_fuzz_set():
    """Zigzag columns with a HIGH LCL (9-15 K surface dewpoint depression)
    kept only when the oracle's selected LFC is NOT the bottom-most
    increasing crossing — i.e. the above-LCL exclusion or LCL/NaN
    substitution rules genuinely fired (the base ``fuzz_set`` never
    exercises them: its near-surface LCLs make every bottom-most
    crossing admissible)."""
    rng = np.random.default_rng(20260821)
    tables = adiabat.load_moist_adiabat_lookups()
    del tables
    cols, serial = [], []
    attempts = 0
    while len(cols) < 8 and attempts < 300:
        attempts += 1
        p, t, td, t0, td0 = _zigzag_column(rng, depression=(9.0, 15.0))
        res = oracle.cape_cin_column(p, t, td, p[0], t0, td0,
                                     virtual_temperature_correction=False)
        inc, dec, gap = _crossing_stats(res)
        if inc < 2 or gap < 8.0:
            continue
        inc_x = _increasing_crossings(res)
        nontrivial = (np.isnan(res['lfc'])
                      or abs(res['lfc'] - max(inc_x)) > 1.0)
        if not nontrivial:
            continue        # bottom-most pick: base fixture covers this
        cols.append((p, t, td, t0, td0))
        serial.append(res)
    assert len(cols) == 8, f'only {len(cols)} exclusion columns in {attempts}'
    return cols, serial


def test_multicross_lfc_el_and_areas(fuzz_set):
    cols, serial = fuzz_set
    p = np.stack([c[0] for c in cols])
    t = np.stack([c[1] for c in cols])
    td = np.stack([c[2] for c in cols])
    t0 = np.array([c[3] for c in cols])
    td0 = np.array([c[4] for c in cols])

    res, prof = jax.jit(lambda *a: cape.cape_cin(
        *a, virtual_temperature_correction=False,
        moist_lapse=adiabat.moist_lapse_integrate))(
            jnp.asarray(p), jnp.asarray(t), jnp.asarray(td),
            jnp.asarray(t0), jnp.asarray(p[:, 0]), jnp.asarray(td0))

    cape_v = np.asarray(res['cape'])
    cin_v = np.asarray(res['cin'])
    lfc_v = np.asarray(prof['lfc_pressure'])
    el_v = np.asarray(prof['el_pressure'])

    for i, s in enumerate(serial):
        # Same branch: NaN together or within 1 hPa (crossings are >= 8 hPa
        # apart by construction, so 1 hPa cannot straddle two branches).
        for name, v, sv in (('lfc', lfc_v[i], s['lfc']),
                            ('el', el_v[i], s['el'])):
            if np.isnan(sv):
                assert np.isnan(v), f'col {i} {name}: {v} vs serial NaN'
            else:
                assert abs(v - sv) < 1.0, f'col {i} {name}: {v} vs {sv}'
        # Integrated areas: the two moist integrators differ at the
        # 1e-3 K level, so J/kg tolerances stay loose-ish but far below
        # any branch-flip signature.
        assert abs(cape_v[i] - s['cape']) < 1.5, \
            f'col {i} cape: {cape_v[i]} vs {s["cape"]}'
        assert abs(cin_v[i] - s['cin']) < 1.5, \
            f'col {i} cin: {cin_v[i]} vs {s["cin"]}'


def test_multicross_exclusion_rules_vs_serial(deep_fuzz_set):
    """On columns where the bottom-most increasing crossing is REJECTED
    (below/at the high LCL), the vectorised solver applies the same
    exclusion / substitution rules as the serial oracle."""
    cols, serial = deep_fuzz_set
    p = np.stack([c[0] for c in cols])
    t = np.stack([c[1] for c in cols])
    td = np.stack([c[2] for c in cols])
    t0 = np.array([c[3] for c in cols])
    td0 = np.array([c[4] for c in cols])

    res, prof = jax.jit(lambda *a: cape.cape_cin(
        *a, virtual_temperature_correction=False,
        moist_lapse=adiabat.moist_lapse_integrate))(
            jnp.asarray(p), jnp.asarray(t), jnp.asarray(td),
            jnp.asarray(t0), jnp.asarray(p[:, 0]), jnp.asarray(td0))

    cape_v = np.asarray(res['cape'])
    cin_v = np.asarray(res['cin'])
    lfc_v = np.asarray(prof['lfc_pressure'])
    el_v = np.asarray(prof['el_pressure'])

    for i, s in enumerate(serial):
        for name, v, sv in (('lfc', lfc_v[i], s['lfc']),
                            ('el', el_v[i], s['el'])):
            if np.isnan(sv):
                assert np.isnan(v), f'col {i} {name}: {v} vs serial NaN'
            else:
                assert abs(v - sv) < 1.0, f'col {i} {name}: {v} vs {sv}'
        assert abs(cape_v[i] - s['cape']) < 1.5, \
            f'col {i} cape: {cape_v[i]} vs {s["cape"]}'
        assert abs(cin_v[i] - s['cin']) < 1.5, \
            f'col {i} cin: {cin_v[i]} vs {s["cin"]}'


def _variant_vs_serial(fuzz_set, vector_fn, oracle_fn):
    """Run a parcel variant on the zigzag set, filtering per column on the
    ORACLE's own crossing separation (the variant's parcel shifts the
    crossings, so the fixture-level filter does not transfer)."""
    cols, _ = fuzz_set
    p = np.stack([c[0] for c in cols])
    t = np.stack([c[1] for c in cols])
    td = np.stack([c[2] for c in cols])

    res, prof, parcel = jax.jit(lambda *a: vector_fn(
        *a, virtual_temperature_correction=False,
        moist_lapse=adiabat.moist_lapse_integrate))(
            jnp.asarray(p), jnp.asarray(t), jnp.asarray(td))
    cape_v = np.asarray(res['cape'])
    cin_v = np.asarray(res['cin'])
    lfc_v = np.asarray(prof['lfc_pressure'])
    el_v = np.asarray(prof['el_pressure'])
    parcel_p_v = np.asarray(parcel['pressure'])

    compared = 0
    for i in range(len(cols)):
        s = oracle_fn(p[i], t[i], td[i],
                      virtual_temperature_correction=False)
        _, _, gap = _crossing_stats(s)
        if gap < 8.0:
            continue        # near-coincident crossings: branch is ill-posed
        if 'parcel_pressure' in s and \
                abs(parcel_p_v[i] - s['parcel_pressure']) > 1e-6:
            continue        # theta-e argmax tie resolved differently: the
            # two sides launched different parcels, so crossing agreement
            # is not expected (cf. test_serial_extended same_parcel guard)
        compared += 1
        for name, v, sv in (('lfc', lfc_v[i], s['lfc']),
                            ('el', el_v[i], s['el'])):
            if np.isnan(sv):
                assert np.isnan(v), f'col {i} {name}: {v} vs serial NaN'
            else:
                assert abs(v - sv) < 1.0, f'col {i} {name}: {v} vs {sv}'
        assert abs(cape_v[i] - s['cape']) < 1.5, \
            f'col {i} cape: {cape_v[i]} vs {s["cape"]}'
        assert abs(cin_v[i] - s['cin']) < 1.5, \
            f'col {i} cin: {cin_v[i]} vs {s["cin"]}'
    # The filter must not hollow the test out.
    assert compared >= 16, f'only {compared} of {len(cols)} comparable'


def test_multicross_most_unstable_vs_serial(fuzz_set):
    """The MU variant (theta-e selection + masked sub-column launch) picks
    the same crossings/areas as the serial subset-and-launch oracle on
    the adversarial zigzag set."""
    _variant_vs_serial(fuzz_set, parcels.most_unstable_cape_cin,
                       oracle.most_unstable_cape_cin_column)


def test_multicross_mixed_layer_vs_serial(fuzz_set):
    """The mixed-layer variant (slot-write mix + first-valid launch) picks
    the same crossings/areas as the serial mix-and-prepend oracle on the
    adversarial zigzag set."""
    _variant_vs_serial(fuzz_set, parcels.mixed_layer_cape_cin,
                       oracle.mixed_layer_cape_cin_column)


def test_multicross_sets_are_adversarial(fuzz_set, deep_fuzz_set):
    """The fixtures really exercise multi-crossing selection.  Base set:
    at least half the columns CHOOSE the bottom-most among >= 2 increasing
    candidates (ordering, not mere detection, is in play).  Deep set
    (guaranteed by its construction filter, re-checked here): every column
    REJECTS the bottom-most candidate — the above-LCL exclusion or
    NaN-substitution path decided the answer."""
    _, serial = fuzz_set
    multi = 0
    for s in serial:
        inc_x = _increasing_crossings(s)
        if not np.isnan(s['lfc']) and len(inc_x) >= 2 and \
                abs(s['lfc'] - max(inc_x)) < 1e-9:
            multi += 1
    assert multi >= len(serial) // 2

    _, deep_serial = deep_fuzz_set
    for s in deep_serial:
        inc_x = _increasing_crossings(s)
        assert len(inc_x) >= 2
        assert np.isnan(s['lfc']) or abs(s['lfc'] - max(inc_x)) > 1.0
