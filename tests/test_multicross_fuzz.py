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

from xarray_parcel_tpu import adiabat, cape

import serial_oracle as oracle

L = 44


def _zigzag_column(rng):
    """One sounding whose environment oscillates around the parcel track."""
    p = np.linspace(1009.0, 190.0, L) + rng.normal(0, 0.4, L)
    p = -np.sort(-p)
    t0 = 295.0 + rng.uniform(-4.0, 6.0)
    td0 = t0 - rng.uniform(1.0, 6.0)

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


def _variant_vs_serial(fuzz_set, vector_fn, oracle_fn):
    """Run a parcel variant on the zigzag set, filtering per column on the
    ORACLE's own crossing separation (the variant's parcel shifts the
    crossings, so the fixture-level filter does not transfer)."""
    cols, _ = fuzz_set
    p = np.stack([c[0] for c in cols])
    t = np.stack([c[1] for c in cols])
    td = np.stack([c[2] for c in cols])

    res, prof, _ = jax.jit(lambda *a: vector_fn(
        *a, virtual_temperature_correction=False,
        moist_lapse=adiabat.moist_lapse_integrate))(
            jnp.asarray(p), jnp.asarray(t), jnp.asarray(td))
    cape_v = np.asarray(res['cape'])
    cin_v = np.asarray(res['cin'])
    lfc_v = np.asarray(prof['lfc_pressure'])
    el_v = np.asarray(prof['el_pressure'])

    compared = 0
    for i in range(len(cols)):
        s = oracle_fn(p[i], t[i], td[i],
                      virtual_temperature_correction=False)
        _, _, gap = _crossing_stats(s)
        if gap < 8.0:
            continue        # near-coincident crossings: branch is ill-posed
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
    from xarray_parcel_tpu import parcels

    import serial_oracle as oracle
    _variant_vs_serial(fuzz_set, parcels.most_unstable_cape_cin,
                       oracle.most_unstable_cape_cin_column)


def test_multicross_mixed_layer_vs_serial(fuzz_set):
    """The mixed-layer variant (slot-write mix + first-valid launch) picks
    the same crossings/areas as the serial mix-and-prepend oracle on the
    adversarial zigzag set."""
    from xarray_parcel_tpu import parcels

    import serial_oracle as oracle
    _variant_vs_serial(fuzz_set, parcels.mixed_layer_cape_cin,
                       oracle.mixed_layer_cape_cin_column)


def test_multicross_set_is_adversarial(fuzz_set):
    """The fixture really exercises multi-crossing selection: every column
    has >= 2 increasing and >= 2 decreasing crossings, and at least half
    the columns pick an LFC that is NOT the first crossing above the
    surface (i.e. the selection rules, not just detection, are in play)."""
    cols, serial = fuzz_set
    multi = 0
    for s in serial:
        pp, d = s['pp'], s['parcel_t'] - s['env_t']
        lx = np.log(pp)
        inc_x = []
        for i in range(len(pp) - 1):
            if np.sign(d[i]) != np.sign(d[i + 1]) and d[i + 1] > 0:
                cx = (d[i + 1] * lx[i] - d[i] * lx[i + 1]) / (d[i + 1] - d[i])
                inc_x.append(float(np.exp(cx)))
        if not np.isnan(s['lfc']) and len(inc_x) >= 2 and \
                abs(s['lfc'] - max(inc_x)) < 1e-9:
            # bottom-most increasing selected among several candidates
            multi += 1
    assert multi >= len(serial) // 2
