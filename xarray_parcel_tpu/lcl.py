"""Lifting condensation level: vectorised fixed-point solver.

The reference wraps MetPy's scipy ``fixed_point`` LCL per dask chunk via
``Dataset.map_blocks`` (reference: modules/parcel_functions.py:609-682) — a
host-side process boundary.  Here the same fixed-point map runs as a fused
elementwise iteration on device: every grid point converges in parallel, no
chunk orchestration, NaN inputs simply propagate (the reference needed
dummy-value substitution because MetPy's solver chokes on NaN :624-634).

The iterated map is MetPy 1.4.1's: with the parcel's (dewpoint-derived)
mixing ratio w held fixed,
    p_{k+1} = p0 * (Td(e(p_k, w)) / T0) ** (1/kappa)
whose fixed point is the LCL pressure; both solvers converge to the same
fixed point, so golden values agree to solver tolerance.
"""

import jax
import jax.numpy as jnp

from . import constants as c
from . import thermo
from .ops.safe import notnan


def lcl(parcel_pressure, parcel_temperature, parcel_dewpoint, iterations=30):
    """LCL pressure/temperature/virtual temperature of parcels (elementwise).

    Returns a dict with ``lcl_pressure`` [hPa], ``lcl_temperature`` [K] and
    ``lcl_virtual_temperature`` [K] (the reference also returns the virtual
    temperature, computed at saturation; reference:
    modules/parcel_functions.py:652-657).

    ``iterations``: 30 is bit-identical to 200 in fp64 on a harsh
    (500-1050 hPa surface, 230-320 K) grid — the fixed point converges by
    ~25; 20 is within 3e-12 and 12 within 7e-7 (convergence measured in
    the round-5 notes).  Every extra iteration is pure sequential O(B)
    latency in the fused solve's pre-pass.
    """
    p0 = jnp.asarray(parcel_pressure)
    t0 = jnp.asarray(parcel_temperature)
    td0 = jnp.asarray(parcel_dewpoint)
    p0, t0, td0 = jnp.broadcast_arrays(p0, t0, td0)

    # The fixed point iterates on SAFE finite dummies and the NaN pattern
    # is applied once at the end: iterating on raw NaN inputs poisons
    # reverse-mode cotangents of every element through the power/exp
    # backward rules (0 * NaN = NaN — the where-NaN gradient trap).
    valid = notnan(p0) & notnan(t0) & notnan(td0)
    p0 = jnp.where(valid, p0, 1000.0)
    t0 = jnp.where(valid, t0, 288.0)
    td0 = jnp.where(valid, td0, 283.0)

    w = thermo.mixing_ratio_from_partial_pressure(
        thermo.saturation_vapor_pressure(td0), p0)

    def body(_, p):
        e = thermo.vapor_pressure(p, w)
        td = thermo.dewpoint(e)
        return p0 * (td / t0) ** (1.0 / c.kappa)

    lcl_p = jax.lax.fori_loop(0, iterations, body, p0)
    lcl_t = thermo.dewpoint(thermo.vapor_pressure(lcl_p, w))

    # Virtual temperature at the LCL (temperature == dewpoint there).
    lcl_w = thermo.mixing_ratio(lcl_t, lcl_t, lcl_p)
    lcl_vt = thermo.virtual_temperature(lcl_t, lcl_w)

    nan = jnp.nan
    return {
        'lcl_pressure': jnp.where(valid, lcl_p, nan),
        'lcl_temperature': jnp.where(valid, lcl_t, nan),
        'lcl_virtual_temperature': jnp.where(valid, lcl_vt, nan),
    }
