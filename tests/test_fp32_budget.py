"""fp32 error budget: the TPU production dtype vs the fp64 reference path.

The bench target (BASELINE.json) demands throughput at bounded relative
error; TPU v5e compute is fp32 (fp64 is emulated/slow), so this test pins
the fp32 error envelope of the full CAPE solve against the fp64 path on the
same convective grid used by the serial-oracle integration tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xarray_parcel_tpu import adiabat, cape, fused

from test_integration_serial import make_grid


@pytest.fixture(scope='module')
def tables64():
    return adiabat.load_moist_adiabat_lookups()


@pytest.fixture(scope='module')
def grid():
    return make_grid()


def _cape(p, t, td, tables, fn):
    res, _ = jax.jit(lambda p, t, td: fn(p, t, td, tables=tables))(p, t, td)
    return np.asarray(res['cape'], np.float64), np.asarray(res['cin'],
                                                           np.float64)


def test_fp32_cape_budget(tables64, grid):
    p, t, td = (jnp.asarray(v) for v in grid)
    cape64, cin64 = _cape(p, t, td, tables64, cape.surface_based_cape_cin)

    tables32 = tables64.astype(jnp.float32)
    p32, t32, td32 = (jnp.asarray(v, jnp.float32) for v in grid)
    assert p32.dtype == jnp.float32

    for name, fn in (('xla', cape.surface_based_cape_cin),
                     ('fused', fused.fused_surface_cape_cin)):
        cape32, cin32 = _cape(p32, t32, td32, tables32, fn)
        assert cape32.dtype == np.float64 and not np.isnan(cape32).all()
        for q, a64, a32 in (('cape', cape64, cape32), ('cin', cin64, cin32)):
            d = np.abs(a32 - a64)
            # Branch flips (LFC/EL selection moving a level under fp32) are
            # legitimate for near-degenerate columns; bound the bulk error
            # and the flip rate rather than the worst case.
            bulk = np.nanquantile(d, 0.95)
            flips = np.mean(d > 5.0)
            assert bulk < 1.0, f'{name}/{q}: p95 fp32 error {bulk:.3f} J/kg'
            assert flips < 0.05, f'{name}/{q}: {flips:.1%} branch flips'
