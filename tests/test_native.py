"""Native C++ ingest runtime vs its NumPy fallbacks (and vs device ops)."""

import numpy as np
import pytest

from xarray_parcel_tpu import native


def test_native_builds():
    assert native.available(), 'g++ build of the ingest library failed'


def test_validate_columns():
    p = np.array([[1000., 900., 800., np.nan],      # ok: NaN padding at top
                  [1000., 900., 950., 800.],        # bad: not decreasing
                  [1000., np.nan, 900., 800.],      # bad: NaN then values
                  [1000., 999., 998., 997.],        # ok
                  [1000., 1000., 900., 800.],       # bad: not strict
                  [np.nan, 900., 800., 700.]],      # bad: leading NaN
                 np.float64)
    expect = np.array([True, False, False, True, False, False])
    np.testing.assert_array_equal(native.validate_columns(p), expect)
    np.testing.assert_array_equal(
        native.validate_columns(p.astype(np.float32)), expect)


def test_validate_matches_fallback():
    rng = np.random.default_rng(0)
    p = -np.sort(-rng.uniform(100, 1050, (64, 30)), axis=-1)
    p[3, 5] = p[3, 4]                     # duplicate -> invalid
    p[7, 25:] = np.nan                    # top padding -> valid
    p[9, 10] = np.nan                     # interior NaN -> invalid
    got = native.validate_columns(p)
    native._lib_save, native._lib = native._lib, None   # force fallback
    try:
        fallback = native.validate_columns(p)
    finally:
        native._lib = native._lib_save
    np.testing.assert_array_equal(got, fallback)


def test_repack_and_transpose():
    rng = np.random.default_rng(1)
    a = rng.normal(0, 1, (40, 7, 9))
    np.testing.assert_array_equal(native.repack_to_f32(a),
                                  a.astype(np.float32))
    got = native.levels_to_last(a)
    np.testing.assert_array_equal(got,
                                  np.moveaxis(a, 0, -1).astype(np.float32))
    assert got.dtype == np.float32 and got.flags['C_CONTIGUOUS']


def test_compact_left_matches_device_op():
    import jax
    import jax.numpy as jnp
    from xarray_parcel_tpu import ops

    rng = np.random.default_rng(2)
    p = -np.sort(-rng.uniform(100, 1050, (32, 16)), axis=-1)
    lead = rng.integers(0, 5, 32)
    for i, n in enumerate(lead):
        p[i, :n] = np.nan
    t = rng.normal(280, 10, (32, 16))
    t[np.isnan(p)] = np.nan
    fields = {'pressure': p.astype(np.float32), 't': t.astype(np.float32)}

    host = native.compact_left(fields, 'pressure')
    dev = ops.compact_left({k: jnp.asarray(v) for k, v in fields.items()},
                           'pressure')
    for k in fields:
        np.testing.assert_allclose(host[k], np.asarray(dev[k], np.float32),
                                   equal_nan=True, atol=0)


def test_compact_left_preserves_f64():
    """compact_left is dtype-preserving: float64 archive arrays compact in
    float64 (no silent downcast), mixed-dtype dicts keep each leaf's dtype,
    and the result matches the f32 kernel's pattern exactly."""
    rng = np.random.default_rng(7)
    p = -np.sort(-rng.uniform(100, 1050, (16, 12)), axis=-1)
    for i, n in enumerate(rng.integers(0, 4, 16)):
        p[i, :n] = np.nan
    t = rng.normal(280, 10, (16, 12))
    t[np.isnan(p)] = np.nan
    # Pure-f64 dict: key field stays f64 too, values keep full precision.
    out64 = native.compact_left({'pressure': p, 't': t}, 'pressure')
    assert out64['pressure'].dtype == np.float64
    assert out64['t'].dtype == np.float64
    # Mixed dict: f32 leaves ride the kernel, f64 leaves keep precision;
    # both see the same compaction pattern.
    mixed = native.compact_left(
        {'pressure': p.astype(np.float32), 't64': t}, 'pressure')
    assert mixed['pressure'].dtype == np.float32
    assert mixed['t64'].dtype == np.float64
    ref32 = native.compact_left(
        {'pressure': p.astype(np.float32), 't': t.astype(np.float32)},
        'pressure')
    np.testing.assert_allclose(mixed['t64'].astype(np.float32), ref32['t'],
                               equal_nan=True, atol=0)
    np.testing.assert_array_equal(np.isnan(out64['t']), np.isnan(ref32['t']))
