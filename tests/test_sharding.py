"""Multi-device sharding tests on an 8-device virtual CPU mesh — coverage the
dask-bound reference never had (its "distributed" testing was a LocalCluster
in a notebook)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_array_almost_equal

from xarray_parcel_tpu import adiabat, api, parallel
from xarray_parcel_tpu.parallel import (global_stats, make_mesh, replicate,
                                        shard_batch, sharded_jit)


@pytest.fixture(scope='module')
def mesh():
    assert jax.device_count() >= 8, 'conftest must force 8 host devices'
    return make_mesh(jax.devices()[:8])


def _grid_sounding(b=16, L=24):
    rng = np.random.default_rng(3)
    p = np.linspace(1000.0, 200.0, L)
    t = 300.0 - 70.0 * (1 - (p / 1000.0) ** 0.28)
    t = np.broadcast_to(t, (b, L)) + rng.normal(0, 1.5, (b, L))
    td = t - np.abs(rng.normal(6, 4, (b, L)))
    return (jnp.array(np.broadcast_to(p, (b, L))), jnp.array(t),
            jnp.array(td))


def test_shard_batch_layout(mesh):
    p, t, td = _grid_sounding()
    sp = shard_batch(p, mesh)
    assert sp.sharding.spec == parallel.batch_spec(mesh, 2, 1)
    # level axis stays whole on every device
    shard_shapes = {s.data.shape for s in sp.addressable_shards}
    assert shard_shapes == {(2, 24)}


def test_sharded_cape_matches_single_device(mesh):
    p, t, td = _grid_sounding()
    oracle = dict(moist_lapse=adiabat.moist_lapse_integrate)

    def fn(p, t, td):
        res, _ = api.surface_based_cape_cin(p, t, td, **oracle)
        return res['cape'], res['cin']

    want_cape, want_cin = fn(p, t, td)
    got_cape, got_cin = sharded_jit(fn, mesh)(p, t, td)
    assert_array_almost_equal(np.asarray(got_cape), np.asarray(want_cape), 8)
    assert_array_almost_equal(np.asarray(got_cin), np.asarray(want_cin), 8)


def test_replicated_tables_sharded_columns(mesh, tmp_path):
    # Small synthetic tables exercise the replicated-tables + sharded-batch
    # layout without the full build.
    tables = adiabat.load_moist_adiabat_lookups()
    tables = replicate(tables, mesh)
    p, t, td = _grid_sounding()
    p = shard_batch(p, mesh)

    out = jax.jit(lambda pp: adiabat.moist_lapse(pp, 293.0, 1000.0,
                                                 tables=tables))(p)
    ref = adiabat.moist_lapse(np.asarray(p), 293.0, 1000.0, tables=tables)
    assert_array_almost_equal(np.asarray(out), np.asarray(ref), 10)


def test_global_stats_collectives(mesh):
    x = jnp.arange(16.0).reshape(16, 1)
    x = x.at[3, 0].set(jnp.nan)
    x = shard_batch(x, mesh)
    cnt, mean, mx = global_stats(x, mesh)
    finite = np.arange(16.0); finite = np.delete(finite, 3)
    assert int(cnt) == 15
    np.testing.assert_almost_equal(float(mean), finite.mean(), 10)
    np.testing.assert_almost_equal(float(mx), 15.0, 10)


def test_stream_map_matches_direct():
    """Out-of-core streaming over column chunks == direct execution."""
    import numpy as np
    import jax.numpy as jnp
    from xarray_parcel_tpu import adiabat, pipeline
    from xarray_parcel_tpu.parallel import stream_map

    tables = adiabat.load_moist_adiabat_lookups()
    rng = np.random.default_rng(5)
    ny, nx, L = 5, 7, 36
    p = np.broadcast_to(np.linspace(1006., 180., L), (ny, nx, L)).copy()
    t = 300.0 - 72.0 * (1.0 - (p / 1006.0) ** 0.3) + rng.normal(
        0, 1, (ny, nx, L))
    e = 6.112 * np.exp(17.67 * ((t - 8.) - 273.15) / ((t - 8.) - 29.65))
    q = (0.622 * e / (p - e)) / (1 + 0.622 * e / (p - e))
    h = 44330.0 * (1.0 - (p / 1013.25) ** 0.19)
    dat = {'pressure': p, 'temperature': t, 'specific_humidity': q,
           'height_asl': h,
           'surface_wind_u': rng.normal(3, 1, (ny, nx)),
           'surface_wind_v': rng.normal(0, 1, (ny, nx)),
           'wind_u': rng.normal(8, 3, (ny, nx, L)),
           'wind_v': rng.normal(1, 3, (ny, nx, L)),
           'wind_height_above_surface': h - h[..., :1]}

    fn = lambda d: pipeline.conv_properties(d, tables=tables)
    direct = fn({k: jnp.asarray(v.reshape((-1,) + v.shape[2:]))
                 for k, v in dat.items()})
    streamed = stream_map(fn, dat, batch_columns=8)   # uneven chunking
    for k in direct:
        a = np.asarray(direct[k]).reshape(streamed[k].shape)
        np.testing.assert_allclose(streamed[k], a, atol=1e-6, rtol=1e-9,
                                   equal_nan=True, err_msg=k)


def test_stream_map_empty_batch():
    import numpy as np
    from xarray_parcel_tpu.parallel import stream_map

    dat = {'pressure': np.zeros((0, 10)), 'temperature': np.zeros((0, 10))}
    out = stream_map(lambda d: {'x': d['pressure'][..., 0] * 2}, dat)
    assert out['x'].shape == (0,)


def test_pad_batch_uneven_rounds_up_and_slices():
    """pad -> shard -> compute -> slice is the production recipe for
    batches that do not divide the mesh (XLA shardings require
    divisibility); padded columns are NaN and so produce NaN outputs."""
    import jax
    import numpy as np
    import jax.numpy as jnp

    from xarray_parcel_tpu.parallel import make_mesh, pad_batch, shard_batch

    mesh = make_mesh(jax.devices('cpu')[:8])
    tree = {'a': np.arange(35.0 * 4).reshape(35, 4),
            'b': np.arange(35.0)}
    padded, b = pad_batch(tree, mesh)
    assert b == 35
    assert padded['a'].shape == (40, 4) and padded['b'].shape == (40,)
    assert np.isnan(padded['a'][35:]).all()
    np.testing.assert_array_equal(padded['a'][:35], tree['a'])

    sh = shard_batch(padded, mesh)          # divisible now: must not raise
    out = jax.jit(lambda d: d['a'].sum(-1) + d['b'])(sh)
    ref = tree['a'].sum(-1) + tree['b']
    np.testing.assert_allclose(np.asarray(out)[:b], ref)
    assert np.isnan(np.asarray(out)[b:]).all()

    # Already-divisible batches pass through unchanged.
    tree2 = {'a': np.ones((16, 3))}
    padded2, b2 = pad_batch(tree2, mesh)
    assert b2 == 16 and padded2['a'].shape == (16, 3)


def test_pad_batch_integer_and_bool_leaves_pad_with_zero():
    """Ingest trees carry int/bool fields (station ids, masks); NaN has no
    representation there, so they pad with zero — the padded rows are
    sliced off by the recipe regardless."""
    import jax
    import numpy as np

    from xarray_parcel_tpu.parallel import make_mesh, pad_batch

    mesh = make_mesh(jax.devices('cpu')[:8])
    tree = {'cape': np.ones(35), 'station': np.arange(35, dtype=np.int32),
            'mask': np.ones(35, dtype=bool)}
    padded, b = pad_batch(tree, mesh)
    assert b == 35
    assert padded['station'].dtype == np.int32
    assert padded['mask'].dtype == bool
    assert (padded['station'][35:] == 0).all()
    assert (~padded['mask'][35:]).all()
    assert np.isnan(padded['cape'][35:]).all()


def test_shard_batch_1d_leaf_shards_its_only_dim(mesh):
    """A 1-D leaf is a surface field (B,) — its single dim IS the batch
    and must shard, not replicate (every ingest leaf carries the full
    leading batch prefix; see parallel.shard_batch docstring)."""
    x = shard_batch(jnp.arange(16.0), mesh)
    shard_shapes = {s.data.shape for s in x.addressable_shards}
    assert shard_shapes == {(2,)}


def test_stream_map_integer_fields_pad_with_zero():
    """Uneven chunks force padding; int/bool fields have no NaN and pad
    with zeros instead, and round-trip exactly (padded rows are sliced
    off)."""
    import numpy as np
    from xarray_parcel_tpu.parallel import stream_map

    dat = {'pressure': np.linspace(1000.0, 900.0, 11),
           'station': np.arange(11, dtype=np.int32),
           'mask': np.array([i % 2 == 0 for i in range(11)])}
    out = stream_map(lambda d: {'s2': d['station'] * 2, 'm': d['mask'],
                                'p': d['pressure']},
                     dat, batch_columns=4)   # 11 -> chunks of 4,4,3(+1 pad)
    assert out['s2'].dtype == np.int32
    np.testing.assert_array_equal(out['s2'], dat['station'] * 2)
    np.testing.assert_array_equal(out['m'], dat['mask'])
    np.testing.assert_allclose(out['p'], dat['pressure'])


def test_infer_columns_batch_dims():
    """Throughput accounting: leading dims are columns; a 1-D first arg
    counts as a batch of points (pointwise timing), a scalar as 1."""
    from xarray_parcel_tpu.utils import infer_columns

    assert infer_columns((jnp.zeros((6, 7, 90)),)) == 42
    assert infer_columns((jnp.zeros((5, 90)),)) == 5
    assert infer_columns((jnp.zeros(10),)) == 10
    assert infer_columns((jnp.zeros(()),)) == 1


def test_stream_map_sharded_chunks_match_direct(mesh):
    """stream_map(mesh=): chunks shard over the mesh SPMD and the chunk
    size rounds up to a mesh-divisible count; results equal the unsharded
    direct run (uneven batch AND uneven chunk size)."""
    import numpy as np
    from xarray_parcel_tpu import adiabat, pipeline
    from xarray_parcel_tpu.parallel import stream_map

    tables = adiabat.load_moist_adiabat_lookups()
    rng = np.random.default_rng(11)
    B, L = 27, 30                        # 27 % 8 != 0; chunks pad to 16
    p = np.broadcast_to(np.linspace(1004., 210., L), (B, L)).copy()
    t = 300.0 - 70.0 * (1.0 - (p / 1004.0) ** 0.3) + rng.normal(0, 1, (B, L))
    e = 6.112 * np.exp(17.67 * ((t - 9.) - 273.15) / ((t - 9.) - 29.65))
    q = (0.622 * e / (p - e)) / (1 + 0.622 * e / (p - e))
    h = 44330.0 * (1.0 - (p / 1013.25) ** 0.19)
    dat = {'pressure': p, 'temperature': t, 'specific_humidity': q,
           'height_asl': h,
           'surface_wind_u': rng.normal(3, 1, B),
           'surface_wind_v': rng.normal(0, 1, B),
           'wind_u': rng.normal(8, 3, (B, L)),
           'wind_v': rng.normal(1, 3, (B, L)),
           'wind_height_above_surface': h - h[:, :1]}

    fn = lambda d: pipeline.min_conv_properties(d, tables=tables)
    direct = fn({k: jnp.asarray(v) for k, v in dat.items()})
    streamed = stream_map(fn, dat, batch_columns=10, mesh=mesh)
    for k in direct:
        np.testing.assert_allclose(streamed[k], np.asarray(direct[k]),
                                   atol=1e-6, rtol=1e-9, equal_nan=True,
                                   err_msg=k)

    # Witness the placement: every chunk really lands sharded over all 8
    # devices, at the rounded-up (mesh-divisible) chunk size.
    seen = []

    def probe(d):
        seen.append(d['pressure'].sharding)
        return {'x': d['pressure'][..., 0]}

    stream_map(probe, dat, batch_columns=10, mesh=mesh, jit=False)
    assert len(seen) == 2                      # 27 cols -> 2 chunks of 16
    assert all(len(s.device_set) == 8 for s in seen)


def test_stream_map_prefetch_depths_preserve_order():
    """Background-thread readback with any prefetch depth returns chunks in
    order (many more chunks than the in-flight bound, uneven tail)."""
    import numpy as np
    from xarray_parcel_tpu.parallel import stream_map

    B, L = 101, 7
    p = np.tile(np.linspace(1000.0, 300.0, L), (B, 1))
    idx = np.arange(B, dtype=np.float64)
    dat = {'pressure': p, 'colid': idx}
    fn = lambda d: {'twice': d['colid'] * 2.0,
                    'top': d['pressure'][..., -1]}
    for prefetch in (1, 2, 5):
        out = stream_map(fn, dat, batch_columns=8, prefetch=prefetch)
        np.testing.assert_array_equal(out['twice'], idx * 2.0)
        np.testing.assert_array_equal(out['top'], p[:, -1])
