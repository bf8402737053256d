"""AOT deployment: export a compiled pipeline once, serve it anywhere.

The reference has no serving story — every session re-builds and
re-schedules its lazy dask graph before any data moves (reference:
modules/parcel_functions.py:561-579 re-chunks per call; the demo notebook
re-runs the full pipeline per session).  The TPU equivalent of that cost
is concrete: every distinct XLA program pays Python tracing + lowering +
backend compilation before its first batch (tens of seconds on a
remote-attached chip).  This module removes all three from the serving
process:

- :func:`export_pipeline` AOT-traces and lowers a pipeline to a
  serialized StableHLO artifact (zip of the ``jax.export`` blob + JSON
  metadata).  The adiabat tables stay *arguments* rather than baked-in
  constants, so the artifact is ~100 kB instead of ~200 MB and one
  artifact serves any table build.
- :func:`load` returns a :class:`Deployed` callable.  Fixed-batch
  artifacts serve ANY grid size: inputs pad up to the exported batch
  (NaN for floats — the pipelines' NaN contract turns padded rows into
  NaN outputs), run chunk-by-chunk, and slice back (same contract as
  ``parallel.chunked``).  ``polymorphic=True`` artifacts embed a symbolic
  batch dimension instead and run any size directly (XLA pipelines only —
  the Pallas grid needs a concrete batch).
- :func:`enable_compilation_cache` turns on JAX's persistent compile
  cache, so even the backend-compile step is paid once per machine
  rather than once per process.

Export on the platform family you serve on (the artifact records its
lowering platforms): the fused pipelines lower to the Mosaic TPU kernel
when exported from a TPU-attached process and to the interpret-mode XLA
expansion elsewhere.  Pass ``platforms=('cpu', 'tpu')`` for a
multi-platform XLA artifact.
"""

import json
import zipfile

import numpy as np

import jax
import jax.numpy as jnp

from . import adiabat, pipeline

_FORMAT = 'xarray-parcel-tpu-exported-v1'

def _with_proxies(base):
    def fn(dat, tables=None, **kwargs):
        out = dict(base(dat, tables=tables, **kwargs))
        out.update(pipeline.storm_proxies(out))
        return out
    fn.__name__ = base.__name__ + '_with_proxies'
    return fn


#: Exportable named pipelines (dict-in / dict-out, ``tables=`` kwarg).
#: The ``_with_proxies`` forms append the 8 storm-proxy booleans + SHIP,
#: the reference demo's full output set (parcel_functions.py:2323-2407).
PIPELINES = {
    'conv_properties': pipeline.conv_properties,
    'conv_properties_fused': pipeline.conv_properties_fused,
    'min_conv_properties': pipeline.min_conv_properties,
    'min_conv_properties_fused': pipeline.min_conv_properties_fused,
    'conv_properties_with_proxies': _with_proxies(pipeline.conv_properties),
    'conv_properties_fused_with_proxies':
        _with_proxies(pipeline.conv_properties_fused),
}

#: Registry pipelines that lower through the Pallas kernel (and therefore
#: need a concrete batch — no polymorphic export).  Custom callables can
#: declare themselves with a ``uses_pallas`` attribute; without one, a
#: ``_fused`` name is treated as Pallas-backed.
_FUSED_PIPELINES = {'conv_properties_fused', 'min_conv_properties_fused',
                    'conv_properties_fused_with_proxies'}


def input_spec(batch, levels=90, wind_levels=None, dtype=jnp.float32):
    """ShapeDtypeStruct dict for the pipelines' input contract
    (reference variable names, modules/parcel_functions.py:1951-2100).

    ``batch`` may be an int or a symbolic dimension from
    ``jax.export.symbolic_shape``.
    """
    lw = levels if wind_levels is None else wind_levels
    s = lambda *shape: jax.ShapeDtypeStruct(shape, dtype)
    return {
        'pressure': s(batch, levels),
        'temperature': s(batch, levels),
        'specific_humidity': s(batch, levels),
        'height_asl': s(batch, levels),
        'surface_wind_u': s(batch),
        'surface_wind_v': s(batch),
        'wind_u': s(batch, lw),
        'wind_v': s(batch, lw),
        'wind_height_above_surface': s(batch, lw),
    }


def _tables_or_load(tables, dtype=None):
    """Default tables, auto-building/loading the cache in a fresh serving
    process (the load-first guard stays for the library surfaces).

    ``dtype`` is the table dtype the artifact was exported with: the
    serving process's own config (e.g. ``jax_enable_x64``) must not pick
    the cache flavour, or a cross-configuration serve fails the exported
    signature check.
    """
    if tables is not None:
        return tables
    try:
        tables = adiabat.default_tables()
    except RuntimeError:
        tables = None
    if tables is None or (dtype is not None and
                          np.dtype(tables.curves.dtype) != np.dtype(dtype)):
        tables = adiabat.load_moist_adiabat_lookups(dtype=dtype)
    return tables


def export_pipeline(name, batch, levels=90, wind_levels=None,
                    dtype=jnp.float32, tables=None, polymorphic=False,
                    platforms=None, mesh=None, path=None, **kwargs):
    """AOT-export a named pipeline (or any dict->dict callable taking a
    ``tables=`` kwarg) at a static input shape; returns a :class:`Deployed`.

    ``batch`` is the exported static batch size; a fixed-batch artifact
    still serves any grid (see :class:`Deployed`).  ``polymorphic=True``
    exports a symbolic batch dimension instead — supported by the XLA
    pipelines only.  ``mesh`` exports the SPMD program instead: the batch
    dim sharded over the mesh (``parallel.batch_spec`` layout), tables
    replicated — one artifact drives a whole slice; serving needs a mesh
    of the same device count (see :meth:`Deployed.__call__`).  ``kwargs``
    are closed over (they become part of the compiled program, e.g.
    ``ignore_nans=True``).  ``tables`` defaults to the cached table
    build; only their shapes/dtypes enter the artifact.
    """
    fn = PIPELINES[name] if isinstance(name, str) else name
    fn_name = name if isinstance(name, str) else getattr(
        name, '__name__', 'custom')
    uses_pallas = (fn_name in _FUSED_PIPELINES if isinstance(name, str)
                   else bool(getattr(fn, 'uses_pallas',
                                     '_fused' in fn_name)))
    if polymorphic and uses_pallas:
        raise ValueError(
            'polymorphic batch is XLA-only: the fused pipelines fix the '
            'Pallas grid at trace time — export a fixed batch instead '
            '(Deployed pads/chunks any grid onto it); for a custom '
            'callable, set fn.uses_pallas explicitly')
    if polymorphic and mesh is not None:
        raise ValueError('polymorphic batch and mesh sharding do not '
                         'compose — export a fixed sharded batch')
    tables = _tables_or_load(tables)

    def wrapper(dat, table_arrays):
        tab = adiabat.AdiabatTables(*table_arrays)
        return dict(fn(dat, tables=tab, **kwargs))

    if polymorphic:
        batch_dim, = jax.export.symbolic_shape('b')
    elif batch is None:
        raise ValueError('batch=None needs polymorphic=True (or pass the '
                         'static batch size to export)')
    elif int(batch) < 1:
        raise ValueError(f'exported batch must be >= 1, got {batch}')
    else:
        batch_dim = int(batch)
    # batch_spec shards the batch over the FIRST mesh axis only.
    if mesh is not None and int(batch) % int(mesh.devices.shape[0]):
        raise ValueError(f'batch {batch} must divide evenly over the '
                         f'{int(mesh.devices.shape[0])}-way batch axis of '
                         'the mesh (Deployed pads any real grid onto it)')
    dat_spec = input_spec(batch_dim, levels=levels, wind_levels=wind_levels,
                          dtype=dtype)
    # shape/dtype only — never materialize or device-place a (possibly
    # host-resident, ~200 MB) table just to read its metadata.
    tab_spec = tuple(
        jax.ShapeDtypeStruct(np.shape(a), np.dtype(a.dtype))
        for a in (tables.curves, tables.lookup, tables.coeffs))
    if mesh is not None:
        from .parallel import batch_spec, replicated
        from jax.sharding import NamedSharding
        dat_spec = {k: jax.ShapeDtypeStruct(
            s.shape, s.dtype,
            sharding=NamedSharding(mesh, batch_spec(mesh, len(s.shape))))
            for k, s in dat_spec.items()}
        tab_spec = jax.tree_util.tree_map(
            lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype,
                                           sharding=replicated(mesh)),
            tab_spec)

    exp = jax.export.export(
        jax.jit(wrapper),
        platforms=list(platforms) if platforms else None,
    )(dat_spec, tab_spec)

    meta = {
        'format': _FORMAT,
        'pipeline': fn_name,
        'batch': None if polymorphic else int(batch),
        'polymorphic': bool(polymorphic),
        'levels': int(levels),
        'wind_levels': int(levels if wind_levels is None else wind_levels),
        'dtype': np.dtype(dtype).name,
        'table_dtype': np.dtype(tables.curves.dtype).name,
        'table_dtypes': [np.dtype(a.dtype).name for a in
                         (tables.curves, tables.lookup, tables.coeffs)],
        'platforms': list(exp.platforms),
        'mesh': None if mesh is None else {
            'axis_names': list(mesh.axis_names),
            'shape': [int(s) for s in mesh.devices.shape]},
        'kwargs': {k: repr(v) for k, v in kwargs.items()},
        'jax_version': jax.__version__,
    }
    deployed = Deployed(exp, meta)
    if path is not None:
        deployed.save(path)
    return deployed


class Deployed:
    """A loaded/exported pipeline artifact: ``deployed(dat)`` runs it.

    Fixed-batch artifacts accept any leading batch size: inputs pad up to
    a multiple of the exported batch (NaN for floats, zero otherwise) and
    run chunk-by-chunk; padded rows are sliced off the outputs.
    """

    def __init__(self, exported, meta):
        self.exported = exported
        self.meta = dict(meta)
        self._placed = {}             # (id(tables), id(mesh)) -> placement
        self._default_mesh = None

    def save(self, path):
        """Write the artifact (zip of StableHLO blob + JSON metadata)."""
        with zipfile.ZipFile(path, 'w', zipfile.ZIP_DEFLATED) as z:
            z.writestr('meta.json', json.dumps(self.meta, indent=1))
            z.writestr('exported.stablehlo', self.exported.serialize())
        return path

    def _mesh(self, mesh):
        """Resolve the serving mesh for a sharded artifact (or None)."""
        want = self.meta.get('mesh')
        if want is None:
            if mesh is not None:
                raise ValueError(
                    'this artifact was not exported with mesh= — the '
                    'passed serving mesh would be silently ignored; '
                    're-export with export_pipeline(..., mesh=mesh) for '
                    'SPMD serving')
            return None
        shape = tuple(want['shape'])
        if mesh is None:
            if self._default_mesh is not None:
                return self._default_mesh
            n = int(np.prod(shape))
            avail = len(jax.devices())
            if avail != n:
                raise ValueError(f'artifact was exported for {n} devices; '
                                 f'{avail} available — pass a matching '
                                 'mesh= or re-export')
            from .parallel import make_mesh
            mesh = make_mesh(axis_names=tuple(want['axis_names']),
                             shape=shape)
            self._default_mesh = mesh
        # The exported HloShardings are positional: the batch dim is laid
        # out over the FIRST mesh axis, so the serving mesh must reproduce
        # the exported axis shape, not just the device count.
        if tuple(int(s) for s in mesh.devices.shape) != shape:
            raise ValueError(f'artifact was exported on a mesh of shape '
                             f'{shape}; serving mesh has shape '
                             f'{tuple(mesh.devices.shape)}')
        return mesh

    def _place_tables(self, tables, mesh):
        """Device placement of the ~200 MB tables, memoized per
        (tables, mesh) pair — serving loops must not re-transfer them on
        every call.  The value tuple pins both keys' referents so a
        recycled ``id()`` can never alias a dead entry."""
        key = (id(tables), None if mesh is None else id(mesh))
        memo = self._placed.get(key)
        if memo is not None and memo[0] is tables and memo[1] is mesh:
            return memo[2]
        arrs = tuple(t if hasattr(t, 'ndim') else np.asarray(t)
                     for t in (tables.curves, tables.lookup, tables.coeffs))
        # Coerce each array to its exported dtype (curves/lookup/coeffs can
        # legitimately differ — a downcast table keeps its wider lookup).
        # A no-op when they match; the rare mismatch cast is memoized.
        want = self.meta.get('table_dtypes')
        if want:
            arrs = tuple(a if np.dtype(a.dtype) == np.dtype(w)
                         else a.astype(np.dtype(w))
                         for a, w in zip(arrs, want))
        if mesh is not None:
            from .parallel import replicate
            # replicate (not raw device_put): multi-process consistency
            # checks NaN-bearing tables elementwise, and a plain
            # jnp.asarray would double-place via the default device
            # (parallel/mesh.py:_put_global).
            tab = replicate(arrs, mesh)
        else:
            tab = tuple(jnp.asarray(a) for a in arrs)
        self._placed[key] = (tables, mesh, tab)
        return tab

    @staticmethod
    def _host(out):
        """Materialize a served output pytree host-side.  On one process,
        plain ``np.asarray``; across processes the chunk outputs are
        global arrays spanning non-addressable devices, so gather them
        (each process gets the full value, as for the inputs)."""
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            return multihost_utils.process_allgather(out, tiled=True)
        return jax.tree_util.tree_map(np.asarray, out)

    def __call__(self, dat, tables=None, mesh=None):
        """Serve one batch.  Exact-fit and polymorphic calls return device
        arrays; the pad/chunk path returns host numpy arrays (outputs are
        materialized chunk-by-chunk)."""
        if not dat:
            raise ValueError('empty input dict — nothing to serve')
        bad = sorted(k for k, v in dat.items() if not np.shape(v))
        if bad:
            raise ValueError('inputs must carry a leading batch dim; '
                             f'0-d fields: {bad}')
        sizes = {np.shape(v)[0] for v in dat.values()}
        if len(sizes) != 1:
            raise ValueError(f'mixed leading batch dims: {sorted(sizes)}')
        b = sizes.pop()
        if b == 0:
            raise ValueError('empty batch (leading dim 0) — nothing to '
                             'serve')

        tables = _tables_or_load(tables, dtype=self.meta.get('table_dtype'))
        mesh = self._mesh(mesh)
        tab = self._place_tables(tables, mesh)
        if mesh is not None:
            from .parallel import shard_batch
            place = lambda d: shard_batch(d, mesh)
        else:
            place = lambda d: d

        bex = self.meta.get('batch')
        if bex is None:                       # polymorphic artifact
            return self.exported.call(
                {k: jnp.asarray(v) for k, v in dat.items()}, tab)
        if b == bex:                          # exact fit: no copies at all
            return self.exported.call(place(dat), tab)

        # Mismatched batch: pad/slice on the HOST (numpy views are free
        # and the exported call stages each chunk to the device anyway —
        # eager device pad/slice programs would each cost a compile).
        # Device-resident inputs take one transfer here; outputs come
        # back as host arrays.  The loop keeps one chunk in flight while
        # the previous chunk's outputs read back, so D2H overlaps compute
        # instead of serializing against it.
        from .parallel.chunked import pad_fill
        dat = {k: np.asarray(v) for k, v in dat.items()}
        pad = (-b) % bex
        if pad:
            dat = {k: np.pad(v, [(0, pad)] + [(0, 0)] * (v.ndim - 1),
                             constant_values=pad_fill(v.dtype))
                   for k, v in dat.items()}
        chunks, pending = [], None
        for i in range((b + pad) // bex):
            sl = {k: v[i * bex:(i + 1) * bex] for k, v in dat.items()}
            out = self.exported.call(place(sl), tab)
            if pending is not None:
                chunks.append(self._host(pending))
            pending = out
        chunks.append(self._host(pending))
        return jax.tree_util.tree_map(
            lambda *xs: np.concatenate(xs, axis=0)[:b], *chunks)


def load(path):
    """Load a :class:`Deployed` artifact written by :meth:`Deployed.save`."""
    with zipfile.ZipFile(path) as z:
        meta = json.loads(z.read('meta.json'))
        if meta.get('format') != _FORMAT:
            raise ValueError(f'not a {_FORMAT} artifact: {path}')
        exported = jax.export.deserialize(z.read('exported.stablehlo'))
    return Deployed(exported, meta)


def enable_compilation_cache(directory, min_compile_time_secs=0.0):
    """Turn on JAX's persistent compilation cache at ``directory``.

    Compiled executables for identical programs are reused across
    processes — a serving fleet pays each pipeline's backend compile once
    per cache, not once per process.  Call before the first jit execution.
    """
    jax.config.update('jax_compilation_cache_dir', str(directory))
    jax.config.update('jax_persistent_cache_min_compile_time_secs',
                      float(min_compile_time_secs))
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    # The cache backend is a lazily-created singleton bound to the dir it
    # first saw — drop it so re-pointing mid-process actually re-points.
    from jax.experimental.compilation_cache import compilation_cache as _cc
    _cc.reset_cache()
    return str(directory)
