"""A/B: mixed-dims Dataset ingest — trace-time broadcast vs dense copies.

The round-5 review found the first mixed-dims implementation densified
subset-dim variables host-side, shipping a full-grid copy of a 1-D
pressure coordinate-variable over the ~20 MB/s tunnel on every pipeline
call.  The fix broadcasts at TRACE time (xarray_api._broadcast_run) so
only the variable's own bytes move.  This measures the Dataset-surface
end-to-end wall for one `conv_properties_fused` call on a mixed-dims
grid (1-D pressure + per-row surface winds) against the same grid fully
densified, steady-state (post-compile), ingest included:

  mixed  — Dataset with (L,) pressure, (X,) winds  (trace-broadcast path)
  dense  — same values pre-broadcast to the full grid (dense transfers)

MEASURED (v5e, 2^18 cols, results/mixed_ingest_ab_v5e_r5.json): a WASH
end to end — 12.23 vs 12.12 s/call.  Two lessons recorded:
(1) Dataset-surface e2e calls are dominated by the per-call host
    readback of every output variable (`_lift` device_get's ~20 vars
    over the tunnel's slow D2H path); the extra H2D bytes of the dense
    arm are cheap because H2D is much faster than the ~20 MB/s D2H on
    this tunnel.  The trace-broadcast fix still saves the bytes/HBM, but
    its wall-clock value appears on PCIe-attached hosts, not here —
    device-resident pipelines (bench.py) remain the timed production
    path.
(2) worst_rel_diff ~0.65 between the two arms is NOT a bug: across 262k
    random fp32 columns a different program shape flips LFC/EL branches
    on a handful of near-degenerate columns (the documented fp32
    existence-flip class, benchmarks/fp32_envelope.py) — bulk agreement
    is at the usual 1e-4 level.

Usage: python benchmarks/mixed_ingest_ab.py   (repo root, TPU backend)
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, '.')
sys.path.insert(0, 'benchmarks')
import ab_harness  # noqa: E402
import bench  # noqa: E402
from xarray_parcel_tpu import xarray_api, xr_lite as xr  # noqa: E402

Y, X, L = 512, 512, 90          # 2^18 columns
ROUNDS = 3
ITERS = 3


def make_datasets():
    rng = np.random.default_rng(9)
    flat = bench.synthetic(Y * X, L=L)
    full = {k: np.asarray(v).reshape((Y, X) + np.shape(v)[1:])
            for k, v in flat.items()}
    dims3 = ('latitude', 'longitude', 'model_level_number')
    p1 = np.asarray(full['pressure'])[0, 0]
    mixed = xr.Dataset(
        {'pressure': (('model_level_number',), p1),
         'surface_wind_u': (('longitude',),
                            np.asarray(full['surface_wind_u'])[0]),
         'surface_wind_v': (('longitude',),
                            np.asarray(full['surface_wind_v'])[0])} |
        {k: (dims3, np.asarray(v)) for k, v in full.items()
         if k not in ('pressure', 'surface_wind_u', 'surface_wind_v')})
    dense = xr.Dataset(
        {'pressure': (dims3, np.broadcast_to(p1, (Y, X, L)).copy()),
         'surface_wind_u': (('latitude', 'longitude'), np.broadcast_to(
             np.asarray(full['surface_wind_u'])[0], (Y, X)).copy()),
         'surface_wind_v': (('latitude', 'longitude'), np.broadcast_to(
             np.asarray(full['surface_wind_v'])[0], (Y, X)).copy())} |
        {k: (dims3, np.asarray(v)) for k, v in full.items()
         if k not in ('pressure', 'surface_wind_u', 'surface_wind_v')})
    del rng
    return mixed, dense


def main():
    tables, _ = ab_harness.setup()
    mixed, dense = make_datasets()

    def call(ds):
        out = xarray_api.conv_properties_fused(ds, tables=tables)
        # to_dataset already device_get's every output — the call IS the
        # sync point; read one value to be explicit.
        return float(np.asarray(out['mu_cape'])[0, 0])

    for name, ds in (('mixed', mixed), ('dense', dense)):
        t0 = time.perf_counter()
        call(ds)
        bench.log(f'{name}: compile+first {time.perf_counter() - t0:.1f}s')

    best = {'mixed': float('inf'), 'dense': float('inf')}
    for r in range(ROUNDS):
        for name, ds in (('mixed', mixed), ('dense', dense)):
            t0 = time.perf_counter()
            for _ in range(ITERS):
                call(ds)
            sec = (time.perf_counter() - t0) / ITERS
            best[name] = min(best[name], sec)
            bench.log(f'round {r} {name}: {sec * 1e3:.0f} ms/call')

    # Equality spot check (program-shape wobble envelope).
    a = xarray_api.conv_properties_fused(mixed, tables=tables)
    b = xarray_api.conv_properties_fused(dense, tables=tables)
    worst = 0.0
    for k in a.data_vars:
        va = np.asarray(a[k], np.float64)
        vb = np.asarray(b[k], np.float64)
        if va.dtype.kind == 'b':
            continue
        ok = ~np.isnan(va) & ~np.isnan(vb)
        if ok.any():
            scale = max(1.0, float(np.nanmax(np.abs(vb))))
            worst = max(worst, float(np.max(np.abs(va[ok] - vb[ok]))) /
                        scale)
    print(json.dumps({
        'mixed_ms': round(best['mixed'] * 1e3, 1),
        'dense_ms': round(best['dense'] * 1e3, 1),
        'ingest_saving_ms': round((best['dense'] - best['mixed']) * 1e3, 1),
        'worst_rel_diff': worst, 'columns': Y * X, 'levels': L}))


if __name__ == '__main__':
    main()
