"""A/B: direct per-gap mixed_layer vs the splice-based round-3 version.

prep_breakdown.py measured the two mix_layer calls at 8.6 ms net — the
dominant piece of the fused pipeline's 14 ms XLA prep.  The new
mixed_layer integrates in-layer gaps + a partial boundary gap directly;
the old one materialised a spliced (…, L+1) layer via
get_layer(interpolate=True) and ran trapz over it.

Arms interleaved within one process (per-arm minima) — the in-process
second-arm bias is ~5 ms (reduction_ab.py).

Usage: python benchmarks/mixed_layer_ab.py   (repo root, TPU backend)
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, '.')
import bench  # noqa: E402
from xarray_parcel_tpu import adiabat, parcels, pipeline  # noqa: E402
from xarray_parcel_tpu import thermo  # noqa: E402
from xarray_parcel_tpu.ops import get_layer, nanmax, nanmin, trapz  # noqa: E402

B = 1 << 18
ROUNDS = 3
ITERS = 5


def old_mixed_layer(fields, depth=100.0):
    layer = get_layer(fields, depth=depth, interpolate=True)
    p = layer['pressure']
    pressure_depth = jnp.abs(nanmin(p) - nanmax(p))
    return {k: trapz(v, p) / pressure_depth for k, v in layer.items()
            if k != 'pressure'}


new_mixed_layer = parcels.mixed_layer


def main():
    bench.wait_for_backend()
    bench.log(f'backend={jax.default_backend()}')
    tables = adiabat.load_moist_adiabat_lookups(dtype=jnp.float32)
    tables = jax.tree_util.tree_map(jax.device_put, tables)
    jax.block_until_ready(tables.curves)

    dat = {k: jnp.asarray(v) for k, v in bench.synthetic(B).items()}
    p, t, q = dat['pressure'], dat['temperature'], dat['specific_humidity']
    dew = jax.jit(thermo.dewpoint_from_specific_humidity)(p, t, q)
    cons = jax.jit(parcels.conserved_fields)(p, t, dew)
    jax.block_until_ready(dew)

    def mixes(p, t, dew, cons):
        return (parcels.mix_layer(p, t, dew, depth=100.0, conserved=cons),
                parcels.mix_layer(p, t, dew, depth=50.0, conserved=cons))

    def pipe(d):
        return pipeline.conv_properties_fused(d, tables=tables)

    # Trace each arm's programs while the right implementation is patched
    # in (jit traces on first call).
    arms = {}
    checks = {}
    for tag, impl in (('old', old_mixed_layer), ('new', new_mixed_layer)):
        parcels.mixed_layer = impl
        for stage, (fn, args) in (('mix', (mixes, (p, t, dew, cons))),
                                  ('pipe', (pipe, (dat,)))):
            name = f'{stage}_{tag}'
            jf = jax.jit(fn)
            t0 = time.perf_counter()
            for attempt in range(4):
                try:
                    out = jf(*args)
                    bench._materialize(out)
                    break
                except Exception as e:
                    if attempt == 3:
                        raise
                    bench.log(f'  {name} compile attempt {attempt + 1} '
                              f'failed ({str(e)[:80]!r}); retrying')
                    time.sleep(5)
            bench.log(f'{name}: compiled+first in '
                      f'{time.perf_counter() - t0:.1f}s')
            arms[name] = (jf, args)
            if stage == 'pipe':
                checks[tag] = {
                    k: float(jnp.nansum(v)) for k, v in sorted(out.items())
                    if k in ('mixed_100_cape', 'mixed_50_cape',
                             'mixed_100_cin', 'mu_cape')}
    parcels.mixed_layer = new_mixed_layer

    best = {name: float('inf') for name in arms}
    for r in range(ROUNDS):
        for name, (fn, args) in arms.items():
            t0 = time.perf_counter()
            outs = [fn(*args) for _ in range(ITERS)]
            for out in outs:
                bench._materialize(out)
            sec = (time.perf_counter() - t0) / ITERS
            best[name] = min(best[name], sec)
            bench.log(f'round {r} {name}: {sec * 1e3:.1f} ms')

    for k in checks['old']:
        rel = abs(checks['old'][k] - checks['new'][k]) / (
            abs(checks['old'][k]) + 1e-9)
        assert rel < 1e-5, ('arms disagree: ' + repr(checks))
    ms = {k: round(v * 1e3, 2) for k, v in best.items()}
    ms['mix_speedup'] = round(best['mix_old'] / best['mix_new'], 4)
    ms['pipe_speedup'] = round(best['pipe_old'] / best['pipe_new'], 4)
    ms['pipe_new_cols_per_sec'] = round(B / best['pipe_new'], 1)
    ms['checksums_equal'] = True
    ms['batch'] = B
    print(json.dumps(ms))


if __name__ == '__main__':
    main()
