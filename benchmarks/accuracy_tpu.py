"""On-TPU fp32 accuracy artifact: the fused pipelines vs the committed
fp64 archive.

tests/test_fp32_budget.py pins the fp32 envelope CPU-side, where the
Pallas kernels run in interpret mode.  This script runs the REAL Mosaic
lowering: `conv_properties_fused` (+ storm proxies) and
`min_conv_properties_fused` in fp32 on the TPU over the regression
archive's input grid, and bounds every variable against the committed
fp64 outputs (tests/data/regression_conv_properties.npz) with the same
metrics the budget test uses — p95 / max rel err on the variable's own
scale, NaN-pattern flips, proxy flips.

Writes benchmarks/results/accuracy_tpu_<tag>.json.

Usage: python benchmarks/accuracy_tpu.py [tag]   (repo root, TPU backend)
"""

import json
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, '.')
sys.path.insert(0, 'tests')
sys.path.insert(0, 'benchmarks')
import ab_harness  # noqa: E402
import bench  # noqa: E402
from xarray_parcel_tpu import pipeline  # noqa: E402

ARCHIVE = os.path.join('tests', 'data', 'regression_conv_properties.npz')
PAD = 256          # pad the 36-column grid to one kernel block


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else 'r5'
    tables, _ = ab_harness.setup()
    tables32 = tables.astype(jnp.float32)

    with np.load(ARCHIVE) as f:
        inputs = {k[3:]: f[k] for k in f.files if k.startswith('in_')}
        expect = {k[4:]: f[k] for k in f.files if k.startswith('out_')}
    shape = inputs['pressure'].shape[:-1]
    B = int(np.prod(shape))
    assert B <= PAD, (
        f'archive grid has {B} columns > the {PAD}-column kernel block; '
        'raise PAD (next multiple of 256) to run it')

    def flat_pad(v):
        v = np.asarray(v, np.float32).reshape((B,) + v.shape[len(shape):])
        pad = np.full((PAD - B,) + v.shape[1:], np.nan, np.float32)
        return jnp.asarray(np.concatenate([v, pad], axis=0))

    dat = {k: flat_pad(v) for k, v in inputs.items()}

    def run(d):
        out = pipeline.conv_properties_fused(d, tables=tables32)
        out.update(pipeline.storm_proxies(out))
        out.update({f'min.{k}': v for k, v in
                    pipeline.min_conv_properties_fused(
                        d, tables=tables32).items()})
        return out

    def run_xla(d):
        # The modular (no-Pallas) path in the same fp32 on the same chip:
        # isolates Mosaic-lowering error from the TPU's fp32 arithmetic
        # (transcendental approximations, fused op reassociation).
        out = pipeline.conv_properties(d, tables=tables32)
        out.update(pipeline.storm_proxies(out))
        return out

    bench.log(f'running fused pipelines on {jax.default_backend()} '
              f'({B} archive columns padded to {PAD})')
    out = jax.jit(run)(dat)
    bench._materialize(out)
    out = {k: np.asarray(v)[:B].reshape(shape + np.shape(v)[1:])
           for k, v in out.items()}
    bench.log('running modular XLA pipeline (attribution arm)')
    out_x = jax.jit(run_xla)(dat)
    bench._materialize(out_x)
    out_x = {k: np.asarray(v)[:B].reshape(shape + np.shape(v)[1:])
             for k, v in out_x.items()}

    def envelope(got, label):
        rows = {}
        worst = {'p95': 0.0, 'max': 0.0, 'nan_flips': 0.0,
                 'proxy_flips': 0.0}
        for k in sorted(set(got) & set(expect)):
            a = expect[k]                       # committed fp64
            b = got[k]
            if a.dtype == bool:
                flips = float(np.mean(a != b.astype(bool)))
                rows[k] = {'proxy_flips': flips}
                worst['proxy_flips'] = max(worst['proxy_flips'], flips)
                continue
            b = b.astype(np.float64)
            nanflips = float(np.mean(np.isnan(a) != np.isnan(b)))
            both = ~np.isnan(a) & ~np.isnan(b)
            scale = max(1.0, float(np.nanmax(np.abs(a))))
            d = (np.abs(a[both] - b[both]) / scale) if both.any() else \
                np.zeros(1)
            rows[k] = {'p95_rel': float(np.quantile(d, 0.95)),
                       'max_rel': float(d.max()), 'nan_flips': nanflips,
                       'scale': scale}
            worst['p95'] = max(worst['p95'], rows[k]['p95_rel'])
            worst['max'] = max(worst['max'], rows[k]['max_rel'])
            worst['nan_flips'] = max(worst['nan_flips'], nanflips)
            bench.log(f'{label} {k:28} p95 {rows[k]["p95_rel"]:.2e} '
                      f'max {rows[k]["max_rel"]:.2e} nan {nanflips:.3f}')
        return rows, worst

    rows, worst = envelope(out, 'fused')
    rows_x, worst_x = envelope(out_x, 'xla')
    missing = sorted(set(expect) - set(out) - set(out_x))

    ok = (worst['p95'] <= 1e-4 and worst['nan_flips'] <= 0.01 and
          worst['proxy_flips'] <= 0.05)
    result = {'backend': jax.default_backend(),
              'grid': list(shape) + [int(inputs['pressure'].shape[-1])],
              'worst': worst, 'budget_met': bool(ok),
              'variables': rows,
              'xla_worst': worst_x, 'xla_variables': rows_x,
              'missing_vs_archive': missing}
    os.makedirs(os.path.join('benchmarks', 'results'), exist_ok=True)
    path = os.path.join('benchmarks', 'results',
                        f'accuracy_tpu_{tag}.json')
    with open(path, 'w') as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(json.dumps({'worst': worst, 'budget_met': ok, 'path': path}))


if __name__ == '__main__':
    main()
