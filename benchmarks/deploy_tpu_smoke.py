"""TPU smoke for deploy.py: Mosaic export roundtrip + persistent-cache A/B.

Answers two deployment questions on the real chip:

1. Does ``deploy.export_pipeline`` of the FUSED pipeline (Mosaic kernel
   inside) serialize/deserialize and reproduce the direct call on TPU?
2. Does JAX's persistent compilation cache work through the axon tunnel —
   i.e. does a second process skip the remote compile?  (Measured as
   subprocess wall time for one identical jit program, cold vs warm
   cache.)

Writes benchmarks/results/deploy_tpu_smoke.json.
"""

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       'results', 'deploy_tpu_smoke.json')

CHILD = r'''
import sys, time, json
t0 = time.time()
import jax, jax.numpy as jnp
cache_dir = sys.argv[1]
if cache_dir != 'none':
    from xarray_parcel_tpu import deploy
    deploy.enable_compilation_cache(cache_dir)
x = jnp.arange(4096, dtype=jnp.float32)
t1 = time.time()
# A program unlikely to collide with anything previously cached.
y = jax.jit(lambda v: (jnp.sin(v * 1.000173) ** 2 + jnp.cos(v) * 0.25,
                       jnp.cumsum(v) * 1e-7))(x)
print(float(y[0][1]))  # force one-element readback (tunnel sync rule)
t2 = time.time()
import os
entries = len(os.listdir(cache_dir)) if cache_dir != 'none' else 0
print(json.dumps({'startup_s': t1 - t0, 'compile_and_run_s': t2 - t1,
                  'cache_entries_after': entries}))
'''


def run_child(cache_dir):
    out = subprocess.run(
        [sys.executable, '-c', CHILD, cache_dir],
        capture_output=True, text=True, timeout=900,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    if out.returncode != 0:
        return {'ok': False, 'stderr_tail': out.stderr[-800:]}
    lines = out.stdout.strip().splitlines()
    try:
        rec = json.loads(lines[-1])
    except (IndexError, ValueError):
        return {'ok': False, 'stderr_tail': out.stderr[-800:],
                'stdout_tail': out.stdout[-200:]}
    rec['ok'] = True
    return rec


def main():
    res = {}

    # --- 2: persistent-cache A/B across processes (run first: cheap) ---
    with tempfile.TemporaryDirectory() as d:
        print('cold (no cache):', file=sys.stderr)
        res['no_cache'] = run_child('none')
        print(res['no_cache'], file=sys.stderr)
        print('cold (cache miss, writes):', file=sys.stderr)
        res['cache_cold'] = run_child(d)
        print(res['cache_cold'], file=sys.stderr)
        print('warm (cache hit?):', file=sys.stderr)
        res['cache_warm'] = run_child(d)
        print(res['cache_warm'], file=sys.stderr)
        res['cache_entries'] = res['cache_warm'].get('cache_entries_after', 0)
        # Remote-compile wall time varies 13-150 s run to run (tunnel; the
        # no-cache arm of one recorded run compiled in 2.96 s), so the
        # verdict keys on cache-dir writes plus a warm run faster than ANY
        # plausible remote compile: under 1 s, and under half the fastest
        # compile observed in this very run.
        res['cache_writes'] = res['cache_entries'] > 0
        fastest_compile = min(
            res[a]['compile_and_run_s'] for a in ('no_cache', 'cache_cold')
            if res[a].get('ok'))
        res['cache_hit_confirmed'] = (
            res['cache_writes'] and
            res['cache_warm'].get('ok', False) and
            res['cache_warm']['compile_and_run_s']
            < min(1.0, 0.5 * fastest_compile))

    # --- 1: fused-pipeline export roundtrip on the TPU ---
    import numpy as np
    import jax
    import jax.numpy as jnp
    from xarray_parcel_tpu import adiabat, deploy, pipeline
    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    from tests.test_deploy import make_dat

    tables = adiabat.load_moist_adiabat_lookups()
    B, L = 2048, 40
    dat = {k: jnp.asarray(v, jnp.float32)
           for k, v in make_dat(B, L=L, seed=9).items()}

    t0 = time.time()
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, 'fused.xpz')
        deploy.export_pipeline('min_conv_properties_fused', batch=B,
                               levels=L, dtype=jnp.float32, tables=tables,
                               path=path)
        res['export_s'] = time.time() - t0
        res['artifact_bytes'] = os.path.getsize(path)
        loaded = deploy.load(path)
        # Round-8 slim default: the artifact embeds the spectral
        # coefficients and serves with NO tables argument on the chip.
        res['slim'] = bool(loaded.meta.get('slim'))
        assert res['slim'], 'fused pipeline should auto-slim'
        t0 = time.time()
        got = loaded(dat)
        got = {k: np.asarray(v) for k, v in got.items()}
        res['first_call_s'] = time.time() - t0

    ref = {k: np.asarray(v) for k, v in pipeline.min_conv_properties_fused(
        dat, tables=tables).items()}
    worst = 0.0
    for k in ref:
        a, b = got[k], ref[k]
        if a.dtype == bool:
            assert (a == b).all(), k
            continue
        assert (np.isnan(a) == np.isnan(b)).all(), k
        scale = np.nanmax(np.abs(b)) or 1.0
        w = np.nanmax(np.abs(a - b)) / scale if np.isfinite(b).any() else 0.0
        worst = max(worst, float(w))
    res['worst_rel_vs_direct'] = worst
    res['n_vars'] = len(ref)

    # Odd-batch serving through the SAME loaded artifact (host pad +
    # chunk): rows shared with the exact-fit call must be bitwise
    # identical.  Timed serve-only (no re-export).
    datodd = {k: np.concatenate([np.asarray(v),
                                 np.asarray(v)[:1000]], axis=0)
              for k, v in dat.items()}
    t0 = time.time()
    godd = loaded(datodd)
    for k in ref:
        a = np.asarray(godd[k])
        assert a.shape[0] == B + 1000, k
        same = a[:B] == got[k]
        if a.dtype != bool:
            same |= np.isnan(a[:B]) & np.isnan(got[k])
        assert same.all(), f'odd-batch shared rows differ: {k}'
    res['odd_batch_serve_s'] = time.time() - t0

    os.makedirs(os.path.dirname(RESULTS), exist_ok=True)
    with open(RESULTS, 'w') as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == '__main__':
    main()
