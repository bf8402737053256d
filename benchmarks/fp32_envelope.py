"""fp32-production-vs-fp64-validation flip-envelope experiment.

Quantifies the fp32-on-TPU accuracy envelope of the fused CAPE/CIN solve
against the fp64 CPU XLA path, and runs the control that separates input
sensitivity from fp32 rounding: the fp64 path re-solved with
fp32-ulp-sized input noise.  Results: docs/performance.md ("fp32-on-TPU
vs fp64 validation envelope") and benchmarks/results/fp32_envelope_r3.txt.

Three arms (run each in its OWN process — the TPU plugin and the
fp64-CPU config cannot coexist):

    python benchmarks/fp32_envelope.py tpu       # fused fp32 on the chip
    python benchmarks/fp32_envelope.py cpu       # fp64 oracle + ulp arm
    python benchmarks/fp32_envelope.py compare   # prints the table

Arrays are exchanged via ``--outdir`` (default /tmp/fp32_env).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

T0 = time.time()
B = 1 << 17
SEED = 5
NAMES = ('cape', 'cin', 'lfc', 'el')


def log(m):
    print(f'[+{time.time()-T0:6.1f}s] {m}', file=sys.stderr, flush=True)


def _inputs():
    from __graft_entry__ import _synthetic_columns
    return _synthetic_columns((B,), dtype=np.float64, seed=SEED)


def arm_tpu(outdir):
    from bench import wait_for_backend
    wait_for_backend()
    import jax.numpy as jnp

    from xarray_parcel_tpu import adiabat, fused

    tables = adiabat.load_moist_adiabat_lookups(dtype=jnp.float32)
    log('tables loaded')
    p, t, td = _inputs()
    res, sol = fused.fused_surface_cape_cin(
        jnp.asarray(p.astype(np.float32)), jnp.asarray(t.astype(np.float32)),
        jnp.asarray(td.astype(np.float32)), tables=tables)
    out = {'cape': res['cape'], 'cin': res['cin'],
           'lfc': sol['lfc_pressure'], 'el': sol['el_pressure']}
    np.savez(os.path.join(outdir, 'tpu_fp32.npz'),
             **{k: np.asarray(v) for k, v in out.items()})
    log(f'saved ({np.isfinite(np.asarray(out["cape"])).sum()}/{B} finite)')


def arm_cpu(outdir):
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)
    import jax.numpy as jnp

    from xarray_parcel_tpu import adiabat, cape

    tables = adiabat.load_moist_adiabat_lookups(dtype=jnp.float64)
    log('tables loaded (f64)')
    p, t, td = _inputs()

    @jax.jit
    def solve(p, t, td):
        res, prof = cape.surface_based_cape_cin(p, t, td, tables=tables)
        return (res['cape'], res['cin'], prof['lfc_pressure'],
                prof['el_pressure'])

    outs = solve(jnp.asarray(p), jnp.asarray(t), jnp.asarray(td))
    np.savez(os.path.join(outdir, 'cpu_fp64.npz'),
             **{k: np.asarray(v) for k, v in zip(NAMES, outs)})
    log('fp64 oracle saved')

    # fp32-rounding-sized input perturbation, still solved in fp64: if the
    # fp32 flips were knife-edge input sensitivity, this arm would flip too.
    rng = np.random.default_rng(99)
    s = 6e-8                            # ~ fp32 ulp/2, relative
    outs = solve(jnp.asarray(p * (1 + rng.uniform(-s, s, p.shape))),
                 jnp.asarray(t * (1 + rng.uniform(-s, s, t.shape))),
                 jnp.asarray(td * (1 + rng.uniform(-s, s, td.shape))))
    np.savez(os.path.join(outdir, 'cpu_fp64_ulp.npz'),
             **{k: np.asarray(v) for k, v in zip(NAMES, outs)})
    log('fp64 ulp-perturbed arm saved')


def compare(outdir):
    a32 = np.load(os.path.join(outdir, 'tpu_fp32.npz'))
    a64 = np.load(os.path.join(outdir, 'cpu_fp64.npz'))
    ulp = np.load(os.path.join(outdir, 'cpu_fp64_ulp.npz'))

    def row(tag, x, y, n):
        lfc_flip = (np.isnan(x['lfc'][:n]) != np.isnan(y['lfc'][:n])).mean()
        el_flip = (np.isnan(x['el'][:n]) != np.isnan(y['el'][:n])).mean()
        both = np.isfinite(x['cape'][:n]) & np.isfinite(y['cape'][:n])
        d = np.abs(x['cape'][:n][both] - y['cape'][:n][both])
        print(f'{tag:>22} n=2^{int(np.log2(n)):>2}: '
              f'LFC-flip {lfc_flip:.2e}  EL-flip {el_flip:.2e}  '
              f'cape p95 {np.percentile(d, 95):.3f}  max {d.max():.1f}  '
              f'>5 J/kg {(d > 5.0).mean():.2e}')

    for n in (1 << 12, 1 << 14, 1 << 16, 1 << 17):
        row('tpu-fp32 vs cpu-fp64', a32, a64, n)
    print()
    for n in (1 << 12, 1 << 14, 1 << 16, 1 << 17):
        row('fp64-ulp vs fp64', ulp, a64, n)

    flip = np.isnan(a32['lfc']) != np.isnan(a64['lfc'])
    print(f'\nexistence flips: {int(flip.sum())}; max fp64 |cape| at a '
          f'flip column: {np.abs(a64["cape"][flip]).max():.2e} J/kg')
    d = np.abs(a32['cape'] - a64['cape'])
    i = int(np.nanargmax(np.where(np.isfinite(d), d, 0)))
    print(f'worst cape column: fp32 {a32["cape"][i]:.2f} vs fp64 '
          f'{a64["cape"][i]:.2f} J/kg (LFC {a32["lfc"][i]:.0f} vs '
          f'{a64["lfc"][i]:.0f} hPa — multi-LFC selection)')


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('arm', choices=['tpu', 'cpu', 'compare'])
    ap.add_argument('--outdir', default='/tmp/fp32_env')
    a = ap.parse_args()
    os.makedirs(a.outdir, exist_ok=True)
    {'tpu': arm_tpu, 'cpu': arm_cpu, 'compare': compare}[a.arm](a.outdir)
