"""A/B: piecewise (3x14) vs global (K=48) Chebyshev spectra in the kernel.

Times the fused surface CAPE/CIN solve with the two spectral adiabat
representations IN ONE PROCESS with INTERLEAVED timing rounds (the
second-timed arm pays a systematic ~5 ms penalty — reduction_ab.py —
so rounds alternate old/new and each arm keeps its own best).

  old — the pre-round-4 global K=48 Chebyshev fit of T(ln p): 3 Clenshaw
        ops per term, 48 terms (~149 kernel vector ops including setup).
        Coefficients are refit here from the dense curve table (numpy
        interp to Gauss nodes + DCT — timing-identical to the historical
        build; values agree to the fit error).
  new — the library as imported: 3 segments split at 50/230 hPa, 14 terms
        each; (3 + N_SEG - 1) ops per term plus segment-select setup
        (~81 kernel vector ops).  benchmarks/spectral_piecewise_study.py
        has the accuracy study (6.7e-5 K vs the global fit's 1.19e-4 K).

Both arms run the identical kernel otherwise (fused._diff_core cache is
cleared when swapping).  Outputs are compared loosely (the representations
legitimately differ at the ~1e-4 K level).

Usage: python benchmarks/spectral_ab.py   (repo root, TPU)
"""

import json
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, '.')
import bench  # noqa: E402
from xarray_parcel_tpu import adiabat, fused  # noqa: E402

B = 1 << 19
ITERS = 5
ROUNDS = 3


def old_eval_spectral(coeffs, pressure, log_pressure=None, axis=-1):
    """The pre-piecewise global Clenshaw (git c068016~1 adiabat.py:234)."""
    lnp = log_pressure if log_pressure is not None else jnp.log(pressure)
    scale = 2.0 / (adiabat._LNP_HI - adiabat._LNP_LO)
    shift = (adiabat._LNP_HI + adiabat._LNP_LO) / \
        (adiabat._LNP_HI - adiabat._LNP_LO)
    u = jnp.clip(lnp * scale - shift, -1.0, 1.0)
    if axis == -1:
        coef = lambda k: coeffs[..., k:k + 1]  # noqa: E731
    else:
        coef = lambda k: coeffs[k]             # noqa: E731
    K = coeffs.shape[0 if axis == 0 else -1]
    b1 = jnp.zeros_like(u)
    b2 = jnp.zeros_like(u)
    two_u = 2.0 * u
    for k in range(K - 1, 0, -1):
        b1, b2 = coef(k) + two_u * b1 - b2, b1
    return coef(0) + u * b1 - b2


def fit_global_coeffs(curves, n_coef=48):
    """Global K-term Chebyshev fit of every curve from the dense table."""
    # Host-side copy of adiabat.pressure_grid (asking the device path for
    # f64 in a non-x64 process only triggers a truncation warning).
    lnp_grid = np.log(np.round(np.arange(1100.0, 2.0, -0.5), 1))
    i = np.arange(n_coef)
    u = np.cos(np.pi * (i + 0.5) / n_coef)
    lnp_nodes = 0.5 * (adiabat._LNP_HI + adiabat._LNP_LO) + \
        0.5 * (adiabat._LNP_HI - adiabat._LNP_LO) * u
    order = np.argsort(lnp_grid)
    vals = np.stack([
        np.interp(lnp_nodes, lnp_grid[order], row[order])
        for row in np.asarray(curves, np.float64)])
    k = i[:, None]
    M = (2.0 / n_coef) * np.cos(np.pi * k * (i + 0.5) / n_coef)
    M[0] *= 0.5
    return (vals @ M.T).astype(np.float32)


def main():
    bench.wait_for_backend()
    bench.log(f'backend={jax.default_backend()}')
    tables_new = adiabat.load_moist_adiabat_lookups(dtype=jnp.float32)
    tables_new = jax.tree_util.tree_map(jax.device_put, tables_new)
    jax.block_until_ready(tables_new.curves)

    bench.log('fitting global K=48 coefficients (numpy)...')
    old_coeffs = fit_global_coeffs(np.asarray(tables_new.curves))
    tables_old = adiabat.AdiabatTables(
        tables_new.curves, tables_new.lookup,
        jax.device_put(jnp.asarray(old_coeffs)))

    new_eval = fused._eval_spectral

    def set_arm(old):
        fused._eval_spectral = old_eval_spectral if old else new_eval
        fused._diff_core.cache_clear()

    p, t, td = (jnp.asarray(v) for v in
                __import__('__graft_entry__')._synthetic_columns((B,)))

    fns = {}
    sums = {}
    for arm in ('new', 'old'):          # compile both before any timing
        set_arm(old=arm == 'old')
        tables = tables_old if arm == 'old' else tables_new

        def sb(p, t, td, tables=tables):
            res, _ = fused.fused_surface_cape_cin(p, t, td, tables=tables)
            return res['cape'], res['cin']

        fn = jax.jit(sb)
        out = fn(p, t, td)
        bench._materialize(out)
        fns[arm] = fn
        sums[arm] = (float(jnp.nansum(out[0])), float(jnp.nansum(out[1])),
                     int(jnp.sum(jnp.isnan(out[0]))))
        bench.log(f'{arm} compiled; checksum={sums[arm]}')
        set_arm(old=False)

    # NOTE: both programs stay in XLA's compile cache; swapping arms
    # between rounds re-dispatches the cached executables only.
    import time
    best = {'old': float('inf'), 'new': float('inf')}
    for r in range(ROUNDS):
        for arm in (('old', 'new') if r % 2 == 0 else ('new', 'old')):
            fn = fns[arm]
            t0 = time.perf_counter()
            outs = [fn(p, t, td) for _ in range(ITERS)]
            for out in outs:
                bench._materialize(out)
            sec = (time.perf_counter() - t0) / ITERS
            best[arm] = min(best[arm], sec)
            bench.log(f'round {r} {arm}: {sec * 1e3:.1f} ms/iter')

    rel_cape = abs(sums['old'][0] - sums['new'][0]) / abs(sums['old'][0])
    print(json.dumps({
        'old_ms': round(best['old'] * 1e3, 2),
        'new_ms': round(best['new'] * 1e3, 2),
        'speedup': round(best['old'] / best['new'], 4),
        'old_cols_per_sec': round(B / best['old'], 1),
        'new_cols_per_sec': round(B / best['new'], 1),
        'nan_counts_equal': sums['old'][2] == sums['new'][2],
        'cape_checksum_rel_diff': rel_cape,
        'batch': B,
    }))


if __name__ == '__main__':
    main()
