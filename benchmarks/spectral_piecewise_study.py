"""Offline accuracy study, part 2: piecewise Chebyshev in ln(p).

Part 1 (spectral_basis_study.py) showed the global convergence rate is
basis-independent (~0.80/term) and limited by an interior feature of the
WARM curves around 60-115 hPa, so only domain splitting can reduce the
term count.  In the kernel a piecewise evaluation costs
(3 + n_seg - 1) ops per Clenshaw term (coefficient select per extra
segment) with the loop running max(K_seg) terms (shorter segments
zero-padded), plus ~4 + 2*(n_seg-1) setup ops for the per-segment affine
u — so the op count is (2 + n_seg) * K_max + setup, vs 3*48 + 4 today.

This script measures max fp32 error over all table pressures x a
warm-heavy curve sample for candidate splits, and prints the kernel op
cost of each.  Run on CPU:  python benchmarks/spectral_piecewise_study.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import numpy as np

from benchmarks.spectral_basis_study import (clenshaw, dct_fit, exact_curves,
                                             gauss_u, node_values,
                                             sample_starts)
from xarray_parcel_tpu import adiabat

LNP_LO = float(np.log(adiabat.P_BOT))
LNP_HI = float(np.log(adiabat.P_TOP))


def fit_eval_segment(t0, lo, hi, K, lnp_out, dtype):
    """Fit one segment [lo, hi] (lnp) with K terms; return fp ``dtype``
    Clenshaw values at all lnp_out (garbage outside the segment)."""
    u_nodes = gauss_u(K)
    lnp_nodes = 0.5 * (hi + lo) + 0.5 * (hi - lo) * u_nodes
    vals = node_values(t0, lnp_nodes)
    coeffs = dct_fit(vals)
    u_eval = (2.0 * lnp_out - (hi + lo)) / (hi - lo)
    return clenshaw(coeffs, np.clip(u_eval, -1.0, 1.0)[None, :], dtype)


def piecewise_error(t0, truth, splits, Ks, lnp_out, dtype=np.float32):
    """splits: interior boundaries (lnp, ascending); Ks: per-segment terms,
    segment 0 = lowest lnp (lowest pressure)."""
    bounds = [LNP_LO] + list(splits) + [LNP_HI]
    fit = np.full_like(truth, np.nan)
    for s in range(len(Ks)):
        lo, hi = bounds[s], bounds[s + 1]
        seg_fit = fit_eval_segment(t0, lo, hi, Ks[s], lnp_out, dtype)
        mask = (lnp_out >= lo - 1e-12) & (lnp_out <= hi + 1e-12)
        fit[:, mask] = seg_fit[:, mask]
    err = np.abs(fit.astype(np.float64) - truth)
    return err


def main():
    t0 = sample_starts()
    p_out = np.asarray(adiabat.pressure_grid())
    lnp_out = np.log(p_out)
    truth = exact_curves(t0)

    # Where is each curve hard?  Per-curve argmax pressure of the K=16
    # global-fit error.
    glob16 = fit_eval_segment(t0, LNP_LO, LNP_HI, 16, lnp_out, np.float64)
    err16 = np.abs(glob16 - truth)
    per_curve = [(float(np.asarray(t0)[i]),
                  float(p_out[err16[i].argmax()]),
                  float(err16[i].max())) for i in range(truth.shape[0])]
    hard = [r for r in per_curve if r[2] > 1e-3]
    print(json.dumps({'hard_curves_K16': hard[:40]}), flush=True)

    cands = [
        # (splits in hPa, per-segment K low-p first)
        ([130.0], (16, 16)),
        ([130.0], (20, 14)),
        ([130.0], (20, 16)),
        ([130.0], (24, 16)),
        ([160.0], (20, 16)),
        ([200.0], (24, 14)),
        ([45.0, 170.0], (10, 14, 12)),
        ([45.0, 170.0], (12, 16, 14)),
        ([40.0, 200.0], (12, 18, 14)),
        ([130.0], (28, 18)),
        ([100.0], (24, 18)),
        # The ADOPTED production configuration (adiabat.SEG_SPLITS /
        # SEG_K): uniform K avoids zero-padding and the memoized sweep
        # found it cheapest at better-than-global accuracy.
        ([50.0, 230.0], (14, 14, 14)),
        ([50.0, 230.0], (13, 13, 13)),
    ]
    for splits_hpa, Ks in cands:
        splits = sorted(np.log(s) for s in splits_hpa)
        err = piecewise_error(t0, truth, splits, Ks, lnp_out)
        n_seg = len(Ks)
        cost = (2 + n_seg) * max(Ks) + 4 + 2 * (n_seg - 1)
        print(json.dumps({
            'splits_hpa': splits_hpa, 'Ks': list(Ks),
            'kernel_ops': cost, 'ops_today': 3 * 48 + 4,
            'max_err_K': float(err.max()),
            'p995_err_K': float(np.quantile(err, 0.995)),
            'argmax_p': float(p_out[err.max(axis=0).argmax()]),
        }), flush=True)


if __name__ == '__main__':
    main()
