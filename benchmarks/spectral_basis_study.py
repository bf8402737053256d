"""Offline accuracy study: which basis lets the spectral adiabat fit use
fewer Clenshaw terms?

The fused kernel's Clenshaw evaluation is 145 of 573 vector-arith ops
(25%, results/op_mix_r4.json) at K=48 Chebyshev-in-ln(p) coefficients per
curve; plain truncation to K=40 was rejected at 3.3e-4 K.  The candidate
bases here change the *coordinate*, not the evaluation cost per term:

  * lnp   — the production basis (control; reproduces the 48/40 numbers).
  * exner — Chebyshev in pi = p^kappa.  The dry asymptote T = theta*pi is
    exactly linear in pi, and d(pi)/d(ln p) = kappa*pi concentrates
    resolution at high pressure where the condensation curvature lives.
    The kernel already exponentiates kappa*ln(p) for the dry track, so
    u costs the same ops either way.
  * theta — fit theta(lnp) = T*exp(-kappa*lnp) (Chebyshev in lnp),
    reconstruct T = fit * exp(kappa*lnp); removes the broad exponential
    trend but keeps lnp resolution placement.

Exact truth: fp64 RK4 on the statically refined grid (the same integrator
that builds the production tables), on a spread of curves including the
warmest (hardest) ones.  Errors are max over all 2,196 table pressures.

Run on CPU:  python benchmarks/spectral_basis_study.py
Prints one JSON line per (basis, K).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import jax.numpy as jnp
import numpy as np

from xarray_parcel_tpu import adiabat
from xarray_parcel_tpu import constants as c

KAPPA = float(c.kappa)
LNP_LO = float(np.log(adiabat.P_BOT))
LNP_HI = float(np.log(adiabat.P_TOP))
PI_LO = float(adiabat.P_BOT ** KAPPA)
PI_HI = float(adiabat.P_TOP ** KAPPA)


def sample_starts(n=64):
    """Curve start temperatures: dense near the warm (hard) end."""
    base = np.linspace(adiabat.T_MIN, adiabat.T_MAX_EXCL - 0.01, n // 2)
    warm = np.linspace(300.0, adiabat.T_MAX_EXCL - 0.01, n - n // 2)
    return jnp.asarray(np.unique(np.concatenate([base, warm])), jnp.float64)


def exact_curves(t0):
    """fp64 truth at every table pressure via the refined-grid RK4 scan."""
    grid, out_idx = adiabat._refined_grid()
    grid = jnp.asarray(grid, jnp.float64)

    def step(t, seg):
        t_new = adiabat.rk4_step(seg[0], seg[1] - seg[0], t)
        return t_new, t_new

    segs = jnp.stack([grid[:-1], grid[1:]], axis=1)
    _, ts = jax.lax.scan(step, t0, segs)
    all_t = jnp.concatenate([t0[None], ts], axis=0)
    return np.asarray(all_t[jnp.asarray(out_idx)]).T   # (n_curves, N_PRES)


def node_values(t0, lnp_nodes):
    """Integrate every sampled curve through arbitrary lnp nodes
    (descending pressure order), starting from ln(P_TOP)."""
    order = np.argsort(-lnp_nodes)                      # descending lnp
    lnp_sorted = lnp_nodes[order]
    segs = jnp.asarray(
        np.stack([np.concatenate([[LNP_HI], lnp_sorted[:-1]]), lnp_sorted],
                 axis=1), jnp.float64)

    def step(t, seg):
        t_new = adiabat.integrate_between(t, seg[0], seg[1], n_substeps=64)
        return t_new, t_new

    _, t_nodes = jax.lax.scan(step, t0, segs)           # (K, n_curves)
    vals = np.asarray(t_nodes).T                        # (n_curves, K)
    out = np.empty_like(vals)
    out[:, order] = vals
    return out


def gauss_u(K):
    i = np.arange(K)
    return np.cos(np.pi * (i + 0.5) / K)                # 1 -> -1


def dct_fit(vals_at_nodes):
    K = vals_at_nodes.shape[-1]
    M = adiabat._cheb_transform_matrix(K)
    return vals_at_nodes @ M.T


def clenshaw(coeffs, u, dtype=np.float64):
    coeffs = coeffs.astype(dtype)
    u = u.astype(dtype)
    b1 = np.zeros_like(u)
    b2 = np.zeros_like(u)
    two_u = dtype(2.0) * u
    K = coeffs.shape[-1]
    for k in range(K - 1, 0, -1):
        b1, b2 = coeffs[..., k:k + 1] + two_u * b1 - b2, b1
    return coeffs[..., 0:1] + u * b1 - b2


def main():
    t0 = sample_starts()
    p_out = np.asarray(adiabat.pressure_grid(jnp.float64))
    lnp_out = np.log(p_out)
    pi_out = p_out ** KAPPA
    truth = exact_curves(t0)
    print(f'{truth.shape[0]} curves integrated (truth)', file=sys.stderr)

    rows = []
    for basis in ('lnp', 'exner', 'theta'):
        for K in (12, 16, 20, 24, 32, 40, 48):
            u_nodes = gauss_u(K)
            if basis == 'exner':
                pi_nodes = (0.5 * (PI_HI + PI_LO)
                            + 0.5 * (PI_HI - PI_LO) * u_nodes)
                lnp_nodes = np.log(pi_nodes) / KAPPA
                u_eval = ((2.0 * pi_out - (PI_HI + PI_LO))
                          / (PI_HI - PI_LO))
            else:
                lnp_nodes = (0.5 * (LNP_HI + LNP_LO)
                             + 0.5 * (LNP_HI - LNP_LO) * u_nodes)
                u_eval = ((2.0 * lnp_out - (LNP_HI + LNP_LO))
                          / (LNP_HI - LNP_LO))
            vals = node_values(t0, lnp_nodes)
            if basis == 'theta':
                vals = vals * np.exp(-KAPPA * lnp_nodes)[None, :]
            coeffs = dct_fit(vals)
            for dtype in (np.float64, np.float32):
                fit = clenshaw(coeffs, u_eval[None, :], dtype)
                if basis == 'theta':
                    fit = fit * np.exp(KAPPA * lnp_out.astype(dtype))[None, :]
                err = np.abs(fit.astype(np.float64) - truth)
                row = {'basis': basis, 'K': K,
                       'dtype': np.dtype(dtype).name,
                       'max_err_K': float(err.max()),
                       'p995_err_K': float(np.quantile(err, 0.995)),
                       'argmax_t0': float(np.asarray(t0)[
                           err.max(axis=1).argmax()]),
                       'argmax_p': float(p_out[err.max(axis=0).argmax()])}
                rows.append(row)
                print(json.dumps(row), flush=True)
    worst = {}
    for r in rows:
        if r['dtype'] == 'float32':
            worst.setdefault(r['basis'], []).append((r['K'], r['max_err_K']))
    print(json.dumps({'summary_f32': worst}))


if __name__ == '__main__':
    main()
